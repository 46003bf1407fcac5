from .schedules import get_named_beta_schedule, linear_betas, cosine_betas
from .gaussian import (
    Schedule,
    make_schedule,
    q_sample,
    q_mean_variance,
    q_posterior_mean_variance,
    predict_xstart_from_eps,
    predict_eps_from_xstart,
    p_mean_variance,
    training_losses,
)
from .respace import space_timesteps, respaced_schedule, make_diffusion
from .sampling import ddpm_sample_loop, ddim_sample_loop, bpd_loop
from .resample import UniformSampler, LossSecondMomentResampler, create_named_schedule_sampler

__all__ = [
    "get_named_beta_schedule", "linear_betas", "cosine_betas",
    "Schedule", "make_schedule", "q_sample", "q_mean_variance",
    "q_posterior_mean_variance", "predict_xstart_from_eps",
    "predict_eps_from_xstart", "p_mean_variance", "training_losses",
    "space_timesteps", "respaced_schedule", "make_diffusion",
    "ddpm_sample_loop", "ddim_sample_loop", "bpd_loop",
    "UniformSampler", "LossSecondMomentResampler", "create_named_schedule_sampler",
]
