from .denoiser import GestureDenoiser, DenoiserConfig
from .factory import build_model, build_all

__all__ = ["GestureDenoiser", "DenoiserConfig", "build_model", "build_all"]
