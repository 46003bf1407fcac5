#!/usr/bin/env python
"""Headline benchmark: denoiser steps/sec/chip on the BEAT flagship config.

Workload (mirrors the reference's latency harness methodology,
``/root/reference/models/generator.py:47-78`` — warmups then timed reps of
the full sampling loop, batch 1): s2g_v2 + HA2G encoder + 4-layer oneway
cross-attention decoder, d_pose 123, window 40 frames / 2 s of 16 kHz audio,
1000-step DDIM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch reference measured on this
machine's CPU (no CUDA available; the reference falls back to CPU in the
same way, ``main.py:129``), cached in BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BASELINE_MEASURED.json")

D_POSE, WINDOW, WAV_LEN = 123, 40, 32000
DIFFUSION_STEPS = 1000
BATCH = 1


def measure_ours(repetitions: int = 10, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
    from gesture_diffusion_tpu.diffusion import make_diffusion
    from gesture_diffusion_tpu.generation import Generator

    cfg = DenoiserConfig(d_pose=D_POSE)
    model = GestureDenoiser(cfg)
    wav = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.3, (BATCH, WAV_LEN)).astype(np.float32))
    variables = model.init(
        jax.random.key(0), jnp.zeros((BATCH, WINDOW, D_POSE)),
        jnp.zeros((BATCH,), jnp.int32), wav, train=False)
    sched, tmap = make_diffusion("linear", DIFFUSION_STEPS, is_training=False)
    gen = Generator(model, variables, sched, tmap)
    mean_ms, std_ms, steps_per_sec = gen.eval_infer_time(
        wav, D_POSE, WINDOW, sample_alg="ddim",
        repetitions=repetitions, warmup=warmup)

    # batched offline-inference throughput (64 clips, clip-packed kernel)
    wav64 = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.3, (64, WAV_LEN)).astype(np.float32))
    mean64, _, _ = gen.eval_infer_time(
        wav64, D_POSE, WINDOW, sample_alg="ddim", repetitions=2, warmup=1)
    batch64_gesture_s = 64 * 2.0 / (mean64 / 1e3)

    # streaming mode: 50-step respaced DDIM per 2 s window, batch 1
    sched50, tmap50 = make_diffusion("linear", DIFFUSION_STEPS, "ddim50",
                                     is_training=False)
    gen50 = Generator(model, variables, sched50, tmap50)
    stream_ms, _, _ = gen50.eval_infer_time(
        wav, D_POSE, WINDOW, sample_alg="ddim", repetitions=5, warmup=2)
    return mean_ms, std_ms, steps_per_sec, batch64_gesture_s, stream_ms


def main():
    baseline_sps = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline_sps = json.load(f).get("reference_steps_per_sec")

    mean_ms, std_ms, steps_per_sec, batch64_gesture_s, stream_ms = measure_ours()
    result = {
        "metric": "ddim_denoiser_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": (round(steps_per_sec / baseline_sps, 2)
                        if baseline_sps else None),
        "detail": {
            "mean_ms_per_1000step_loop": round(mean_ms, 2),
            "std_ms": round(std_ms, 2),
            "batch": BATCH,
            "sec_of_gesture_per_sec": round(2.0 / (mean_ms / 1e3), 3),
            "batch64_sec_of_gesture_per_sec": round(batch64_gesture_s, 1),
            "streaming_ddim50_ms_per_2s_window": round(stream_ms, 2),
            "baseline_reference_steps_per_sec_torch_cpu": baseline_sps,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
