"""Profiling helpers (SURVEY.md §5: the reference has only wall-clock
prints; the TPU-native equivalent is ``jax.profiler`` traces plus
block-until-ready timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    repetitions: int = 10,
    warmup: int = 3,
    trace_dir: Optional[str] = None,
):
    """Warmup + timed reps with ``block_until_ready`` (the reference's
    cuda-event methodology, ``generator.py:47-78``).

    :return: (mean_ms, std_ms, last_output)
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ctx = trace(trace_dir) if trace_dir else contextlib.nullcontext()
    timings = np.zeros(repetitions)
    with ctx:
        for rep in range(repetitions):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            timings[rep] = (time.perf_counter() - t0) * 1e3
    return float(timings.mean()), float(timings.std()), out


def enable_compilation_cache(path: str = "/root/.cache/jax_comp",
                             min_compile_secs: float = 1.0) -> None:
    """Persistent XLA compilation cache: repeat invocations of bench/eval/
    train skip the (minutes-long on this 1-core host) compile of unchanged
    programs.  Safe no-op if the backend rejects it."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
