"""Native (C++) runtime helpers, loaded via ctypes.

The hot data-loader op — bulk-parsing whitespace-separated floats out of
BVH motion blocks — runs as a single strtod pass in C
(``fast_parse.cpp``), ~100x faster than the tokenizing Python loop it
replaces and ~4x faster than ``np.fromstring``.  The shared object is
compiled on first use with the system ``g++`` into a per-user cache dir
(no pip/pybind11 required) and every entry point falls back to numpy if
the toolchain or the build is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import warnings

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fast_parse.cpp")
_LIB = None
_LIB_FAILED = False


def _build_dir() -> str:
    base = os.environ.get("GDT_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "gesture_diffusion_tpu")
    os.makedirs(base, exist_ok=True)
    return base


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"fast_parse_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)            # atomic vs concurrent builders
        _LIB = ctypes.CDLL(so)
        _LIB.gdt_parse_floats.restype = ctypes.c_long
        _LIB.gdt_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
    except Exception as e:                 # no g++, sandboxed, bad cache...
        warnings.warn(f"native fast_parse unavailable ({e!r}); "
                      "falling back to numpy")
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def parse_floats(text: "str | bytes", expected: "int | None" = None
                 ) -> np.ndarray:
    """Parse whitespace-separated floats from ``text`` (str or ASCII
    bytes — pass bytes for large blocks to skip a 16 MB encode) into a
    float64 array.  ``expected`` bounds the output size (defaults to a
    whitespace-token count pass); parsing stops at the first non-numeric
    token, matching the BVH motion-block grammar."""
    if expected is None:
        expected = len(text.split())
    if expected == 0:
        return np.zeros(0)
    lib = _load()
    if lib is None:
        # pure-numpy fallback (no toolchain): truncate the token list to
        # ``expected`` BEFORE converting — the whole point of the
        # MOTION-split optimization — and stay off the long-deprecated
        # np.fromstring(sep=...) API
        toks = text.split()[:expected]
        try:
            return np.asarray(toks, dtype=np.float64)
        except ValueError:
            # stop at the first non-numeric token (BVH motion grammar)
            out = np.empty(len(toks), np.float64)
            n = 0
            for tok in toks:
                try:
                    out[n] = float(tok if isinstance(tok, str)
                                   else tok.decode())
                except ValueError:
                    break
                n += 1
            return out[:n]
    out = np.empty(expected, np.float64)
    data = text.encode() if isinstance(text, str) else text
    n = lib.gdt_parse_floats(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), expected)
    return out[:n]


__all__ = ["parse_floats"]
