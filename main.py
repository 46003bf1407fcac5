#!/usr/bin/env python
"""Phase CLI shim: prep / data / train / eval / eval-time / gen.

The driver lives in :mod:`gesture_diffusion_tpu.cli` (installed with the
package as the ``gesture-diffusion`` console script); this file keeps the
reference's ``python main.py --phase ... --config ...`` invocation working
verbatim from a checkout (``/root/reference/main.py``)."""

from gesture_diffusion_tpu.cli import *  # noqa: F401,F403 (tests import helpers)
from gesture_diffusion_tpu.cli import main

if __name__ == "__main__":
    main()
