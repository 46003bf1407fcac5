"""gesture_diffusion_tpu — TPU-native speech-driven gesture generation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
wubowen416/Speech-driven-Gesture-Generation-using-Transformer-based-
Denoising-Diffusion-Probabilistic-Models (reference layout documented in
SURVEY.md).  Compute path is jit/scan/shard_map; layouts are batch-first
(N, T, C); conditioning memory is computed once per clip and reused across
all denoising steps.
"""

__version__ = "0.1.0"
