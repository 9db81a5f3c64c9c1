"""Static-shape resize helpers used by the decoder (NHWC).

The reference decoder needs exactly two resize flavors (SURVEY.md §2.3):
- nearest-neighbor x2 upsampling feeding each ``upconv`` stage;
- nearest-neighbor 1/2 and 1/4 downsampling of the scaled LPG depth maps
  before they are concatenated into the next-finer stage.

Nearest down by integer factor f == strided slice from index 0 (matches
TF/torch ``interpolate(mode='nearest')`` for exact integer factors); nearest
up by f == repeat.  Both are trivially fused by XLA — no gather needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest x2 upsample via repeat (XLA lowers to broadcast+reshape)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def downsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC nearest 1/factor downsample (integer factor, static shape)."""
    return x[:, ::factor, ::factor, :]
