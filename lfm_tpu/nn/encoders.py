"""Condition encoders (reference models/encoder.py).

``SpatialRescaler`` (encoder.py:90-112) is the semantic-synthesis condition
encoder: n bilinear half-resolution stages + optional 1x1 channel mapping —
one-hot segmentation (H, W, K) -> (H/2^n, W/2^n, 4) latent-resolution map,
trained jointly with the velocity net
(reference downstream_tasks/train_flow_latent_semantic_syn.py:119,128-132).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SpatialRescaler(nn.Module):
    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, C)."""
        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            nh = int(h * self.multiplier)
            nw = int(w * self.multiplier)
            # torch F.interpolate(bilinear, align_corners=False) semantics:
            # torch does NOT antialias when downsampling, jax does by default
            x = jax.image.resize(
                x, (n, nh, nw, c),
                method="bilinear" if self.method in ("bilinear", "linear") else self.method,
                antialias=False,
            )
        if self.out_channels is not None:
            x = nn.Dense(self.out_channels, use_bias=self.use_bias,
                         dtype=self.dtype, name="channel_mapper")(x)
        return x
