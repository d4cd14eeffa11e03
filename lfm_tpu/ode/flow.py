"""Linear flow-matching objective.

The reference trains with the interpolant
``z_t = (1 - t) * z_0 + (1e-5 + (1 - 1e-5) * t) * z_1`` and velocity target
``u = (1 - 1e-5) * z_1 - z_0`` where z_0 is the data latent and z_1 is noise
(reference train_flow_latent.py:144-153; "1 is real noise, 0 is real data").
Sampling integrates dz/dt = v(t, z) from t=1 down to t=0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

SIGMA_MIN = 1e-5


def interpolate(z0: jnp.ndarray, z1: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (z_t, u) for batched t of shape (B,)."""
    t = t.reshape((-1,) + (1,) * (z0.ndim - 1)).astype(z0.dtype)
    z_t = (1.0 - t) * z0 + (SIGMA_MIN + (1.0 - SIGMA_MIN) * t) * z1
    u = (1.0 - SIGMA_MIN) * z1 - z0
    return z_t, u


def fm_loss(
    velocity_fn,
    z0: jnp.ndarray,
    key: jax.Array,
    y: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Monte-Carlo flow-matching MSE: t ~ U(0,1), noise ~ N(0,1)."""
    kt, kn = jax.random.split(key)
    t = jax.random.uniform(kt, (z0.shape[0],), dtype=jnp.float32)
    z1 = jax.random.normal(kn, z0.shape, z0.dtype)
    z_t, u = interpolate(z0, z1, t)
    v = velocity_fn(t, z_t, y)
    return jnp.mean(jnp.square(v.astype(jnp.float32) - u.astype(jnp.float32)))
