"""Classifier-free guidance wrappers.

The reference implements CFG by doubling the batch — x -> cat([x, x]),
y -> cat([y, y_null]) — and mixing cond/uncond outputs inside
``forward_with_cfg`` (reference models/DiT.py:274-290,
test_flow_latent.py:172-181). Both halves of the doubled state receive the
same mixed velocity, so the doubled ODE integrates N independent samples
twice. TPU-natively we keep the state at N samples and batch the cond/uncond
model evaluation into one 2N forward — identical math, half the ODE state,
and one large MXU-friendly batch per NFE.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def cfg_velocity(
    model_fn: Callable,
    y: jnp.ndarray,
    y_null: jnp.ndarray,
    cfg_scale: float,
    guide_channels: Optional[int] = None,
) -> Callable:
    """Build v(t, x) that evaluates cond+uncond in one doubled forward.

    ``model_fn(t, x, y)`` is the raw velocity network. ``guide_channels``
    limits guidance to the first K channels (the reference guides all
    ``in_channels`` since learn_sigma=False; models/DiT.py:285).
    """

    def v(t, x):
        n = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        y2 = jnp.concatenate([y, y_null], axis=0)
        t2 = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (2 * n,))
        out = model_fn(t2, x2, y2)
        cond, uncond = out[:n], out[n:]
        if guide_channels is None:
            return uncond + cfg_scale * (cond - uncond)
        # NHWC: channels are the LAST axis in this repo (nn/dit.py:252-257
        # slices the same way); guiding axis 1 would slice H, not C.
        eps_c, rest = cond[..., :guide_channels], cond[..., guide_channels:]
        eps_u = uncond[..., :guide_channels]
        eps = eps_u + cfg_scale * (eps_c - eps_u)
        return jnp.concatenate([eps, rest], axis=-1)

    return v


def plain_velocity(model_fn: Callable, y: Optional[jnp.ndarray] = None) -> Callable:
    """v(t, x) with scalar-t broadcasting to the batch (the reference models
    broadcast a 0-d t internally; models/DiT.py:64-66)."""

    def v(t, x):
        t_b = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        return model_fn(t_b, x, y)

    return v
