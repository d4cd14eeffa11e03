"""Downstream-task sampling/eval harnesses.

Rebuilds the reference's downstream test scripts
(reference downstream_tasks/test_flow_latent_inpainting.py:20-170,
test_flow_latent_semantic_syn.py) as jitted pipelines:
  * inpainting eval: fixed 2,993-image CelebA-HQ set (image + mask pairs),
    cond = VAE(masked) ++ latent-res mask, conditional ODE solve, decode,
    composite ``fake*mask + (1-mask)*real`` (test:160-161), save per-index
    JPEGs for FID/PIDS/UIDS scoring;
  * semantic synthesis eval: one-hot seg -> SpatialRescaler -> conditional
    solve -> decode; ``to_rgb`` random-projection visualization of seg maps
    (train_flow_latent_semantic_syn.py:36-41).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lfm_tpu.core.config import Config
from lfm_tpu.train.conditional import sample_conditional


class InpaintingEvalDataset:
    """(reference test_flow_latent_inpainting.py:24-54): images
    ``{i:06d}.jpg`` + masks ``{i:06d}.png`` (255 = keep in the file; the
    loader inverts so 1 = hole). Yields (img, mask, masked) in [-1,1] /
    mask in {0,1} (H, W, 1)."""

    def __init__(self, indir: str, maskdir: str, n: Optional[int] = None):
        self.indir = indir
        self.maskdir = maskdir
        if n is None:
            # the reference pins 2,993 (test:32); cap at what exists on disk
            avail = len([f for f in os.listdir(indir) if f.endswith(".jpg")])
            n = min(2993, avail)
        self.n = n
        self.num_classes = 1

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        from PIL import Image

        img = np.asarray(Image.open(os.path.join(self.indir, f"{i:06d}.jpg")).convert("RGB"),
                         np.float32) / 255.0
        mask = np.asarray(Image.open(os.path.join(self.maskdir, f"{i:06d}.png")),
                          np.float32) / 255.0
        mask = 1.0 - mask  # 1 = hole
        if mask.ndim == 3:
            mask = mask[..., 0]
        masked = (1.0 - mask[..., None]) * img
        return (img * 2 - 1, mask[..., None].astype(np.float32), masked * 2 - 1)


def make_inpainting_sampler(config: Config, model, params, vae, vae_params):
    """Returns fn(image, mask, masked, key) -> composited images in [0,1]."""
    sc = config.sample
    scale = config.scale_factor

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    @jax.jit
    def run(params, vae_params, image, mask, masked, key):
        k1, k2 = jax.random.split(key)
        cz = vae.apply(vae_params, masked, k1, method=type(vae).encode_sample) * scale
        n, h, w, _ = cz.shape
        mask_small = jax.image.resize(mask, (n, h, w, 1), method="nearest")
        c = jnp.concatenate([cz, mask_small], axis=-1)
        noise = jax.random.normal(k2, cz.shape[:3] + (4,))
        z0, _ = sample_conditional(
            model_apply, params, c, noise, method=sc.method,
            atol=sc.atol if sc.method in ("dopri5", "dopri8", "adaptive_heun", "bosh3") else 1e-8,
            rtol=sc.rtol, num_steps=sc.num_steps,
        )
        fake = vae.apply(vae_params, z0 / scale, method=type(vae).decode)
        fake01 = jnp.clip((fake + 1) / 2, 0, 1)
        img01 = (image + 1) / 2
        # composite: generated content inside the hole, real outside
        return fake01 * mask + (1 - mask) * img01

    def fn(image, mask, masked, key):
        return run(params, vae_params, jnp.asarray(image), jnp.asarray(mask),
                   jnp.asarray(masked), key)

    return fn


def run_inpainting_eval(config: Config, model, params, vae, vae_params,
                        dataset, save_dir: str, batch_size: int = 25,
                        seed: int = 42, log_fn: Callable = print):
    """Generate composited inpaintings for the whole eval set
    (test_flow_latent_inpainting.py:143-168); score with
    eval/inpainting_metrics.calculate_metrics afterwards."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    sampler = make_inpainting_sampler(config, model, params, vae, vae_params)
    key = jax.random.PRNGKey(seed)
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        items = [dataset[i] for i in idx]
        image = np.stack([it[0] for it in items])
        mask = np.stack([it[1] for it in items])
        masked = np.stack([it[2] for it in items])
        out = np.asarray(sampler(image, mask, masked, jax.random.fold_in(key, start)))
        for j, i in enumerate(idx):
            Image.fromarray((out[j] * 255).astype(np.uint8)).save(
                os.path.join(save_dir, f"{i}.jpg"))
        log_fn(f"generating batch {start // batch_size}")


def make_semantic_sampler(config: Config, model, params, rescaler, rescaler_params,
                          vae, vae_params, num_classes: int):
    """Returns fn(seg, key) -> images in [0,1]."""
    sc = config.sample
    scale = config.scale_factor

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    @jax.jit
    def run(params, rparams, vae_params, seg, key):
        onehot = jax.nn.one_hot(seg, num_classes, dtype=jnp.float32)
        c = rescaler.apply({"params": rparams}, onehot)
        noise = jax.random.normal(key, c.shape[:3] + (4,))
        z0, _ = sample_conditional(
            model_apply, params, c, noise, method=sc.method,
            atol=1e-8, rtol=1e-8, num_steps=sc.num_steps,
        )
        fake = vae.apply(vae_params, z0 / scale, method=type(vae).decode)
        return jnp.clip((fake + 1) / 2, 0, 1)

    def fn(seg, key):
        return run(params, rescaler_params, vae_params, jnp.asarray(seg), key)

    return fn


def to_rgb(onehot_seg: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Random 1x1-conv projection of a one-hot seg map to RGB for plots
    (reference train_flow_latent_semantic_syn.py:36-41)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k = onehot_seg.shape[-1]
    w = jax.random.normal(key, (k, 3))
    x = onehot_seg @ w
    return 2.0 * (x - x.min()) / (x.max() - x.min()) - 1.0
