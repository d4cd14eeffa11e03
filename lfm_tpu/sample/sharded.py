"""Mesh-sharded FID sample generation.

TPU-native replacement for the reference's torchrun DDP FID harness
(reference test_flow_latent_ddp.py:22-153): instead of 8 processes with
per-rank seeds and interleaved file naming, ONE jitted program generates a
globally-sharded batch per step — the counter-based SampleRNG keys noise by
*global sample index*, so the generated 50k set is identical for any mesh
shape (the reference needed rank-strided torch generators for this,
sampler/random_util.py:36-97).

Per step: indices -> per-sample noise (+labels) -> ODE integrate -> VAE
decode -> (optionally) Inception pool3 activations, all on-device and
batch-sharded over the data axis; only the 2048-d activations (or images, if
saving JPEGs) ever reach the host. FID then scores in-memory activations
against the reference's precomputed stats (eval/fid.py) — no 50k-file JPEG
round-trip unless requested.

Multi-host: the same single program runs unchanged over a mesh spanning
multiple processes (the reference's multi-node Process-spawn path,
test_flow_latent.py:401-429) — inputs are assembled from per-process
callbacks instead of ``device_put`` (which cannot place onto non-addressable
devices), and the 2048-d activations are ``process_allgather``-ed so every
process scores the identical set (rank-0 semantics are implicit).
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lfm_tpu.core.config import Config
from lfm_tpu.core.rng import SampleRNG
from lfm_tpu.core.sharding import (DATA_AXIS, make_mesh, put_global as
                                   _put_global, put_tree as _put_tree)
from lfm_tpu.sample.sample import (build_velocity, resolve_eval_noise,
                                   sample_latents)


def _gather(x) -> np.ndarray:
    """Global device array -> full host numpy on EVERY process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_sharded_generator(
    config: Config,
    model,
    params,
    vae=None,
    vae_params=None,
    inception_params=None,
    mesh=None,
    need_images: bool = True,
):
    """Returns (step_fn, n_steps, global_batch): step_fn(step_idx) generates
    one globally-sharded batch and returns host numpy results.

    ``need_images=False`` (FID-only runs) skips the per-step image transfer
    to host — with activations requested, only ``global_batch x 2048`` floats
    leave the device per step, which matters both over slow links and in a
    multi-process gather."""
    mesh = mesh if mesh is not None else make_mesh()
    sc = config.sample
    n_dev = mesh.devices.size
    per_dev = max(1, sc.batch_size // max(n_dev, 1))
    global_batch = per_dev * n_dev
    total = int(math.ceil(sc.n_sample / global_batch) * global_batch)
    n_steps = total // global_batch

    rng = SampleRNG(seed=sc.seed, num_samples=sc.n_sample)
    s = config.model.latent_size
    cin = config.model.num_in_channels
    nc = config.model.num_classes

    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def raw(params, vae_params, inception_params, indices):
        noise = rng.randn(indices, (s, s, cin))
        y = rng.randint(indices, 0, nc) if (nc is not None and nc > 1) else None
        # multi-device meshes evaluate the model inside a shard_map over the
        # data axis (per-shard single-device semantics — the form a
        # pallas_call needs under SPMD); single-device meshes call directly
        velocity = build_velocity(
            model, params, y, sc.cfg_scale, nc,
            use_fused_dit=sc.use_fused_dit,
            shard_mesh=mesh if n_dev > 1 else None)
        z0, nfe = sample_latents(
            velocity, noise, method=sc.method, atol=sc.atol, rtol=sc.rtol,
            num_steps=sc.num_steps, step_size=sc.step_size,
            use_karras=sc.use_karras_samplers,
            eval_noise=resolve_eval_noise(sc, model),
        )
        if vae is None:
            return z0, None, nfe
        img = vae.apply(vae_params, z0 / config.scale_factor, method=type(vae).decode)
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        acts = None
        if inception_params is not None:
            from lfm_tpu.eval.inception import FIDInceptionV3

            acts = FIDInceptionV3().apply(inception_params, img)
        return img, acts, nfe

    jitted = jax.jit(
        raw,
        in_shardings=(repl, repl, repl, data),
        out_shardings=(data, data if inception_params is not None else None, repl),
    )

    p_repl = _put_tree(params, repl)
    v_repl = _put_tree(vae_params, repl) if vae_params is not None else None
    i_repl = (_put_tree(inception_params, repl)
              if inception_params is not None else None)

    def step_fn(step: int):
        idx = rng.batch_indices(done=step * global_batch, batch=global_batch)
        idx_host = np.clip(np.asarray(idx), 0, sc.n_sample - 1)
        img, acts, nfe = jitted(p_repl, v_repl, i_repl, _put_global(idx, data))
        return (
            _gather(img) if need_images else None,
            _gather(acts) if acts is not None else None,
            float(nfe),  # replicated: every process holds a local replica
            idx_host,
        )

    return step_fn, n_steps, global_batch


def generate_fid_activations(
    config: Config, model, params, vae, vae_params, inception_params,
    mesh=None, save_dir: Optional[str] = None, progress: Optional[Callable] = None,
) -> np.ndarray:
    """Generate n_sample images and return their (n_sample, 2048) pool3
    activations (deduplicated to exactly n_sample rows). Optionally saves
    JPEGs with the reference's ``{index}.jpg`` naming
    (test_flow_latent.py:267-269)."""
    step_fn, n_steps, global_batch = make_sharded_generator(
        config, model, params, vae, vae_params, inception_params, mesh,
        need_images=save_dir is not None,
    )
    n = config.sample.n_sample
    acts = np.zeros((n, 2048), np.float32)
    seen = np.zeros(n, bool)
    save_here = save_dir is not None
    if save_here and jax.process_count() > 1:
        from lfm_tpu.core.multihost import is_main_process

        save_here = is_main_process()  # every process holds all images
    for step in range(n_steps):
        img, a, _, idx = step_fn(step)
        for row, i in enumerate(idx):
            if not seen[i]:
                acts[i] = a[row]
                seen[i] = True
        if save_here:
            from PIL import Image

            os.makedirs(save_dir, exist_ok=True)
            for row, i in enumerate(idx):
                arr = (img[row] * 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(save_dir, f"{int(i)}.jpg"))
        if progress is not None:
            progress(step + 1, n_steps)
    assert seen.all()
    return acts


def compute_fid(config: Config, model, params, vae, vae_params,
                inception_params, stats_path: str, mesh=None,
                save_dir: Optional[str] = None) -> float:
    """End-to-end 50k FID vs precomputed stats (the reference's
    --compute_fid mode, test_flow_latent.py:248-283)."""
    from lfm_tpu.eval.fid import fid_from_activations

    acts = generate_fid_activations(
        config, model, params, vae, vae_params, inception_params, mesh, save_dir
    )
    return fid_from_activations(acts, stats_path)
