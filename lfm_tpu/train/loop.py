"""Full training loop (reference train_flow_latent.py:48-216, TPU-native).

One jitted step fuses VAE-encode + FM loss + backward + AdamW + EMA; the
epoch loop handles data, logging (loss + steps/sec every 100 iters, rank-0
semantics are implicit in single-controller JAX), demo sampling every
``plot_every`` epochs (adaptive dopri5 like the reference's
``sample_from_model``), and two-tier checkpoints.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lfm_tpu.core import checkpoint as ckpt
from lfm_tpu.core.config import Config
from lfm_tpu.core.multihost import any_process_flag, is_main_process
from lfm_tpu.core.preemption import PreemptionGuard
from lfm_tpu.core.sharding import (make_mesh, put_global, put_tree,
                                   replicated, shard_batch)
from lfm_tpu.data import DataLoader, get_dataset
from lfm_tpu.nn.factory import create_network
from lfm_tpu.train.state import (
    TrainState, create_train_state, fused_supported, make_fused_adamw_ema,
    make_optimizer,
)
from lfm_tpu.train.train import jit_train_step, make_train_step


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """[-1,1] or [0,1] NHWC batch -> one PNG grid (torchvision.save_image
    equivalent, train_flow_latent.py:185-190)."""
    from PIL import Image

    imgs = np.asarray(images)
    if imgs.min() < -0.01:  # normalize from [-1,1]
        imgs = (imgs + 1.0) / 2.0
    imgs = np.clip(imgs, 0, 1)
    n, h, w, c = imgs.shape
    rows = -(-n // nrow)
    grid = np.zeros((rows * h, min(n, nrow) * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    Image.fromarray((grid * 255).astype(np.uint8).squeeze()).save(path)


def train(config: Config, *, dataset=None, vae=None, vae_params=None,
          mesh=None, log_fn: Callable = print, max_steps: Optional[int] = None):
    """Run training per config. Returns the final TrainState."""
    tc = config.train
    pp = config.mesh.pp
    pp_chunks = config.mesh.pp_chunks if pp > 1 else 1
    # Multi-process (one process per host, reference train_flow_latent.py
    # spawn path): the SAME program runs everywhere over one global mesh;
    # logs/plots/config dumps are rank-0 only, the reference's `if rank == 0`
    # gates (train_flow_latent.py:174-216). Checkpoint saves are COLLECTIVE:
    # every process calls into Orbax (its save barrier syncs all processes)
    # and Orbax's primary-host logic writes once to the shared exp_path.
    main_proc = is_main_process()
    if not main_proc:
        log_fn = lambda *a, **k: None  # noqa: E731
    # user-configuration invariants raise (never assert: stripped under -O,
    # which would let an unsupported config train with wrong semantics)
    if pp > 1 and jax.process_count() != 1:
        raise NotImplementedError(
            "pipeline-parallel training is single-process (pipe-sharded "
            "state cannot be checkpointed from one rank); span hosts with "
            "dp/fsdp/tp instead")
    mesh = mesh if mesh is not None else make_mesh(config.mesh.dp, config.mesh.fsdp,
                                                   config.mesh.tp, config.mesh.sp,
                                                   pp)
    dataset = dataset if dataset is not None else get_dataset(config, seed=tc.seed)
    loader = DataLoader(dataset, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed)
    steps_per_epoch = tc.steps_per_epoch or max(len(loader), 1)

    use_label = "imagenet" in config.dataset  # train_flow_latent.py:131
    is_latent = "latent" in config.dataset    # train_flow_latent.py:132
    dtype = jnp.bfloat16 if tc.precision == "bf16" else jnp.float32

    model = create_network(config.model, dtype=dtype, remat=tc.use_grad_checkpointing,
                           remat_policy=tc.remat_policy,
                           use_flash=config.model.use_flash_attention)
    key = jax.random.PRNGKey(tc.seed)
    s = config.model.latent_size
    cin = config.model.num_in_channels
    y0 = jnp.zeros((1,), jnp.int32) if (config.model.num_classes or 0) > 0 else None
    init_rngs = {"params": key, "label_dropout": key}
    # init under jit: eager init is ~1s/op through a remote-TPU tunnel
    params = jax.jit(model.init)(init_rngs, jnp.zeros((1,)),
                                 jnp.zeros((1, s, s, cin)), y0)

    tx = make_optimizer(tc, steps_per_epoch)
    # optax init is eager per-leaf too — build the whole state in one program
    state = jax.jit(lambda p: create_train_state(p, tc, steps_per_epoch))(params)

    if vae is not None:
        def encode_fn(x, k):
            return vae.apply(vae_params, x, k, method=type(vae).encode_sample)
    else:
        encode_fn = None
        is_latent = True  # treat raw input as latents (synthetic/latent data)

    label_dropout = config.model.label_dropout > 0

    if pp > 1:
        # pipeline-parallel training: DiT block stages over the pipe mesh
        # axis (core/pipeline.py; interleaved schedule when pp_chunks > 1).
        # Checkpoints stay canonical: the state is permuted into placement
        # order here and back before every save (canon()/_canonical below).
        from lfm_tpu.sample.pp import make_pp_apply

        if label_dropout:
            raise NotImplementedError(
                "pipeline-parallel training requires label_dropout == 0 "
                "(per-stage dropout rng is not plumbed); train CFG-dropout "
                "recipes with dp/fsdp/tp instead")
        model_apply = make_pp_apply(model, mesh, train=True,
                                    num_chunks=pp_chunks)
    elif mesh.devices.size > 1 and not label_dropout:
        # multi-device: evaluate the net inside a shard_map so the Pallas
        # attention kernels keep working under SPMD (train.py helper);
        # label-dropout models keep the plain path (per-shard RNG would
        # change the dropout pattern)
        from lfm_tpu.train.train import shard_mapped_model_apply

        model_apply = shard_mapped_model_apply(model, mesh)
    else:
        def model_apply(p, t, z, y, rngs=None):
            return model.apply(p, t, z, y, train=True, rngs=rngs)

    fused = (make_fused_adamw_ema(tc, steps_per_epoch, ema_decay=tc.ema_decay,
                                  use_ema=tc.use_ema)
             if fused_supported(state.opt_state) else None)
    step_fn = make_train_step(
        model_apply, tx, ema_decay=tc.ema_decay, use_ema=tc.use_ema,
        encode_fn=encode_fn, scale_factor=config.scale_factor,
        is_latent_data=is_latent, label_dropout=label_dropout,
        fused_update=fused,
    )
    repl = replicated(mesh)
    if pp > 1:
        # placement order (interleaved when pp_chunks > 1) on-device, 1/S
        # block memory; canonical checkpoint order on disk
        from lfm_tpu.core.sharding import PIPE_AXIS
        from lfm_tpu.sample.pp import permute_state_blocks, pp_state_shardings

        n_stages = mesh.shape[PIPE_AXIS]
        state_sh = pp_state_shardings(state, mesh)

        def place(s):
            return jax.device_put(
                permute_state_blocks(s, n_stages, pp_chunks), state_sh)

        def canon(tree):
            return permute_state_blocks(tree, n_stages, pp_chunks,
                                        inverse=True)
    else:
        state_sh = None

        def place(s):
            return put_tree(s, repl)  # multi-process safe (core/sharding.py)

        def canon(tree):
            return tree

    jstep = jit_train_step(step_fn, mesh, state_shardings=state_sh)
    state = place(state)

    exp_path = config.exp_path
    if main_proc:
        os.makedirs(exp_path, exist_ok=True)
        with open(os.path.join(exp_path, "config.json"), "w") as f:
            f.write(config.to_json())

    init_epoch = 0
    if tc.model_ckpt and tc.model_ckpt.endswith(".pth") and os.path.exists(tc.model_ckpt):
        # resume straight from a reference content.pth (torch AdamW + EMA)
        from lfm_tpu.core.convert_optimizer import load_reference_content

        state, init_epoch, _ = load_reference_content(tc.model_ckpt, config, model, tx)
        state = place(state)
        log_fn(f"=> resumed from reference checkpoint {tc.model_ckpt} "
               f"(epoch {init_epoch})")
    elif (tc.resume or ckpt.has_content(exp_path)) and ckpt.has_content(exp_path):
        state, init_epoch = ckpt.restore_content(exp_path, canon(state))
        state = place(state)
        log_fn(f"=> resume checkpoint (epoch {init_epoch})")

    base_key = put_global(jax.random.PRNGKey(tc.seed + 1), repl)
    global_step = int(state.step)
    log_steps, t_start = 0, time.time()
    n_proc = jax.process_count()
    # Multi-process preemption checks are collectives (host-synced); a
    # fixed step cadence bounds the sync overhead, and because it comes
    # from config it is identical on every rank (a wall-clock cadence
    # would diverge across ranks and desynchronize the collective). The
    # worst-case reaction lag is cadence x step time — configs with slow
    # steps should lower tc.preempt_check_every so the checkpoint lands
    # inside the SIGTERM grace window (see core/config.py).
    preempt_check_every = max(1, int(tc.preempt_check_every))

    with PreemptionGuard() as guard:
        for epoch in range(init_epoch, tc.num_epoch + 1):
            loader.set_epoch(epoch)
            for it, batch in enumerate(loader):
                if not use_label:
                    batch.pop("y", None)
                batch = shard_batch(mesh, batch)
                state, metrics = jstep(state, batch, base_key)
                global_step += 1
                log_steps += 1
                if it % 100 == 0:
                    dt = time.time() - t_start
                    sps = log_steps / dt if dt > 0 else 0.0
                    log_fn(f"epoch {epoch} iteration{it}, Loss: {float(metrics.loss)}, "
                           f"Train Steps/Sec: {sps:.2f}")
                    log_steps, t_start = 0, time.time()
                # TPU preemption (SIGTERM): the decision must be COLLECTIVE
                # — SIGTERM lands at different step boundaries per host, so
                # a rank acting on its LOCAL flag enters the collective
                # Orbax save while the others enter the next step's
                # cross-process all-reduce, deadlocking the pod. Single
                # process acts on the local flag immediately (free); multi-
                # process all-reduces the flag at a fixed cadence and every
                # rank acts (or none does) on the agreed value.
                if n_proc == 1:
                    preempt = guard.preempted
                else:
                    preempt = (global_step % preempt_check_every == 0
                               and any_process_flag(guard.preempted))
                if preempt:
                    # flush a content checkpoint at the CURRENT epoch (it
                    # re-runs on resume) and exit clean
                    ckpt.save_content(exp_path, canon(state), epoch, config)
                    log_fn(f"=> preemption signal: content checkpoint saved "
                           f"at epoch {epoch} (step {global_step})")
                    return canon(state)
                # max_steps is identical on every rank (same config), so
                # this early return is collective by construction — if it
                # ever becomes rank-dependent it needs any_process_flag too
                if max_steps is not None and global_step >= max_steps:
                    return canon(state)

            if epoch % tc.plot_every == 0 and vae is not None and main_proc:
                _demo_plot(config, model, canon(state), vae, vae_params,
                           exp_path, epoch)
            if tc.save_content and epoch % tc.save_content_every == 0:
                ckpt.save_content(exp_path, canon(state), epoch + 1, config)
            if epoch % tc.save_ckpt_every == 0:
                ckpt.save_model(
                    exp_path,
                    canon(state.ema_params if tc.use_ema else state.params),
                    epoch)
    return canon(state)


def _demo_plot(config, model, state, vae, vae_params, exp_path, epoch):
    """4-sample dopri5 demo grid (train_flow_latent.py:176-191)."""
    from lfm_tpu.core.config import SampleConfig
    from lfm_tpu.core.rng import SampleRNG
    from lfm_tpu.sample.sample import make_sampler

    demo_cfg = config.replace(sample=SampleConfig(method="dopri5"))
    params = state.ema_params if config.train.use_ema else state.params
    if jax.process_count() > 1:
        # rank-0-only plot: detach from the global (partly non-addressable)
        # replicated arrays so the process-local sampler jit can place them
        params = jax.tree_util.tree_map(np.asarray, params)
        vae_params = jax.tree_util.tree_map(np.asarray, vae_params)
    sampler = make_sampler(demo_cfg, model, params, vae, vae_params)
    rng = SampleRNG(seed=config.train.seed)
    s = config.model.latent_size
    noise = rng.randn(jnp.arange(4), (s, s, config.model.num_in_channels))
    y = None
    if (config.model.num_classes or 0) > 1:
        y = rng.randint(jnp.arange(4), 0, config.model.num_classes)
    out = sampler(noise, y)
    save_image_grid(np.asarray(out.images), os.path.join(exp_path, f"image_epoch_{epoch}.png"))
