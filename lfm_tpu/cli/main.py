"""CLI: same flag surface as the reference entry points.

Subcommands:
  train   — reference train_flow_latent.py (argparse at :220-338)
  sample  — reference test_flow_latent.py default grid-save mode (:285-299)
  fid     — --compute_fid mode (:248-283), mesh-sharded
  nfe     — --compute_nfe mode (:196-221)
  time    — --measure_time mode (:223-246)

Configs come from --preset (celeb256_dit, ...), --argfile (a reference
test_args/*.txt), or individual flags that override either.

Example:
  python -m lfm_tpu.cli.main sample --preset celeb256_dit \\
      --ckpt saved_info/.../model_475 --method euler --steps 40
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time as _time

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser("lfm_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", type=str, default=None)
        sp.add_argument("--argfile", type=str, default=None)
        sp.add_argument("--exp", type=str, default=None)
        sp.add_argument("--dataset", type=str, default=None)
        sp.add_argument("--datadir", type=str, default=None)
        sp.add_argument("--model_type", type=str, default=None)
        sp.add_argument("--image_size", type=int, default=None)
        sp.add_argument("--num_classes", type=int, default=None)
        sp.add_argument("--label_dropout", type=float, default=None)
        sp.add_argument("--nf", type=int, default=None)
        sp.add_argument("--ch_mult", nargs="+", type=int, default=None)
        sp.add_argument("--attn_resolutions", nargs="+", type=int, default=None)
        sp.add_argument("--num_res_blocks", type=int, default=None)
        sp.add_argument("--use_origin_adm", action="store_true", default=None)
        sp.add_argument("--scale_factor", type=float, default=None)
        sp.add_argument("--batch_size", type=int, default=None)
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--vae_ckpt", type=str, default=None,
                        help="converted/diffusers VAE checkpoint path")
        # multi-process launch (reference MASTER_ADDR/PORT + world_size/rank,
        # test_flow_latent.py:401-429): one process per host, one global mesh
        sp.add_argument("--coordinator", type=str, default=None,
                        help="multi-process rendezvous address host:port; "
                             "omit on Cloud TPU pods (runtime-provided)")
        sp.add_argument("--num_procs", type=int, default=None,
                        help="multi-process world size (one process per "
                             "host); the mesh spans all global devices")
        sp.add_argument("--process_id", type=int, default=None,
                        help="this process's rank in --num_procs")

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--num_epoch", type=int, default=None)
    t.add_argument("--no_lr_decay", action="store_true", default=None)
    t.add_argument("--use_ema", action="store_true", default=None)
    t.add_argument("--ema_decay", type=float, default=None)
    t.add_argument("--use_grad_checkpointing", action="store_true", default=None)
    t.add_argument("--save_content", action="store_true", default=None)
    t.add_argument("--save_content_every", type=int, default=None)
    t.add_argument("--save_ckpt_every", type=int, default=None)
    t.add_argument("--plot_every", type=int, default=None)
    t.add_argument("--resume", action="store_true", default=None)
    t.add_argument("--model_ckpt", type=str, default=None,
                   help="init/resume from a checkpoint; a reference "
                        "content.pth restores optimizer + EMA state too")
    t.add_argument("--dp", type=int, default=None, help="data-parallel mesh axis (-1 = all)")
    t.add_argument("--fsdp", type=int, default=None, help="FSDP mesh axis")
    t.add_argument("--tp", type=int, default=None, help="tensor-parallel mesh axis")
    t.add_argument("--sp", type=int, default=None,
                   help="sequence-parallel mesh axis (ring attention)")
    t.add_argument("--pp", type=int, default=None,
                   help="pipeline-parallel mesh axis (DiT block stages)")
    t.add_argument("--pp_chunks", type=int, default=None,
                   help="virtual pipeline stages per device (interleaved "
                        "schedule: bubble /= pp_chunks; checkpoints stay "
                        "canonical)")
    t.add_argument("--precision", type=str, default=None, choices=["bf16", "f32"])
    t.add_argument("--max_steps", type=int, default=None)
    t.add_argument("--preempt_check_every", type=int, default=None,
                   help="multi-process preemption-flag all-reduce cadence "
                        "in steps (worst-case SIGTERM reaction lag = "
                        "cadence x step time; lower for slow-step configs)")
    t.add_argument("--remat_policy", type=str, default=None,
                   choices=["dots", "all_dots", "dots_attn"],
                   help="gradient-checkpoint policy for remat'd blocks "
                        "(default: full-block remat; dots_attn also saves "
                        "the attention output — fastest measured on v5e)")

    ti = sub.add_parser("train-inpainting")
    common(ti)
    ti.add_argument("--lr", type=float, default=None)
    ti.add_argument("--num_epoch", type=int, default=None)
    ti.add_argument("--use_ema", action="store_true", default=None)
    ti.add_argument("--save_content", action="store_true", default=None)
    ti.add_argument("--max_steps", type=int, default=None)

    ts = sub.add_parser("train-semantic")
    common(ts)
    ts.add_argument("--seg_dataset", type=str, default="celebamask",
                    choices=["coco", "ade20k", "celebamask"])
    ts.add_argument("--lr", type=float, default=None)
    ts.add_argument("--num_epoch", type=int, default=None)
    ts.add_argument("--use_ema", action="store_true", default=None)
    ts.add_argument("--save_content", action="store_true", default=None)
    ts.add_argument("--max_steps", type=int, default=None)

    tie = sub.add_parser("test-inpainting")
    common(tie)
    tie.add_argument("--ckpt", type=str, default=None)
    tie.add_argument("--method", type=str, default=None)
    tie.add_argument("--num_steps", "--steps", type=int, default=None, dest="num_steps")
    tie.add_argument("--indir", type=str, required=False, default=None)
    tie.add_argument("--maskdir", type=str, required=False, default=None)
    tie.add_argument("--save_dir", type=str, default="./inpainting_generated_samples")
    tie.add_argument("--epoch_id", type=int, default=None)

    tse = sub.add_parser("test-semantic")
    common(tse)
    tse.add_argument("--seg_dataset", type=str, default="celebamask",
                     choices=["coco", "ade20k", "celebamask"])
    tse.add_argument("--split", type=str, default="val")
    tse.add_argument("--ckpt", type=str, default=None)
    tse.add_argument("--method", type=str, default=None)
    tse.add_argument("--num_steps", "--steps", type=int, default=None, dest="num_steps")
    tse.add_argument("--n_sample", type=int, default=None)
    tse.add_argument("--save_dir", type=str, default="./semantic_generated_samples")
    tse.add_argument("--epoch_id", type=int, default=None)

    for name in ("sample", "fid", "nfe", "time"):
        s = sub.add_parser(name)
        common(s)
        s.add_argument("--epoch_id", type=int, default=None)
        s.add_argument("--ckpt", type=str, default=None,
                       help="model checkpoint (orbax dir or reference .pth)")
        s.add_argument("--method", type=str, default=None)
        s.add_argument("--num_steps", "--steps", type=int, default=None, dest="num_steps")
        s.add_argument("--atol", type=float, default=None)
        s.add_argument("--rtol", type=float, default=None)
        s.add_argument("--cfg_scale", type=float, default=None)
        s.add_argument("--use_karras_samplers", action="store_true", default=None)
        fd = s.add_mutually_exclusive_group()
        fd.add_argument("--fused_dit", action="store_true", default=None,
                        help="force-enable the fused Pallas DiT sampling "
                             "kernel (overrides an argfile/preset that "
                             "disabled it)")
        fd.add_argument("--no_fused_dit", action="store_true", default=None,
                        help="disable the fused Pallas DiT sampling kernel")
        s.add_argument("--int8_dit", action="store_true", default=None,
                       help="opt-in w8a8 int8 DiT sampling (dynamic "
                            "activation quantization on the int8 MXU; "
                            "bounded output error, see nn/dit_int8.py)")
        s.add_argument("--eval_noise", type=str, default=None,
                       help='adaptive noise floor: float or "auto" '
                            "(default: per-method policy)")
        s.add_argument("--sp", type=int, default=None,
                       help="sequence-parallel mesh axis for sampling "
                            "(ring attention over latent rows)")
        s.add_argument("--pp", type=int, default=None,
                       help="pipeline-parallel mesh axis for sampling "
                            "(DiT block stages over ICI)")
        s.add_argument("--pp_chunks", type=int, default=None,
                       help="virtual pipeline stages per device "
                            "(interleaved schedule: bubble /= pp_chunks)")
        s.add_argument("--n_sample", type=int, default=None)
        s.add_argument("--generator", type=str, default=None)
        s.add_argument("--real_img_dir", type=str, default=None)
        s.add_argument("--output_log", type=str, default=None)
        s.add_argument("--inception_ckpt", type=str, default=None)
        s.add_argument("--save_dir", type=str, default=None)
    return p


def _resolve_config(args):
    from lfm_tpu.core.config import Config, get_preset, load_argfile

    class _Args:
        """attribute access with None default (subcommands differ in flags)."""

        def __init__(self, ns):
            self._ns = ns

        def __getattr__(self, name):
            return getattr(self._ns, name, None)

    args = _Args(args)
    if args.preset:
        config = get_preset(args.preset)
    elif args.argfile:
        config = load_argfile(args.argfile)
    else:
        config = Config()

    def over(dc, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(dc, **kw) if kw else dc

    model = over(
        config.model,
        model_type=args.model_type, image_size=args.image_size,
        num_classes=args.num_classes, label_dropout=args.label_dropout,
        nf=args.nf,
        ch_mult=tuple(args.ch_mult) if args.ch_mult else None,
        attn_resolutions=tuple(args.attn_resolutions) if args.attn_resolutions else None,
        num_res_blocks=args.num_res_blocks,
        use_origin_adm=args.use_origin_adm,
    )
    sample = config.sample
    if args.cmd not in ("train", "train-inpainting", "train-semantic"):
        sample = over(
            sample,
            method=args.method, num_steps=args.num_steps, atol=args.atol,
            rtol=args.rtol, cfg_scale=args.cfg_scale,
            use_karras_samplers=args.use_karras_samplers,
            n_sample=args.n_sample, batch_size=args.batch_size,
            epoch_id=args.epoch_id, seed=args.seed,
            generator=args.generator, real_img_dir=args.real_img_dir,
            output_log=args.output_log,
            use_fused_dit=(False if getattr(args, "no_fused_dit", None)
                           else True if getattr(args, "fused_dit", None)
                           else None),
            use_int8_dit=(True if getattr(args, "int8_dit", None) else None),
            eval_noise=(None if getattr(args, "eval_noise", None) is None
                        else "auto" if args.eval_noise == "auto"
                        else float(args.eval_noise)),
        )
    train_cfg = config.train
    if args.cmd in ("train", "train-inpainting", "train-semantic"):
        train_cfg = over(
            train_cfg,
            lr=args.lr, num_epoch=args.num_epoch, no_lr_decay=args.no_lr_decay,
            use_ema=args.use_ema, ema_decay=args.ema_decay,
            use_grad_checkpointing=args.use_grad_checkpointing,
            save_content=args.save_content,
            save_content_every=args.save_content_every,
            save_ckpt_every=args.save_ckpt_every, plot_every=args.plot_every,
            resume=args.resume, precision=args.precision,
            batch_size=args.batch_size, seed=args.seed,
            model_ckpt=args.model_ckpt,
            remat_policy=args.remat_policy,
            preempt_check_every=getattr(args, "preempt_check_every", None),
        )
    data = over(config.data, dataset=args.dataset, datadir=args.datadir)
    mesh = over(config.mesh, dp=args.dp, fsdp=args.fsdp, tp=args.tp,
                sp=getattr(args, "sp", None), pp=getattr(args, "pp", None),
                pp_chunks=getattr(args, "pp_chunks", None))
    config = dataclasses.replace(
        config, model=model, sample=sample, train=train_cfg, data=data, mesh=mesh,
    )
    config = over(config, exp=args.exp, dataset=args.dataset,
                  scale_factor=args.scale_factor)
    return config


def _load_model_and_params(config, args):
    import jax
    import jax.numpy as jnp

    from lfm_tpu.core import checkpoint as ckpt
    from lfm_tpu.nn.factory import create_network

    model = create_network(config.model, dtype=jnp.bfloat16,
                           use_flash=config.model.use_flash_attention)
    s = config.model.latent_size
    y0 = (jnp.zeros((1,), jnp.int32)
          if (config.model.num_classes or 0) > 0 and config.model.is_dit
          else None)
    if not config.model.is_dit and (config.model.num_classes or 0) > 1:
        y0 = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(0)
    # init under jit: eager init is ~1s/op through a remote-TPU tunnel
    template = jax.jit(model.init)(
        {"params": key, "label_dropout": key}, jnp.zeros((1,)),
        jnp.zeros((1, s, s, config.model.num_in_channels)), y0)
    path = args.ckpt
    if path is None:
        path = os.path.join(config.exp_path, f"model_{config.sample.epoch_id}")
    if path.endswith(".pth"):
        params = ckpt.load_reference_checkpoint(path, config, model)
    elif os.path.isdir(path):
        from lfm_tpu.core.checkpoint import _ocp

        with _ocp().PyTreeCheckpointer() as c:
            params = c.restore(os.path.abspath(path),
                               item=jax.tree_util.tree_map(np.asarray, template))
    else:
        print(f"[warn] checkpoint {path} not found; using random init", file=sys.stderr)
        params = template
    return model, params


def _load_downstream_params(config, args, cond_template=None):
    """Downstream checkpoints wrap params as {'model':..., 'cond':...}
    (train/downstream_loops.py); reference .pth is a bare UNet state dict.
    Returns (model, {'model': ..., 'cond': ...})."""
    import jax
    import jax.numpy as jnp

    from lfm_tpu.core import checkpoint as ckpt
    from lfm_tpu.nn.factory import create_network

    model = create_network(config.model, dtype=jnp.bfloat16)
    s = config.model.latent_size
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,)),
        jnp.zeros((1, s, s, config.model.num_in_channels)))
    cond_template = cond_template if cond_template is not None else {}
    path = args.ckpt
    if path and path.endswith(".pth"):
        loaded = ckpt.load_reference_checkpoint(path, config, model)
        return model, {"model": loaded, "cond": cond_template}
    if path and os.path.isdir(path):
        from lfm_tpu.core.checkpoint import _ocp

        wrapped = {
            "model": jax.tree_util.tree_map(np.asarray, template),
            "cond": jax.tree_util.tree_map(np.asarray, cond_template),
        }
        with _ocp().PyTreeCheckpointer() as c:
            restored = c.restore(os.path.abspath(path), item=wrapped)
        return model, restored
    print(f"[warn] checkpoint {path} not found; using random init", file=sys.stderr)
    return model, {"model": template, "cond": cond_template}


def _load_vae(args):
    import jax
    import jax.numpy as jnp

    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    if args.vae_ckpt and os.path.exists(args.vae_ckpt):
        from lfm_tpu.vae.convert import load_vae_params

        return vae, load_vae_params(args.vae_ckpt)
    print("[warn] no --vae_ckpt; using random VAE weights", file=sys.stderr)
    params = jax.jit(vae.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jax.random.PRNGKey(1))
    return vae, params


# Subcommands with a multi-process story (rank-0-gated writes, collective
# checkpointing/allgather). The rest would run the identical computation on
# every rank and race writing the same output files to shared storage —
# reject the flags instead of corrupting output.
_MULTIPROC_CMDS = ("train", "fid")


def main(argv=None):
    args = _build_parser().parse_args(argv)
    if getattr(args, "num_procs", None) and args.num_procs > 1:
        if args.cmd not in _MULTIPROC_CMDS:
            raise SystemExit(
                f"--num_procs > 1 is not supported for '{args.cmd}' (only "
                f"{', '.join(_MULTIPROC_CMDS)} are multi-process aware; "
                "other subcommands would duplicate work on every rank and "
                "race on output files)")
        # multi-process launch (reference test_flow_latent.py:401-429 spawns
        # a process per GPU with MASTER_ADDR/PORT): join the coordinator
        # BEFORE any JAX device use, then run the same single program over
        # the global mesh
        from lfm_tpu.core.multihost import initialize

        initialize(args.coordinator, args.num_procs, args.process_id)
    config = _resolve_config(args)

    if args.cmd == "train-inpainting":
        import dataclasses as _dc

        from lfm_tpu.data import get_inpainting_dataset
        from lfm_tpu.train.downstream_loops import train_inpainting

        config = _dc.replace(config, model=_dc.replace(config.model, num_in_channels=9))
        vae, vae_params = _load_vae(args)
        ds = get_inpainting_dataset(config)
        train_inpainting(config, ds, vae, vae_params, max_steps=args.max_steps)
        return

    if args.cmd == "train-semantic":
        import dataclasses as _dc

        from lfm_tpu.data.segmentation import get_segmentation_dataset
        from lfm_tpu.nn.encoders import SpatialRescaler
        from lfm_tpu.train.downstream_loops import train_semantic

        ds = get_segmentation_dataset(args.seg_dataset, config.data.datadir,
                                      size=config.model.image_size)
        num_cls = ds.num_classes
        config = _dc.replace(config, model=_dc.replace(config.model, num_in_channels=8))
        vae, vae_params = _load_vae(args)
        rescaler = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
        train_semantic(config, ds, vae, vae_params, rescaler,
                       num_classes=num_cls, max_steps=args.max_steps)
        return

    if args.cmd == "test-inpainting":
        import dataclasses as _dc

        from lfm_tpu.sample.downstream import InpaintingEvalDataset, run_inpainting_eval

        config = _dc.replace(config, model=_dc.replace(config.model, num_in_channels=9))
        model, wrapped = _load_downstream_params(config, args)
        params = wrapped["model"]
        vae, vae_params = _load_vae(args)
        ds = InpaintingEvalDataset(args.indir, args.maskdir)
        save_dir = os.path.join(args.save_dir, config.dataset)
        run_inpainting_eval(config, model, params, vae, vae_params, ds, save_dir,
                            batch_size=config.sample.batch_size)
        print(f"composited samples saved to {save_dir}; score with "
              "lfm_tpu.eval.inpainting_metrics.calculate_metrics")
        return

    if args.cmd == "test-semantic":
        import dataclasses as _dc

        import jax as _jax
        import jax.numpy as _jnp

        from lfm_tpu.data.segmentation import get_segmentation_dataset
        from lfm_tpu.nn.encoders import SpatialRescaler
        from lfm_tpu.sample.downstream import make_semantic_sampler
        from lfm_tpu.train.loop import save_image_grid

        ds = get_segmentation_dataset(args.seg_dataset, config.data.datadir,
                                      size=config.model.image_size,
                                      split=args.split)
        num_cls = ds.num_classes
        config = _dc.replace(config, model=_dc.replace(config.model, num_in_channels=8))
        rescaler = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
        rtemplate = _jax.jit(rescaler.init)(
            _jax.random.PRNGKey(0),
            _jnp.zeros((1, config.model.image_size, config.model.image_size, num_cls)),
        )["params"]
        model, wrapped = _load_downstream_params(config, args, cond_template=rtemplate)
        mparams, rparams = wrapped["model"], wrapped["cond"]
        vae, vae_params = _load_vae(args)
        sampler = make_semantic_sampler(config, model, mparams, rescaler, rparams,
                                        vae, vae_params, num_classes=num_cls)
        os.makedirs(args.save_dir, exist_ok=True)
        n = min(args.n_sample or 8, len(ds))
        bs = config.sample.batch_size
        from PIL import Image

        for start in range(0, n, bs):
            idx = range(start, min(start + bs, n))
            seg = np.stack([ds[i][1] for i in idx])
            out = np.asarray(sampler(seg, _jax.random.PRNGKey(start)))
            for j, i in enumerate(idx):
                Image.fromarray((out[j] * 255).astype(np.uint8)).save(
                    os.path.join(args.save_dir, f"{i}.jpg"))
        print(f"{n} semantic samples saved to {args.save_dir}")
        return

    if args.cmd == "train":
        from lfm_tpu.train.loop import train

        vae, vae_params = (None, None)
        if "latent" not in config.dataset and "synthetic" not in config.dataset:
            vae, vae_params = _load_vae(args)
        train(config, vae=vae, vae_params=vae_params, max_steps=args.max_steps)
        return

    import jax
    import jax.numpy as jnp

    from lfm_tpu.core.rng import SampleRNG
    from lfm_tpu.sample.sample import make_sampler, noise_and_labels
    from lfm_tpu.train.loop import save_image_grid

    model, params = _load_model_and_params(config, args)
    vae, vae_params = _load_vae(args)
    rng = SampleRNG(seed=config.sample.seed, num_samples=config.sample.n_sample)

    if args.cmd == "sample":
        sp_mesh = None
        pp_mesh = None
        if config.mesh.sp > 1 or config.mesh.pp > 1:
            from lfm_tpu.core.sharding import make_mesh

            mesh = make_mesh(config.mesh.dp, config.mesh.fsdp,
                             config.mesh.tp, config.mesh.sp, config.mesh.pp)
            sp_mesh = mesh if config.mesh.sp > 1 else None
            pp_mesh = mesh if (sp_mesh is None and config.mesh.pp > 1) else None
        sampler = make_sampler(config, model, params, vae, vae_params,
                               sp_mesh=sp_mesh, pp_mesh=pp_mesh)
        idx = jnp.arange(config.sample.batch_size)
        noise, y = noise_and_labels(config, rng, idx)
        out = sampler(noise, y)
        sc = config.sample
        if not sc.use_karras_samplers:
            path = f"./samples_{config.dataset}_{sc.method}_{sc.atol}_{sc.rtol}"
        else:
            path = f"./samples_{config.dataset}_{sc.method}_{sc.num_steps}"
        if (config.model.num_classes or 0) > 1:
            path += f"_cfg{sc.cfg_scale}"
        path += ".jpg"
        save_image_grid(np.asarray(out.images), path)
        print(f"Samples are saved at {path} (NFE {float(out.nfe):.0f})")

    elif args.cmd == "fid":
        from lfm_tpu.eval.inception import FIDInceptionV3, load_inception_params
        from lfm_tpu.sample.sharded import compute_fid

        if args.inception_ckpt:
            inc_params = load_inception_params(args.inception_ckpt)
        else:
            print("[warn] no --inception_ckpt; random inception (smoke only)",
                  file=sys.stderr)
            inc_params = jax.jit(FIDInceptionV3().init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        stats = config.sample.real_img_dir or args.real_img_dir
        fid = compute_fid(config, model, params, vae, vae_params, inc_params,
                          stats_path=stats, save_dir=args.save_dir)
        # every process computes the identical score (allgathered acts);
        # only one reports — the reference's rank-0 FID + log append
        # (test_flow_latent_ddp.py:146-153)
        from lfm_tpu.core.multihost import is_main_process

        if is_main_process():
            print(f"FID = {fid}")
            if config.sample.output_log:
                with open(config.sample.output_log, "a") as f:
                    f.write(f"Epoch = {config.sample.epoch_id}, FID = {fid}\n")

    elif args.cmd == "nfe":
        # average NFE over trials, batch 1 (test_flow_latent.py:196-221)
        sampler = make_sampler(config, model, params, vae, vae_params)
        trials = 300 if args.n_sample is None else args.n_sample
        total = 0.0
        for i in range(trials):
            noise, y = noise_and_labels(config, rng, jnp.asarray([i]))
            total += float(sampler(noise, y).nfe)
        print(f"Average NFE over {trials} trials: {int(total / trials)}")

    elif args.cmd == "time":
        # batch-1 latency, 300 reps (test_flow_latent.py:223-246)
        sampler = make_sampler(config, model, params, vae, vae_params)
        noise, y = noise_and_labels(config, rng, jnp.asarray([0]))
        np.asarray(sampler(noise, y).images)  # warmup/compile
        reps = 300 if args.n_sample is None else args.n_sample
        times = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            np.asarray(sampler(noise, y).images)  # host sync via transfer
            times.append((_time.perf_counter() - t0) * 1e3)
        print(f"Inference time: {np.mean(times):.2f}+/-{np.std(times):.2f}ms")


if __name__ == "__main__":
    main()
