"""Checkpoint-parity runbook: validate a downloaded reference checkpoint
end-to-end (VERDICT round-1 #7).

The environment this framework is developed in has zero egress, so the
released weights (reference readme.md:101-185) cannot be fetched; this tool
makes the FID-parity claim one download away. Given a ``model_{E}.pth``
(bare EMA weights) or ``content.pth`` it runs, skipping any stage whose
input artifact is absent:

  1. convert   — family-dispatched state-dict conversion to a flax tree;
  2. manifest  — the converted tree vs the golden per-argfile manifest
                 (tools/manifests/*.json): missing/extra/misshaped params;
  3. parity    — activation cross-check against the ACTUAL reference torch
                 model imported from --reference (timm is replaced by the
                 functional shim in tools/timm_shim.py), max |rel| error on
                 a fixed random batch;
  4. sample    — a small euler sample grid through the jitted pipeline
                 (requires converted SD-VAE weights via --vae);
  5. fid       — n-sample FID smoke against reference stats (requires
                 --inception pt_inception-2015-12-05-6726825d.pth and
                 --ref-stats <dataset>_stat .npy/.npz).

Example (celeb256_dit, FID 5.26 recipe):
  python tools/verify_released_checkpoint.py \
      --argfile test_args/celeb256_dit.txt --ckpt model_475.pth \
      --vae sd-vae-ft-mse.bin --inception pt_inception-2015-12-05.pth \
      --ref-stats celebahq_stat.npy --n-samples 1000

Each stage prints one JSON line {"stage", "ok", ...}; exit code is non-zero
if any executed stage fails.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(stage: str, ok: bool, **kw) -> bool:
    print(json.dumps({"stage": stage, "ok": bool(ok), **kw}))
    return ok


def strip_module(sd):
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def load_state_dict(path: str):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_dict" in blob:  # content.pth
        return strip_module(blob["model_dict"]), blob
    return strip_module(blob), None


def build_reference_model(config, reference: str):
    """Instantiate the reference torch model for this config (timm shim)."""
    import timm_shim

    timm_shim.install()
    if reference not in sys.path:
        sys.path.insert(0, reference)
    mc = config.model
    if mc.is_dit:
        from models.DiT import DiT_models

        return DiT_models[mc.model_type](
            img_resolution=mc.latent_size, in_channels=mc.num_in_channels,
            num_classes=mc.num_classes or 1,
            label_dropout=mc.label_dropout,
        )
    if mc.use_origin_adm:
        from models.guided_diffusion.unet import UNetModel as TorchUNet

        return TorchUNet(
            image_size=mc.latent_size, in_channels=mc.num_in_channels,
            model_channels=mc.nf, out_channels=mc.num_out_channels,
            num_res_blocks=mc.num_res_blocks,
            attention_resolutions=tuple(mc.attn_resolutions),
            channel_mult=tuple(mc.ch_mult),
            num_classes=mc.num_classes if (mc.num_classes or 0) > 1 else None,
            num_heads=mc.num_heads, num_head_channels=mc.num_head_channels,
            num_heads_upsample=mc.num_head_upsample,
            use_scale_shift_norm=mc.use_scale_shift_norm,
            resblock_updown=mc.resblock_updown,
            use_new_attention_order=mc.use_new_attention_order,
        )
    from models import create_network as ref_create_network

    class _Args:  # the reference factory consumes an argparse namespace
        pass

    a = _Args()
    for k, v in vars(mc).items():
        setattr(a, k, v)
    a.image_size = mc.latent_size
    a.num_in_channels = mc.num_in_channels
    a.num_out_channels = mc.num_out_channels
    a.ch_mult = list(mc.ch_mult)
    a.attn_resolutions = list(mc.attn_resolutions)
    a.layout = False
    return ref_create_network(a)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--argfile", help="test_args/*.txt preset")
    ap.add_argument("--preset", help="named preset (core/config.py PRESETS)")
    ap.add_argument("--ckpt", required=True, help="model_{E}.pth or content.pth")
    ap.add_argument("--reference", default="/root/reference",
                    help="path to the reference repo for torch parity")
    ap.add_argument("--manifest", default=None,
                    help="golden manifest JSON (default: by argfile name)")
    ap.add_argument("--vae", default=None, help="SD-VAE torch weights")
    ap.add_argument("--inception", default=None, help="pt_inception .pth")
    ap.add_argument("--ref-stats", default=None, help="dataset mu/sigma .npy/.npz")
    ap.add_argument("--n-samples", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--out", default="runbook_out")
    ap.add_argument("--parity-tol", type=float, default=5e-3)
    args = ap.parse_args(argv)

    import numpy as np

    from lfm_tpu.core.config import get_preset, load_argfile
    from lfm_tpu.core.convert_optimizer import _convert_family
    from lfm_tpu.nn.factory import create_network
    from param_manifest import MANIFEST_DIR, check_tree

    config = load_argfile(args.argfile) if args.argfile else get_preset(args.preset)
    os.makedirs(args.out, exist_ok=True)
    failures = 0

    import jax.numpy as jnp

    model = create_network(config.model, dtype=jnp.float32)

    # 1. convert
    try:
        sd, _content = load_state_dict(args.ckpt)
        params = _convert_family(sd, config, model)
        n = len([None for _ in _iter_leaves(params)])
        log("convert", True, source_tensors=len(sd), converted_tensors=n)
    except Exception as e:
        log("convert", False, error=str(e)[:300])
        return 1

    # 2. manifest
    mpath = args.manifest
    if mpath is None and args.argfile:
        name = os.path.splitext(os.path.basename(args.argfile))[0]
        mpath = os.path.join(MANIFEST_DIR, f"{name}.json")
    if mpath and os.path.exists(mpath):
        golden = json.load(open(mpath))["tree"]
        missing, extra, bad = check_tree(params, golden)
        ok = not (missing or extra or bad)
        failures += not ok
        log("manifest", ok, missing=missing[:20], extra=extra[:20],
            shape_mismatch=bad[:20])
    else:
        log("manifest", True, skipped="no manifest for this config")

    # 3. parity vs the actual reference torch model
    if os.path.isdir(args.reference):
        try:
            import torch

            ref = build_reference_model(config, args.reference)
            ref.load_state_dict(sd, strict=True)
            ref.eval()
            rng = np.random.default_rng(0)
            s = config.model.latent_size
            cin = config.model.num_in_channels
            x = rng.normal(size=(2, s, s, cin)).astype(np.float32)
            t = np.array([0.25, 0.75], np.float32)
            y = (np.array([0, 1]) if (config.model.num_classes or 0) > 1 else None)
            with torch.no_grad():
                tt = torch.from_numpy(t)
                xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
                if config.model.is_dit:
                    # forward(t, x, y); y=None falls back to the null row
                    yy = (torch.from_numpy(y) if y is not None
                          else torch.zeros(2, dtype=torch.long))
                    want = ref(tt, xt, yy).numpy().transpose(0, 2, 3, 1)
                elif y is not None:
                    want = ref(tt, xt, torch.from_numpy(y)).numpy().transpose(0, 2, 3, 1)
                else:
                    want = ref(tt, xt).numpy().transpose(0, 2, 3, 1)
            yj = jnp.asarray(y) if y is not None else None
            got = np.asarray(model.apply(params, jnp.asarray(t), jnp.asarray(x), yj))
            denom = np.abs(want).max() + 1e-8
            rel = float(np.abs(got - want).max() / denom)
            ok = rel <= args.parity_tol
            failures += not ok
            log("parity", ok, max_rel_err=rel, tol=args.parity_tol)
        except Exception as e:
            failures += 1
            log("parity", False, error=str(e)[:300])
    else:
        log("parity", True, skipped=f"reference repo not found at {args.reference}")

    # 4/5. sampling + FID smoke
    vae = vae_params = None
    if args.vae and os.path.exists(args.vae):
        from lfm_tpu.vae.autoencoder_kl import AutoencoderKL
        from lfm_tpu.vae.convert import load_vae_params

        vae = AutoencoderKL(dtype=jnp.float32)
        vae_params = load_vae_params(args.vae)
    if vae is None:
        log("sample", True, skipped="no --vae weights; latent-only smoke")
        from lfm_tpu.sample.sample import make_sampler

        smoke_cfg = config.replace()
        sampler = make_sampler(smoke_cfg, model, params, jit=True)
        from lfm_tpu.core.rng import SampleRNG

        rngs = SampleRNG(seed=42)
        noise, y = _noise(config, rngs, 4)
        out = sampler(noise, y)
        finite = bool(np.isfinite(np.asarray(out.latents)).all())
        failures += not finite
        log("latent_smoke", finite, nfe=float(out.nfe))
    else:
        from lfm_tpu.sample.sample import make_sampler
        from lfm_tpu.core.rng import SampleRNG
        from lfm_tpu.train.loop import save_image_grid

        sampler = make_sampler(config, model, params, vae, vae_params, jit=True)
        rngs = SampleRNG(seed=42)
        noise, y = _noise(config, rngs, 8)
        out = sampler(noise, y)
        grid = os.path.join(args.out, "grid.png")
        save_image_grid(np.asarray(out.images), grid)
        log("sample", True, grid=grid, nfe=float(out.nfe))

        if args.inception and args.ref_stats:
            import dataclasses

            from lfm_tpu.eval.inception import load_inception_params
            from lfm_tpu.sample.sharded import compute_fid

            inception_params = load_inception_params(args.inception)
            fid_cfg = config.replace(sample=dataclasses.replace(
                config.sample, n_sample=args.n_samples, batch_size=args.batch))
            fid = compute_fid(fid_cfg, model, params, vae, vae_params,
                              inception_params, args.ref_stats,
                              save_dir=os.path.join(args.out, "fid_samples"))
            log("fid_smoke", True, fid=float(fid), n=args.n_samples,
                note="1k-sample FID runs ~1-2 points above the 50k number")
        else:
            log("fid_smoke", True, skipped="--inception/--ref-stats not given")

    return 1 if failures else 0


def _iter_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def _noise(config, rngs, n):
    import jax.numpy as jnp

    from lfm_tpu.sample.sample import noise_and_labels

    return noise_and_labels(config, rngs, jnp.arange(n))


if __name__ == "__main__":
    sys.exit(main())
