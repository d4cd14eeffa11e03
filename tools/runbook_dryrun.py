"""Full-scale runbook dry-run (VERDICT r2 item 5) — ONE command.

Synthesizes a released-checkpoint-shaped torch state dict at FULL scale
(e.g. DiT-L/2 for celeb256_dit: the exact tensor names/shapes of the real
``model_475.pth``, produced by instantiating the reference's own torch model
and randomizing its zero-init tensors) plus a full-scale diffusers-layout
SD-VAE state dict, then drives ``tools/verify_released_checkpoint.py``
end-to-end: convert -> golden-manifest check -> activation parity vs the
reference torch model on CPU -> jitted euler sample + VAE decode of a
4-image grid (on whatever backend JAX selects — the TPU chip under the
default environment).

When the real released checkpoint is downloaded, the SAME pipeline runs by
swapping ``--ckpt`` (and ``--vae`` for the real sd-vae-ft-mse weights); this
dry-run proves every stage of that runbook executes green at full scale.

Usage:
  python tools/runbook_dryrun.py                     # celeb256_dit, 4 samples
  python tools/runbook_dryrun.py --preset celeb256_adm --steps 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)


def synthesize_model_ckpt(config, reference: str, out_path: str, seed: int = 0):
    """Exact released-checkpoint tensor names/shapes: instantiate the
    reference torch model, randomize its zero-init tensors (adaLN/out
    convs), keep the native init everywhere else so activations stay in a
    numerically meaningful range for the parity stage."""
    import torch

    from verify_released_checkpoint import build_reference_model

    torch.manual_seed(seed)
    ref = build_reference_model(config, reference)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.ndim and torch.count_nonzero(v) == 0:
            sd[k] = torch.randn_like(v) * 0.02
    torch.save(sd, out_path)
    return len(sd)


def synthesize_vae_ckpt(out_path: str, seed: int = 1):
    """Random full-scale SD-VAE state dict in the diffusers AutoencoderKL
    layout (block_out 128/256/512/512, 2 encoder + 3 decoder resnets per
    block — vae/autoencoder_kl.py mirrors this exactly)."""
    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    ch = (128, 256, 512, 512)
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype("float32") * 0.02
        sd[f"{name}.bias"] = np.zeros(o, "float32")

    def gn(name, c):
        sd[f"{name}.weight"] = np.ones(c, "float32")
        sd[f"{name}.bias"] = np.zeros(c, "float32")

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype("float32") * 0.02
        sd[f"{name}.bias"] = np.zeros(o, "float32")

    def resnet(pfx, cin, cout):
        gn(f"{pfx}.norm1", cin)
        conv(f"{pfx}.conv1", cout, cin)
        gn(f"{pfx}.norm2", cout)
        conv(f"{pfx}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pfx}.conv_shortcut", cout, cin, k=1)

    def attn(pfx, c):
        gn(f"{pfx}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{pfx}.{n}", c, c)
        lin(f"{pfx}.to_out.0", c, c)

    conv("encoder.conv_in", ch[0], 3)
    prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        prev = c
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    attn("encoder.mid_block.attentions.0", ch[-1])
    gn("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 8, ch[-1])
    lin("quant_conv", 8, 8)
    lin("post_quant_conv", 4, 4)
    conv("decoder.conv_in", ch[-1], 4)
    resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    attn("decoder.mid_block.attentions.0", ch[-1])
    rev = ch[::-1]
    prev = rev[0]
    for i, c in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        prev = c
    gn("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", 3, rev[-1])

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               out_path)
    return len(sd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default=None)
    ap.add_argument("--argfile", default=None)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=None, help="work dir (default: temp)")
    ap.add_argument("--steps", type=int, default=8,
                    help="euler steps for the sample stage")
    ap.add_argument("--no-vae", action="store_true",
                    help="skip VAE synthesis (latent-only smoke)")
    ap.add_argument("--parity-tol", type=float, default=5e-3)
    args = ap.parse_args(argv)

    if not args.preset and not args.argfile:
        args.argfile = os.path.join(REPO, "test_args", "celeb256_dit.txt")

    import dataclasses

    from lfm_tpu.core.config import get_preset, load_argfile

    config = load_argfile(args.argfile) if args.argfile else get_preset(args.preset)
    name = (os.path.splitext(os.path.basename(args.argfile))[0]
            if args.argfile else args.preset)
    workdir = args.out or tempfile.mkdtemp(prefix=f"runbook_{name}_")
    os.makedirs(workdir, exist_ok=True)

    epoch = config.sample.epoch_id or 0
    ckpt = os.path.join(workdir, f"model_{epoch}.pth")
    n = synthesize_model_ckpt(config, args.reference, ckpt)
    print(json.dumps({"stage": "synthesize_model", "ok": True,
                      "tensors": n, "path": ckpt}), flush=True)

    vae_path = None
    if not args.no_vae:
        vae_path = os.path.join(workdir, "sd-vae-synth.pth")
        n = synthesize_vae_ckpt(vae_path)
        print(json.dumps({"stage": "synthesize_vae", "ok": True,
                          "tensors": n, "path": vae_path}), flush=True)

    from verify_released_checkpoint import main as verify_main

    verify_args = ["--ckpt", ckpt, "--reference", args.reference,
                   "--out", os.path.join(workdir, "out"),
                   "--parity-tol", str(args.parity_tol)]
    if args.argfile:
        # write an override argfile with few-step euler for the smoke
        # few-step euler keeps the on-chip sample stage fast; the
        # real-checkpoint run drops this override to use the argfile's dopri5
        base = open(args.argfile).read()
        fast = os.path.join(workdir, f"{name}.txt")
        lines = [ln for ln in base.splitlines()
                 if not ln.startswith(("METHOD", "STEPS"))]
        lines += ["METHOD=euler", f"STEPS={args.steps}"]
        open(fast, "w").write("\n".join(lines) + "\n")
        verify_args += ["--argfile", fast]
        manifest = os.path.join(TOOLS, "manifests", f"{name}.json")
        if os.path.exists(manifest):  # released argfiles have committed goldens
            verify_args += ["--manifest", manifest]
    else:
        verify_args += ["--preset", args.preset]
    if vae_path:
        verify_args += ["--vae", vae_path]

    rc = verify_main(verify_args)
    print(json.dumps({"stage": "runbook", "ok": rc == 0, "workdir": workdir}),
          flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
