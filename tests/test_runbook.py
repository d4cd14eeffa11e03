"""Checkpoint-parity runbook tests (VERDICT round-1 #7).

1. The committed golden manifests (tools/manifests/*.json) must match the
   parameter trees the current code builds for every released argfile —
   silent architecture drift fails here.
2. The runbook tool itself runs end-to-end on a synthesized reference DiT
   checkpoint: convert -> manifest -> activation parity against the ACTUAL
   reference torch DiT (running on the functional timm shim) -> latent
   sampling smoke.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
REF = "/root/reference"

sys.path.insert(0, TOOLS)


def test_golden_manifests_match_current_models():
    from param_manifest import MANIFEST_DIR, manifest_for_config
    from lfm_tpu.core.config import load_argfile

    argfiles = sorted(glob.glob(os.path.join(REPO, "test_args", "*.txt")))
    assert len(argfiles) == 11
    for path in argfiles:
        name = os.path.splitext(os.path.basename(path))[0]
        golden_path = os.path.join(MANIFEST_DIR, f"{name}.json")
        assert os.path.exists(golden_path), f"missing golden manifest {name}"
        golden = json.load(open(golden_path))["tree"]
        current = manifest_for_config(load_argfile(path))
        assert current == golden, f"parameter tree drift for {name}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
def test_runbook_end_to_end_on_synthesized_dit(tmp_path):
    import torch

    import timm_shim

    timm_shim.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.DiT import DiT_models

    # a tiny DiT-S/2 "released checkpoint" with randomized zero-init layers
    torch.manual_seed(0)
    ref = DiT_models["DiT-S/2"](img_resolution=8, in_channels=4,
                                num_classes=1, label_dropout=0.0)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.ndim and float(v.abs().max()) == 0.0:
            sd[k] = torch.randn_like(v) * 0.05
    ref.load_state_dict(sd)
    ckpt = tmp_path / "model_9.pth"
    torch.save(sd, str(ckpt))

    argfile = tmp_path / "tiny_dit.txt"
    argfile.write_text(
        'MODEL_TYPE="DiT-S/2"\nDATASET="celeba_256"\nIMG_SIZE=64\n'
        'METHOD="dopri5"\nSTEPS=0\nEPOCH_ID=9\n')

    # golden manifest for this config
    from param_manifest import manifest_for_config
    from lfm_tpu.core.config import load_argfile

    cfg = load_argfile(str(argfile))
    manifest = {"argfile": "tiny_dit.txt", "tree": manifest_for_config(cfg)}
    mpath = tmp_path / "tiny_dit_manifest.json"
    mpath.write_text(json.dumps(manifest))

    from verify_released_checkpoint import main

    rc = main([
        "--argfile", str(argfile), "--ckpt", str(ckpt),
        "--manifest", str(mpath), "--reference", REF,
        "--out", str(tmp_path / "out"), "--parity-tol", "1e-4",
    ])
    assert rc == 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
def test_runbook_flags_manifest_and_parity_failures(tmp_path):
    """A checkpoint whose weights were tampered with after conversion-time
    must FAIL parity (guards against a vacuously-green runbook)."""
    import torch

    import timm_shim

    timm_shim.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.DiT import DiT_models

    torch.manual_seed(1)
    ref = DiT_models["DiT-S/2"](img_resolution=8, in_channels=4,
                                num_classes=1, label_dropout=0.0)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.ndim and float(v.abs().max()) == 0.0:
            sd[k] = torch.randn_like(v) * 0.05
    ckpt = tmp_path / "model_1.pth"
    torch.save(sd, str(ckpt))

    argfile = tmp_path / "tiny.txt"
    argfile.write_text('MODEL_TYPE="DiT-S/2"\nDATASET="celeba_256"\nIMG_SIZE=64\n')

    # tampered manifest: an extra required tensor that conversion won't have
    from param_manifest import manifest_for_config
    from lfm_tpu.core.config import load_argfile

    tree = manifest_for_config(load_argfile(str(argfile)))
    tree["params/phantom_layer/kernel"] = [[3, 3], "float32"]
    mpath = tmp_path / "m.json"
    mpath.write_text(json.dumps({"tree": tree}))

    from verify_released_checkpoint import main

    rc = main([
        "--argfile", str(argfile), "--ckpt", str(ckpt),
        "--manifest", str(mpath), "--reference", REF,
        "--out", str(tmp_path / "out"),
    ])
    assert rc != 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
def test_runbook_dryrun_tool_tiny(tmp_path):
    """tools/runbook_dryrun.py end-to-end at tiny scale (--no-vae): the same
    synthesize -> convert -> parity -> latent-smoke pipeline that was driven
    at full DiT-L/2 scale; pins the tool's glue (checkpoint synthesis from
    the reference model, argfile override writing, stage sequencing)."""
    import runbook_dryrun

    argfile = tmp_path / "tiny_dryrun.txt"
    argfile.write_text(
        'MODEL_TYPE="DiT-S/2"\nDATASET="celeba_256"\nIMG_SIZE=64\n'
        'METHOD="dopri5"\nSTEPS=0\nEPOCH_ID=7\n')
    rc = runbook_dryrun.main([
        "--argfile", str(argfile), "--no-vae", "--steps", "2",
        "--reference", REF, "--out", str(tmp_path / "work"),
        "--parity-tol", "1e-4",
    ])
    assert rc == 0
    # the synthesized checkpoint carries the argfile's epoch id
    assert (tmp_path / "work" / "model_7.pth").exists()
