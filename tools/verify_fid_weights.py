"""One-command validation of the real FID inception weights (VERDICT r3
item 6; reference pytorch_fid/inception.py:23,70-77 — FID comparability
requires bit-compatibility with ``pt_inception-2015-12-05-6726825d.pth``).

This environment has zero egress, so the weights cannot be fetched here;
the full check protocol lives in tools/manifests/fid_inception.json and this
tool executes it the moment a downloaded copy exists:

    python tools/verify_fid_weights.py /path/to/pt_inception-2015-12-05-6726825d.pth

Steps:
  1. sha256 the file; the first 8 hex chars must equal the pinned prefix
     (torch.hub check_hash convention — the pin is IN the published name).
  2. Convert with lfm_tpu.eval.inception.convert_inception_state_dict.
  3. Run the deterministic probe batches through FIDInceptionV3.
  4. If the manifest already holds fingerprints: compare (abs tol 2e-3) and
     exit non-zero on mismatch. Otherwise: print the fingerprints and, with
     --record, write them into the manifest.

Exit code 0 = every executed check passed.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST = os.path.join(REPO, "tools", "manifests", "fid_inception.json")
TOL = 2e-3


def probe_batches():
    import numpy as np

    rng = np.random.Generator(np.random.Philox(12345))
    p64 = rng.uniform(0.0, 1.0, size=(8, 64, 64, 3)).astype(np.float32)
    p299 = rng.uniform(0.0, 1.0, size=(4, 299, 299, 3)).astype(np.float32)
    return {"probe64": p64, "probe299": p299}


def fingerprint(params, batch):
    import jax
    import numpy as np

    from lfm_tpu.eval.inception import FIDInceptionV3

    model = FIDInceptionV3(include_head=True)
    pool_model = FIDInceptionV3(include_head=False)
    pool3 = np.asarray(jax.jit(pool_model.apply)(params, batch))
    logits = np.asarray(jax.jit(model.apply)(params, batch))

    def sig6(x):
        return [float(f"{v:.6g}") for v in np.asarray(x).reshape(-1)]

    return {
        "pool3_mean": float(f"{pool3.mean():.6g}"),
        "pool3_std": float(f"{pool3.std():.6g}"),
        "pool3_first8": sig6(pool3[0, :8]),
        "logits_first4": sig6(logits[0, :4]),
    }


def compare(expected, actual):
    import numpy as np

    errs = []
    for key, exp in expected.items():
        act = actual[key]
        e = np.max(np.abs(np.asarray(exp, np.float64)
                          - np.asarray(act, np.float64)))
        status = "ok" if e <= TOL else "MISMATCH"
        if e > TOL:
            errs.append(key)
        print(f"  {key}: max|diff|={e:.2e} {status}")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="path to pt_inception-2015-12-05-6726825d.pth")
    ap.add_argument("--record", action="store_true",
                    help="write fingerprints into the manifest")
    args = ap.parse_args()

    with open(MANIFEST) as f:
        manifest = json.load(f)

    h = hashlib.sha256()
    with open(args.ckpt, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    ok = digest.startswith(manifest["sha256_prefix"])
    print(f"sha256 {digest} prefix_ok={ok}")
    if not ok:
        print("FAIL: file hash does not match the published name's pin")
        return 1
    if manifest.get("sha256_full") and manifest["sha256_full"] != digest:
        print("FAIL: full sha256 differs from the recorded one")
        return 1

    from lfm_tpu.eval.inception import load_inception_params

    params = load_inception_params(args.ckpt)
    failures = []
    results = {}
    for name, batch in probe_batches().items():
        fp = fingerprint(params, batch)
        results[name] = fp
        expected = manifest["fingerprints"].get(name)
        print(f"{name}:")
        if expected is None:
            for k, v in fp.items():
                print(f"  {k}: {v}")
        else:
            failures += [f"{name}.{k}" for k in compare(expected, fp)]

    if args.record:
        manifest["sha256_full"] = digest
        manifest["fingerprints"] = results
        with open(MANIFEST, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"recorded fingerprints -> {MANIFEST}")

    if failures:
        print(f"FAIL: {failures}")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
