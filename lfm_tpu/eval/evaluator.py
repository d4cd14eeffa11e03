"""Inpainting evaluator (reference datasets_prep/inpaint_preprocess/evaluator.py:16-238).

Scores (real, fake, mask) batches with SSIM, LPIPS (when weights are
provided), and FID over inception activations; like the reference's
``InpaintingEvaluator``, results can be grouped into bins by hole area
fraction ("10-20%", ...)."""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lfm_tpu.eval.perceptual import LPIPS, ssim


class InpaintingEvaluator:
    def __init__(self, inception_params=None, lpips_params=None,
                 area_bins: int = 10):
        self.inception_params = inception_params
        self.lpips_params = lpips_params
        self.area_bins = area_bins
        self._ssim_fn = jax.jit(ssim)
        self._lpips = LPIPS()
        self._lpips_fn = jax.jit(lambda p, a, b: self._lpips.apply(p, a, b))
        self._rows: list = []
        self._fake_acts: list = []
        self._real_acts: list = []
        if inception_params is not None:
            from lfm_tpu.eval.fid import ActivationExtractor

            self._extractor = ActivationExtractor(inception_params)
        else:
            self._extractor = None

    def process_batch(self, real01: np.ndarray, fake01: np.ndarray,
                      mask: np.ndarray) -> None:
        """real/fake: (N,H,W,3) in [0,1]; mask: (N,H,W,1), 1 = hole."""
        s = np.asarray(self._ssim_fn(jnp.asarray(fake01), jnp.asarray(real01)))
        area = mask.mean(axis=(1, 2, 3))
        lp = None
        if self.lpips_params is not None:
            lp = np.asarray(self._lpips_fn(self.lpips_params,
                                           jnp.asarray(fake01 * 2 - 1),
                                           jnp.asarray(real01 * 2 - 1)))
        for i in range(len(real01)):
            self._rows.append({
                "ssim": float(s[i]),
                "lpips": float(lp[i]) if lp is not None else None,
                "area": float(area[i]),
            })
        if self._extractor is not None:
            self._fake_acts.append(self._extractor(fake01))
            self._real_acts.append(self._extractor(real01))

    def evaluation_end(self) -> Dict:
        """Aggregate like the reference: overall means + per-area-bin means."""
        out: Dict = {}
        rows = self._rows
        out["ssim"] = float(np.mean([r["ssim"] for r in rows])) if rows else None
        if rows and rows[0]["lpips"] is not None:
            out["lpips"] = float(np.mean([r["lpips"] for r in rows]))
        if self._fake_acts:
            from lfm_tpu.eval.inpainting_metrics import metrics_from_activations

            fid, pids, uids = metrics_from_activations(
                np.concatenate(self._fake_acts), np.concatenate(self._real_acts)
            )
            out.update(fid=fid, pids=pids, uids=uids)
        # per-hole-area bins (evaluator.py groups by mask area)
        bins: Dict[str, list] = {}
        for r in rows:
            b = min(int(r["area"] * self.area_bins), self.area_bins - 1)
            lo, hi = b * 100 // self.area_bins, (b + 1) * 100 // self.area_bins
            bins.setdefault(f"{lo}-{hi}%", []).append(r["ssim"])
        out["ssim_by_area"] = {k: float(np.mean(v)) for k, v in sorted(bins.items())}
        return out
