"""Inception Score (reference pytorch_fid/inception_score.py).

IS = exp(E_x KL(p(y|x) || p(y))) over class posteriors. The reference uses a
TF-hub classifier (inception_score.py:42-63); here the logits come from the
same converted inception-2015-12-05 checkpoint (eval/inception.py with
``include_head=True`` — the 1008-way TF head), so no extra weights or TF
runtime are needed.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score_from_probs(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """probs: (N, K) softmax class posteriors."""
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def get_inception_score(images: Iterable[np.ndarray], inception_params,
                        splits: int = 10, batch_size: int = 50) -> Tuple[float, float]:
    """images: iterable of (B, H, W, 3) arrays in [0, 1]."""
    from lfm_tpu.eval.inception import FIDInceptionV3

    model = FIDInceptionV3(include_head=True)
    fn = jax.jit(lambda p, x: jax.nn.softmax(model.apply(p, x), axis=-1))
    probs = []
    for batch in images:
        probs.append(np.asarray(fn(inception_params, jnp.asarray(batch))))
    return inception_score_from_probs(np.concatenate(probs, axis=0), splits)
