"""Tests for tools/evidence_common.py — the shared sample-statistics
evidence protocol behind the published eval_noise and int8 numbers
(docs/DESIGN.md). The two evidence scripts must stay protocol-identical;
these tests pin the host-side pieces: the batch/keying schedule of
``collect``, the eps-regularized ``stats``, and the per-batch NFE report
(the bug the round-5 review fixed: a scalar NFE described only the LAST
batch).

Mirrors the reference's evidence path shape: sampling
test_flow_latent.py:42-76, statistics pytorch_fid/fid_score.py:114-174.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))

from tools import evidence_common as ec


def test_collect_batching_and_keying():
    """n samples arrive in BS-sized batches keyed PRNGKey(1000+i) — the
    schedule both evidence scripts share. A fake sampler records the noise
    it saw; the recorded batches must reproduce the protocol keys exactly
    and the activation rows must concatenate in order."""
    seen = []

    def fake(noise, p, vp, ip):
        seen.append(np.asarray(noise))
        # row value encodes the batch start so ordering is checkable
        base = float(np.asarray(noise).sum())
        return jnp.full((noise.shape[0], 4), base), jnp.float32(len(seen))

    n = 2 * ec.BS
    acts, nfes = collect_quiet(fake, n)
    assert acts.shape == (n, 4)
    assert len(seen) == 2 and len(nfes) == 2
    for j, i in enumerate(range(0, n, ec.BS)):
        want = np.asarray(jax.random.normal(jax.random.PRNGKey(1000 + i),
                                            (ec.BS, 32, 32, 4)))
        np.testing.assert_array_equal(seen[j], want)
    # first BS rows come from batch 0, next BS from batch 1
    assert (acts[:ec.BS] == acts[0, 0]).all()
    assert (acts[ec.BS:] == acts[ec.BS, 0]).all()
    assert acts[0, 0] != acts[ec.BS, 0]


def test_collect_nfe_is_per_batch():
    """Adaptive solvers may step differently per noise batch; collect must
    return EVERY batch's NFE, not the last one (the pre-review bug made the
    published 224->165 a last-batch number)."""
    calls = iter([11.0, 22.0, 33.0])

    def fake(noise, p, vp, ip):
        return jnp.zeros((noise.shape[0], 2)), jnp.float32(next(calls))

    _, nfes = collect_quiet(fake, 3 * ec.BS)
    assert nfes == [11.0, 22.0, 33.0]
    s = ec.nfe_summary(nfes)
    assert s == {"mean": 22.0, "min": 11, "max": 33}


def test_collect_truncates_to_n():
    """A non-multiple n still yields exactly n rows (the final batch is
    over-generated at BS and truncated)."""
    def fake(noise, p, vp, ip):
        return jnp.arange(noise.shape[0] * 2, dtype=jnp.float32
                          ).reshape(noise.shape[0], 2), jnp.float32(1.0)

    n = ec.BS + 3
    acts, nfes = collect_quiet(fake, n)
    assert acts.shape == (n, 2)
    assert len(nfes) == 2  # two batches ran


def test_stats_eps_regularized():
    """stats() must return a full-rank covariance even for rank-deficient
    inputs (few samples, high dim) so scipy's sqrtm stays off its
    singular-matrix path — the dryrun applies the same policy."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 32))  # rank <= 3 covariance
    mu, s = ec.stats(a)
    np.testing.assert_allclose(mu, a.mean(axis=0))
    # eps on the diagonal makes it positive definite
    w = np.linalg.eigvalsh(s)
    assert w.min() > 0
    np.testing.assert_allclose(s - 1e-6 * np.eye(32),
                               np.cov(a, rowvar=False), atol=1e-12)


def test_relrms():
    b = np.ones(8)
    assert ec.relrms(b, b) == 0.0
    assert ec.relrms(b * 1.1, b) == pytest.approx(0.1, rel=1e-6)
    # zero denominator guarded
    assert np.isfinite(ec.relrms(b, np.zeros(8)))


def test_protocol_constants_pinned():
    """The published numbers are only comparable while the protocol holds:
    sigma matches the bench stage_dopri5 calibration and the batch size is
    the bench's evidence batch."""
    assert ec.SIGMA == 0.03
    assert ec.BS == 16


def collect_quiet(fn, n):
    """collect() with params the fakes ignore."""
    return ec.collect(fn, n, None, None, None, tag="test", name="fake")
