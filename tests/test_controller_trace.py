"""Controller-parity: the jit dopri5 solver must reproduce torchdiffeq's
adaptive stepper decision-for-decision (VERDICT r3 item 2).

The oracle is tests/tdq_ref.py — a float64 NumPy transliteration of
torchdiffeq's published algorithm (the reference integrates with torchdiffeq
at test_flow_latent.py:61-73; FID is NFE-trajectory-dependent, so parity of
the accept/reject sequence and step sizes is what makes the FID claim
transferable). The jit solver runs under jax_enable_x64 here so both sides
compute the controller in float64; production TPU sampling uses the same
algorithm in f32 (f64 is soft on TPU).

Each field asserts:
  * identical attempted-step count and accept/reject sequence,
  * per-attempt t/dt/error-ratio equal to ~1e-9 relative,
  * identical NFE,
  * interpolated endpoint equal to ~1e-10.
"""

import jax
import numpy as np
import pytest

from tests import tdq_ref

# -- test fields: (name, numpy f(t, y) -> dy/dt, y0, t0, t1) ---------------

_RNG = np.random.default_rng(7)
_Y0 = _RNG.normal(size=(6,))
_A = np.array([[-0.5, 1.2], [-1.2, -0.5]])
_MU, _SIG = 1.5, 0.5


def _linear(t, y):
    return (y.reshape(-1, 2) @ _A.T).reshape(y.shape)


def _decay_forced(t, y):
    # moderately stiff: fast relaxation toward a moving target => rejections
    return -24.0 * (y - np.sin(6.0 * t)) + 6.0 * np.cos(6.0 * t)


def _gauss_flow(t, y):
    # closed-form flow-matching velocity for a Gaussian target (the
    # verify-skill field): the shape every sampling run integrates
    a, b = 1.0 - t, t
    var = a * a * _SIG * _SIG + b * b
    m0 = _MU + (a * _SIG * _SIG) * (y - a * _MU) / var
    m1 = b * (y - a * _MU) / var
    return m1 - m0


def _poly(t, y):
    # velocity with strong time dependence, no y dependence: exercises the
    # initial-step heuristic's d2 branch
    return np.stack([3 * t * t * np.ones_like(y[..., 0]),
                     np.cos(8.0 * t) * np.ones_like(y[..., 0])], axis=-1)


FIELDS = [
    ("linear", _linear, _Y0, 1.0, 0.0),
    ("decay_forced", _decay_forced, _Y0, 0.0, 1.0),
    ("gauss_flow", _gauss_flow, _Y0, 1.0, 0.0),
    ("poly", _poly, _RNG.normal(size=(4, 2)), 1.0, 0.0),
]


@pytest.mark.parametrize("name,f,y0,t0,t1", FIELDS, ids=[f[0] for f in FIELDS])
def test_controller_trace_matches_torchdiffeq(name, f, y0, t0, t1):
    rtol = atol = 1e-5
    ref_y, ref_nfe, ref_steps, ref_rej, ref_trace = tdq_ref.odeint_dopri5(
        f, y0, t0, t1, rtol=rtol, atol=atol)
    assert ref_steps >= 3, "field too easy to exercise the controller"

    with jax.enable_x64(True):
        from lfm_tpu.ode.solvers import _odeint_adaptive

        def jf(t, y):
            return jax.pure_callback(
                lambda tt, yy: f(np.float64(tt), np.asarray(yy, np.float64)),
                jax.ShapeDtypeStruct(y.shape, y.dtype), t, y)

        # pure_callback keeps the FIELD bit-identical on both sides so any
        # difference is the controller's. jit(record_trace) returns fixed
        # max_steps-length arrays; rows past the last attempt are zero.
        res, trace = _odeint_adaptive(
            jf, jax.numpy.asarray(y0, jax.numpy.float64), t0, t1, "dopri5",
            rtol, atol, max_steps=512, record_trace=True)
        ts, dts, accs, ratios = (np.asarray(a) for a in trace)

    n_att = int(res.num_steps) + int(res.num_rejected)
    assert n_att == len(ref_trace), (
        f"{name}: attempted steps {n_att} != oracle {len(ref_trace)}")
    assert int(res.num_steps) == ref_steps
    assert int(res.num_rejected) == ref_rej
    assert float(res.nfe) == ref_nfe

    ref_t = np.array([r[0] for r in ref_trace])
    ref_dt = np.array([r[1] for r in ref_trace])
    ref_acc = np.array([r[2] for r in ref_trace])
    ref_ratio = np.array([r[3] for r in ref_trace])
    np.testing.assert_array_equal(accs[:n_att], ref_acc,
                                  err_msg=f"{name}: accept/reject sequence")
    np.testing.assert_allclose(ts[:n_att], ref_t, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dts[:n_att], ref_dt, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ratios[:n_att], ref_ratio, rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.y), ref_y, rtol=1e-9,
                               atol=1e-10, err_msg=f"{name}: endpoint")


def test_rejections_exercised():
    """The suite must include at least one field with rejected steps, or the
    reject branch of the controller is untested."""
    _, _, _, rej, _ = tdq_ref.odeint_dopri5(_decay_forced, _Y0, 0.0, 1.0)
    assert rej >= 1


def test_interp_midpoint_accuracy():
    """Independent sanity check of DPS_C_MID: the dense-output midpoint of a
    single accepted step of y' = y must match e^{h/2} to O(h^5)."""
    f = lambda t, y: y
    y0 = np.ones(1)
    for h in (0.1, 0.05):
        ks = [f(0.0, y0)]
        for i in range(1, 7):
            yi = y0 + h * sum(a * k for a, k in zip(tdq_ref._A[i], ks))
            ks.append(f(tdq_ref._C[i] * h, yi))
        ks = np.asarray(ks)
        y_mid = y0 + h * np.tensordot(tdq_ref._C_MID, ks, axes=(0, 0))
        err = abs(float(y_mid[0]) - np.exp(h / 2))
        assert err < 2.0 * h ** 5, (h, err)
