"""ODE solver unit tests vs scipy.integrate.solve_ivp (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from lfm_tpu.ode import odeint, karras_sample, karras_sigmas, sample_euler_karras

# A mildly stiff linear system dy/dt = A y with known dynamics.
_A = np.array([[-0.5, 1.2], [-1.2, -0.5]], dtype=np.float64)


def _field(t, y):
    return y @ jnp.asarray(_A, jnp.float32).T


def _scipy_solution(y0, t0=1.0, t1=0.0):
    sol = solve_ivp(
        lambda t, y: (_A @ y.reshape(-1, 2).T).T.reshape(-1),
        (t0, t1),
        np.asarray(y0, np.float64).reshape(-1),
        rtol=1e-9,
        atol=1e-9,
        dense_output=False,
        method="DOP853",
    )
    return sol.y[:, -1].reshape(y0.shape)


@pytest.fixture(scope="module")
def y0():
    return jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)), jnp.float32)


@pytest.mark.parametrize("method", ["dopri5", "bosh3", "adaptive_heun", "dopri8"])
def test_adaptive_matches_scipy(method, y0):
    ref = _scipy_solution(y0)
    res = odeint(_field, y0, 1.0, 0.0, method=method, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.y), ref, rtol=2e-4, atol=2e-5)
    assert float(res.nfe) > 0
    assert int(res.num_steps) > 0


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 2000, 2e-3),
    ("midpoint", 200, 1e-4),
    ("heun", 200, 1e-4),
    ("rk4", 50, 1e-5),
])
def test_fixed_step_matches_scipy(method, steps, tol, y0):
    ref = _scipy_solution(y0)
    res = odeint(_field, y0, 1.0, 0.0, method=method, num_steps=steps)
    np.testing.assert_allclose(np.asarray(res.y), ref, rtol=tol, atol=tol)
    assert float(res.nfe) == steps * {"euler": 1, "midpoint": 2, "heun": 2, "rk4": 4}[method]


def test_adaptive_under_jit(y0):
    fn = jax.jit(lambda y: odeint(_field, y, 1.0, 0.0, method="dopri5").y)
    ref = _scipy_solution(y0)
    np.testing.assert_allclose(np.asarray(fn(y0)), ref, rtol=1e-3, atol=1e-4)


def test_adaptive_tolerance_controls_nfe(y0):
    loose = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-2, atol=1e-2)
    tight = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-8, atol=1e-8)
    assert float(tight.nfe) > float(loose.nfe)


def test_convergence_order_euler():
    """Halving step size should halve euler error (order 1)."""
    y0 = jnp.asarray([[1.0, 0.0]], jnp.float32)
    ref = _scipy_solution(np.asarray(y0))
    e = []
    for steps in (100, 200, 400):
        y = odeint(_field, y0, 1.0, 0.0, method="euler", num_steps=steps).y
        e.append(float(jnp.max(jnp.abs(y - ref))))
    assert 1.7 < e[0] / e[1] < 2.3
    assert 1.7 < e[1] / e[2] < 2.3


def test_karras_euler_equals_fixed_euler():
    """The Karras euler loop over linspace(1, 1e-5) must agree with a plain
    euler integration over the same grid."""
    y0 = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2)), jnp.float32)
    sigmas = karras_sigmas(40)

    def denoiser(x, sigma):
        return _field(sigma, x)

    out = sample_euler_karras(denoiser, y0, sigmas)

    # manual loop
    x = np.asarray(y0, np.float64)
    s = np.asarray(sigmas, np.float64)
    for i in range(len(s) - 1):
        x = x + (x @ _A.T) * (s[i + 1] - s[i])
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-4, atol=1e-5)


def test_karras_heun_more_accurate_than_euler():
    y0 = jnp.asarray(np.random.default_rng(2).normal(size=(2, 2)), jnp.float32)
    ref = _scipy_solution(np.asarray(y0), t0=1.0, t1=1e-5)

    def model_fn(x, sigma):
        return _field(sigma, x)

    eu = karras_sample(model_fn, y0, 20, sampler="euler")
    he = karras_sample(model_fn, y0, 20, sampler="heun")
    err_eu = float(jnp.max(jnp.abs(eu - ref)))
    err_he = float(jnp.max(jnp.abs(he - ref)))
    assert err_he < err_eu


def test_pytree_state():
    y0 = {"a": jnp.ones((2, 2)), "b": jnp.zeros((3,))}

    def f(t, y):
        return {"a": -y["a"], "b": y["b"] * 0.0 + 1.0}

    res = odeint(f, y0, 0.0, 1.0, method="dopri5")
    np.testing.assert_allclose(np.asarray(res.y["a"]), np.exp(-1.0) * np.ones((2, 2)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.y["b"]), np.ones(3), rtol=1e-4)


def test_nfe_counts_dopri5(y0):
    res = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-5, atol=1e-5)
    # 2 initial evals + 6 per attempted step (FSAL)
    expected = 2 + 6 * (int(res.num_steps) + int(res.num_rejected))
    assert float(res.nfe) == expected


def test_dopri5_dense_output_interpolation(y0):
    """dopri5 takes free steps past t1 and interpolates (torchdiffeq
    semantics); the interpolated endpoint must match scipy even when the
    natural step is much larger than the remaining interval."""
    for t1 in (0.9, 0.5, 0.13):
        ref = _scipy_solution(y0, t0=1.0, t1=t1)
        res = odeint(_field, y0, 1.0, t1, method="dopri5", rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.y), ref, rtol=5e-4, atol=5e-5)


def test_dopri5_dense_vs_clamped_nfe(y0):
    """With loose tolerance the field is cheap; dense output should not need
    MORE evals than integration itself (no extra clamped micro-steps)."""
    res = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-3, atol=1e-3)
    assert float(res.nfe) == 2 + 6 * (int(res.num_steps) + int(res.num_rejected))


def test_heun_karras_correction_guard_matches_reference():
    """The reference applies the 2nd-order correction only while
    ``i < steps - 1`` with steps stuck at its DEFAULT 40
    (karras_sample.py:32-35 never forwards the schedule length). For a
    45-sigma schedule the last 5 steps must be plain Euler — compare
    against a straight-line numpy replica of the reference loop."""
    from lfm_tpu.ode import karras_sigmas
    from lfm_tpu.ode.solvers import sample_heun_karras

    def v(x, s):
        return -x + 0.3 * s  # simple affine field

    n_sig = 45
    sigmas = np.asarray(karras_sigmas(n_sig))
    x0 = np.linspace(-1.0, 1.0, 8).astype(np.float32)

    # numpy replica of reference sample_heun (karras_sample.py:121-161),
    # steps=40 default, no churn
    x = x0.copy()
    for i, (t_cur, t_next) in enumerate(zip(sigmas[:-1], sigmas[1:])):
        d_cur = v(x, t_cur)
        x_next = x + (t_next - t_cur) * d_cur
        if i < 40 - 1:
            d_prime = v(x_next, t_next)
            x_next = x + (t_next - t_cur) * (0.5 * d_cur + 0.5 * d_prime)
        x = x_next

    got = np.asarray(sample_heun_karras(
        lambda xx, ss: v(xx, ss), jnp.asarray(x0), jnp.asarray(sigmas)))
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-6)

    # and the <=40-sigma case still corrects on every step
    sig40 = np.asarray(karras_sigmas(40))
    x = x0.copy()
    for t_cur, t_next in zip(sig40[:-1], sig40[1:]):
        d_cur = v(x, t_cur)
        x_next = x + (t_next - t_cur) * d_cur
        d_prime = v(x_next, t_next)
        x = x + (t_next - t_cur) * (0.5 * d_cur + 0.5 * d_prime)
    got40 = np.asarray(sample_heun_karras(
        lambda xx, ss: v(xx, ss), jnp.asarray(x0), jnp.asarray(sig40)))
    np.testing.assert_allclose(got40, x, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method,eval_noise", [
    ("dopri8", 2.0 ** -9), ("dopri8", "auto"),
    ("dopri5", 2.0 ** -9), ("dopri5", "auto"),
])
def test_eval_noise_floor_rescues_noisy_fields(method, eval_noise):
    """A bf16-rounded velocity makes high-order error estimates
    noise-dominated: dopri8 at tol 1e-5 thrashes (hits max_steps). With
    eval_noise=2^-9 the controller subtracts the noise floor and converges
    with a sane NFE while staying accurate to the noise-limited level
    (VERDICT round-1 #4)."""
    y0 = jnp.linspace(0.5, 2.0, 64)

    def noisy_field(t, y):
        # simulate a bf16 model: exact field, output rounded to bf16
        return (-y).astype(jnp.bfloat16).astype(jnp.float32)

    exact = np.asarray(y0) * np.exp(-1.0)

    res_filtered = odeint(noisy_field, y0, 0.0, 1.0, method=method,
                          rtol=1e-5, atol=1e-5, eval_noise=eval_noise,
                          max_steps=2000)
    # noise-limited accuracy: bf16 rounding (eps 2^-8) bounds what ANY
    # solver can extract from this field — accept O(eps) deviation
    np.testing.assert_allclose(np.asarray(res_filtered.y), exact,
                               rtol=2e-2, atol=5e-3)

    res_raw = odeint(noisy_field, y0, 0.0, 1.0, method=method,
                     rtol=1e-5, atol=1e-5, max_steps=2000)
    if method == "dopri8":
        # raw dopri8 chases the noise floor; filtered must be dramatically
        # cheaper (measured on hardware: ~13k vs ~200 on a DiT field)
        assert float(res_filtered.nfe) < float(res_raw.nfe) / 4
        assert float(res_filtered.nfe) < 600
    else:
        assert float(res_filtered.nfe) <= float(res_raw.nfe)
        assert float(res_filtered.nfe) < 400


def test_eval_noise_zero_is_exact_torchdiffeq_behavior(y0):
    a = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-5, atol=1e-5)
    b = odeint(_field, y0, 1.0, 0.0, method="dopri5", rtol=1e-5, atol=1e-5,
               eval_noise=0.0)
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
    assert float(a.nfe) == float(b.nfe)


def test_resolve_eval_noise_policy():
    """Default noise-floor policy: auto ONLY for bf16 dopri8 (the measured
    blow-up case); dopri5 keeps exact torchdiffeq step control for NFE/FID
    parity; SampleConfig.eval_noise overrides either way."""
    import jax.numpy as jnp
    from lfm_tpu.core.config import SampleConfig
    from lfm_tpu.nn.dit import DiT
    from lfm_tpu.sample.sample import resolve_eval_noise

    bf16 = DiT(dtype=jnp.bfloat16)
    f32 = DiT()
    assert resolve_eval_noise(SampleConfig(method="dopri8"), bf16) == "auto"
    assert resolve_eval_noise(SampleConfig(method="dopri5"), bf16) == 0.0
    assert resolve_eval_noise(SampleConfig(method="dopri8"), f32) == 0.0
    assert resolve_eval_noise(
        SampleConfig(method="dopri5", eval_noise="auto"), bf16) == "auto"
    assert resolve_eval_noise(
        SampleConfig(method="dopri8", eval_noise=0.0), bf16) == 0.0


@pytest.mark.parametrize("method", ["dopri5", "bosh3", "adaptive_heun", "dopri8"])
def test_rolled_single_step_bitwise_matches_unrolled(method, y0):
    """ONE jitted RK step of the rolled stage loop (_rk_step_rolled: one
    traced velocity eval per step, ~6x smaller lowered program) must be
    bitwise identical to the Python-unrolled _rk_step — y1, f1, and the
    embedded error. The rolled combination accumulates over a zero-padded
    tableau row in the same left-to-right order, and + (dt*0)*k is an
    exact +0.0, so every intermediate float matches _combine's skip-zeros
    sum. (Whole-INTEGRATION bitwise parity is not a well-defined contract
    between two different XLA programs — see the next test.)"""
    from lfm_tpu.ode.solvers import _get_tableau, _rk_step, _rk_step_rolled

    tab = _get_tableau(method)
    t, dt = jnp.float32(0.9), jnp.float32(-0.07)
    f0 = _field(t, y0)
    a = jax.jit(lambda t, dt, y, f: _rk_step(_field, tab, t, dt, y, f)[:3])(
        t, dt, y0, f0)
    b = jax.jit(
        lambda t, dt, y, f: _rk_step_rolled(_field, tab, t, dt, y, f)[:3])(
        t, dt, y0, f0)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("method", ["dopri5", "bosh3", "adaptive_heun", "dopri8"])
def test_rolled_integration_matches_unrolled(method, y0):
    """Full integrations with the rolled vs unrolled stage loop must agree
    at the decision level (NFE, accept/reject counts) with an ulp-bounded
    endpoint difference. Exact whole-trajectory bitwise equality is NOT
    guaranteed: the two lowerings are different XLA programs, and XLA is
    free to FMA-contract/fuse the error-norm reduction differently per
    fusion context (observed: a 1-ulp error-ratio difference for
    adaptive_heun under the test mesh config, compounding to ~5e-7 on the
    endpoint over ~250 steps while every controller decision still
    matched). The per-step MATH is pinned bitwise by the previous test."""
    kw = dict(method=method, rtol=1e-5, atol=1e-5)
    a = odeint(_field, y0, 1.0, 0.0, unroll_stages=False, **kw)
    b = odeint(_field, y0, 1.0, 0.0, unroll_stages=True, **kw)
    assert float(a.nfe) == float(b.nfe)
    assert int(a.num_steps) == int(b.num_steps)
    assert int(a.num_rejected) == int(b.num_rejected)
    np.testing.assert_allclose(
        np.asarray(a.y), np.asarray(b.y), rtol=1e-5, atol=1e-6)


def test_rolled_trace_matches_unrolled():
    """Per-attempt controller decisions (t, dt, accept, ratio) must match
    between the rolled and unrolled stage loops — accept bitwise, the
    float fields to a few-ulp tolerance (same FMA-contraction caveat as
    above) — with the noise floor engaged and under jit. The
    authoritative decision-for-decision parity is against the float64
    torchdiffeq oracle (tests/test_controller_trace.py), which runs the
    rolled default."""
    from lfm_tpu.ode.solvers import _odeint_adaptive

    y0 = jnp.asarray(
        np.random.default_rng(3).normal(size=(3, 2)), jnp.float32)

    def run(unroll):
        return jax.jit(
            lambda y: _odeint_adaptive(
                _field, y, 1.0, 0.0, "dopri5", 1e-5, 1e-5, max_steps=256,
                eval_noise=1e-4, record_trace=True, unroll_stages=unroll)
        )(y0)

    (res_a, tr_a), (res_b, tr_b) = run(False), run(True)
    assert float(res_a.nfe) == float(res_b.nfe)
    assert int(res_a.num_steps) == int(res_b.num_steps)
    assert int(res_a.num_rejected) == int(res_b.num_rejected)
    np.testing.assert_allclose(
        np.asarray(res_a.y), np.asarray(res_b.y), rtol=1e-5, atol=1e-6)
    t_a, dt_a, acc_a, ratio_a = (np.asarray(x) for x in tr_a)
    t_b, dt_b, acc_b, ratio_b = (np.asarray(x) for x in tr_b)
    np.testing.assert_array_equal(acc_a, acc_b)
    np.testing.assert_allclose(t_a, t_b, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(dt_a, dt_b, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        ratio_a[np.isfinite(ratio_a)], ratio_b[np.isfinite(ratio_b)],
        rtol=1e-5, atol=1e-6)


def test_rolled_matches_unrolled_pytree_x64():
    """Same bitwise parity on a pytree state with the f64 controller (the
    configuration the torchdiffeq-oracle tests run under)."""
    with jax.enable_x64(True):
        y0 = {"a": jnp.asarray(np.random.default_rng(5).normal(size=(3, 2)),
                               jnp.float64),
              "b": jnp.asarray(np.random.default_rng(6).normal(size=(4,)),
                               jnp.float64)}

        def field(t, y):
            return {"a": y["a"] @ jnp.asarray(_A).T,
                    "b": -0.7 * y["b"] + jnp.sin(3.0 * t)}

        a = odeint(field, y0, 1.0, 0.0, method="dopri5", rtol=1e-7,
                   atol=1e-7, unroll_stages=False)
        b = odeint(field, y0, 1.0, 0.0, method="dopri5", rtol=1e-7,
                   atol=1e-7, unroll_stages=True)
        for k in y0:
            np.testing.assert_array_equal(np.asarray(a.y[k]),
                                          np.asarray(b.y[k]))
        assert float(a.nfe) == float(b.nfe)
