"""jit-compiled ODE solvers for flow-matching sampling.

TPU-native replacement for the reference's host-looped `torchdiffeq`
integration (reference test_flow_latent.py:61-73, train_flow_latent.py:41-44)
and the Karras fixed-step loops (reference sampler/karras_sample.py:85-161).

Design:
  * fixed-step solvers (euler / midpoint / heun / rk4) run as a single
    ``lax.scan`` over the time grid — one XLA program, zero host round-trips;
  * adaptive solvers (dopri5 / bosh3 / adaptive_heun / dopri8) run as a
    ``lax.while_loop`` with the Hairer initial-step heuristic and step-size
    controller matching torchdiffeq's accept/reject policy
    (safety=0.9, ifactor=10, dfactor=0.2, RMS error norm,
    tol = atol + rtol*max(|y0|,|y1|));
  * NFE is a carried counter (replaces the reference's ``NFECount`` module
    wrapper, test_flow_latent.py:31-39).

The velocity field is evaluated under whatever dtype policy the caller's
model uses (bf16 matmuls on TPU); controller arithmetic runs in
``solver_dtype`` (f32 by default; f64 when ``jax.config.jax_enable_x64``).

State may be any pytree; error norms reduce over all leaves.

bf16 velocity networks: raw high-order error estimates are dominated by the
model's relative evaluation noise (measured ~3.5e-3 local roughness on a
bf16 DiT-L/2; dopri8 at tol 1e-5 used to thrash to NFE ~4k-13k where dopri5
needs ~80-200). ``eval_noise`` enables a noise floor on the error estimate:
the per-element noise std of the embedded error
(|dt| * eval_noise * sqrt(sum_i b_err_i^2 k_i^2), independent rounding per
stage — the correlated component cancels exactly because sum_i b_err_i == 0)
is subtracted from the measured error ratio in quadrature, recovering the
truncation component the controller should act on. ``eval_noise="auto"``
calibrates the level with one extra probe evaluation at t0 (displace y0 by
1e-4 relative — quantization decorrelates, the true field barely moves —
and read the rms difference). The sampling layer passes "auto" for bf16
models (sample/sample.py); 0.0 (default) reproduces exact torchdiffeq
behavior. Measured on the TPU chip (perturbed bf16 DiT-L/2, tol 1e-5):
dopri8 NFE 4070 raw -> 422 with auto noise-flooring, at relRMS 7.8e-3 from
the f32 ground truth (the bf16 dopri5 floor itself is 5.4e-3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ADAPTIVE_SOLVERS = ("dopri5", "dopri8", "adaptive_heun", "bosh3")
FIXED_SOLVERS = ("euler", "midpoint", "rk4", "heun")

Velocity = Callable[[jnp.ndarray, Any], Any]  # f(t, y) -> dy/dt


class ODEResult(NamedTuple):
    y: Any
    nfe: jnp.ndarray  # number of function evaluations (float for averaging)
    num_steps: jnp.ndarray
    num_rejected: jnp.ndarray


# ---------------------------------------------------------------------------
# pytree arithmetic helpers
# ---------------------------------------------------------------------------

def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _acc():
    """Accumulation/controller dtype: f32 by default, f64 when the caller
    enabled jax_enable_x64 (the reference passes options={'dtype': float64}
    to torchdiffeq for adaptive solving, test_flow_latent.py:44-46; on TPU
    f64 is soft so production sampling stays f32, but CPU parity tests pin
    the controller against the float64 reference trace)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _axpy(a, x, y):  # y + a*x, a scalar
    return _tmap(lambda xi, yi: yi + a * xi.astype(yi.dtype), x, y)


def _combine(y0, ks, coeffs, dt):
    """y0 + dt * sum_i coeffs[i] * ks[i] over pytrees."""
    acc_t = _acc()

    def leafsum(y0_leaf, *k_leaves):
        acc = y0_leaf.astype(acc_t)
        for c, k in zip(coeffs, k_leaves):
            if c != 0.0:
                acc = acc + (dt * c) * k.astype(acc_t)
        return acc.astype(y0_leaf.dtype)
    return _tmap(leafsum, y0, *ks)


def _rms_norm(tree) -> jnp.ndarray:
    acc_t = _acc()
    leaves = jax.tree_util.tree_leaves(tree)
    sq = sum(jnp.sum(jnp.square(l.astype(acc_t))) for l in leaves)
    n = sum(l.size for l in leaves)
    return jnp.sqrt(sq / n)


def _error_ratio(err, y0, y1, rtol, atol) -> jnp.ndarray:
    """RMS of err / (atol + rtol*max(|y0|,|y1|)) — torchdiffeq's error norm."""
    acc_t = _acc()

    def leaf(e, a, b):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)).astype(acc_t)
        return jnp.square(e.astype(acc_t) / tol)
    sq_tree = _tmap(leaf, err, y0, y1)
    leaves = jax.tree_util.tree_leaves(sq_tree)
    total = sum(jnp.sum(l) for l in leaves)
    n = sum(l.size for l in leaves)
    return jnp.sqrt(total / n)


# ---------------------------------------------------------------------------
# Butcher tableaus (classical, public-domain coefficients)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Tableau:
    order: int           # order used in the step-size exponent (torchdiffeq: solver order)
    c: tuple             # nodes
    a: tuple             # tuple of tuples, row i gives k_i combination
    b: tuple             # solution weights
    b_err: tuple         # (b - b_hat): error-estimate weights
    fsal: bool = False   # first-same-as-last
    c_mid: tuple = ()    # midpoint weights for the quartic dense-output fit


DOPRI5 = Tableau(
    order=5,
    c=(0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    a=(
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    b=(35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    b_err=(
        35 / 384 - 1951 / 21600, 0.0, 500 / 1113 - 22642 / 50085,
        125 / 192 - 451 / 720, -2187 / 6784 + 12231 / 42400,
        11 / 84 - 649 / 6300, -1 / 60,
    ),
    fsal=True,
    # torchdiffeq's DPS_C_MID (dopri5.py): y(t0 + dt/2) ~= y0 + dt * c_mid.k,
    # feeding the quartic dense-output fit used to evaluate off-grid times
    c_mid=(
        6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
        -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
        -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
    ),
)

BOSH3 = Tableau(
    order=3,
    c=(0.0, 1 / 2, 3 / 4, 1.0),
    a=((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    b=(2 / 9, 1 / 3, 4 / 9, 0.0),
    b_err=(2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8),
    fsal=True,
)

ADAPTIVE_HEUN = Tableau(
    order=2,
    c=(0.0, 1.0),
    a=((), (1.0,)),
    b=(1 / 2, 1 / 2),
    b_err=(1 / 2, -1 / 2),
    fsal=False,
)


def _dop853_tableau() -> Tableau:
    """8th-order adaptive tableau. The reference exposes ``dopri8``
    (test_flow_latent.py:27); we use Hairer's DOP853 coefficients (via
    scipy's published tables) with its 5th-order error estimate — an
    equivalent-order adaptive RK8 integrator."""
    from scipy.integrate._ivp import dop853_coefficients as dc

    ns = dc.N_STAGES  # 12
    A, B, C = dc.A[:ns, :ns], dc.B, dc.C[:ns]
    E5 = dc.E5  # length ns+1; weight for the (virtual) k_{ns+1} uses f(t+h, y1)
    a_rows = tuple(tuple(float(x) for x in A[i, :i]) for i in range(ns))
    # append a final stage equal to the FSAL evaluation to host the E5[-1] term
    a_rows = a_rows + (tuple(float(x) for x in B),)
    b = tuple(float(x) for x in B) + (0.0,)
    b_err = tuple(float(x) for x in E5)
    c = tuple(float(x) for x in C) + (1.0,)
    return Tableau(order=8, c=c, a=a_rows, b=b, b_err=b_err, fsal=True)


_TABLEAUS = {
    "dopri5": DOPRI5,
    "bosh3": BOSH3,
    "adaptive_heun": ADAPTIVE_HEUN,
}


def _get_tableau(method: str) -> Tableau:
    if method == "dopri8":
        return _dop853_tableau()
    return _TABLEAUS[method]


# ---------------------------------------------------------------------------
# Adaptive integration (lax.while_loop)
# ---------------------------------------------------------------------------

def _rk_step(func: Velocity, tab: Tableau, t, dt, y0, f0):
    """One explicit RK step. Returns (y1, f1, err, k_evals_used, ks)."""
    ks = [f0]
    for i in range(1, len(tab.c)):
        ti = t + tab.c[i] * dt
        yi = _combine(y0, ks, tab.a[i], dt)
        ks.append(func(ti, yi))
    y1 = _combine(y0, ks, tab.b, dt)
    err = _tmap(
        lambda *kl: sum(
            (dt * c) * k.astype(_acc()) for c, k in zip(tab.b_err, kl) if c != 0.0
        ),
        *ks,
    )
    f1 = ks[-1] if tab.fsal else func(t + dt, y1)
    evals = (len(tab.c) - 1) + (0 if tab.fsal else 1)
    return y1, f1, err, evals, ks


def _rk_step_rolled(func: Velocity, tab: Tableau, t, dt, y0, f0):
    """`_rk_step` with the stage loop ROLLED into a ``lax.scan`` so the
    velocity field is traced/lowered ONCE per step instead of n_stages
    times. This is a program-SIZE optimization, not a FLOPs one: with the
    Python-unrolled loop a dopri5 sampling program inlines the network 6
    extra times, and on the remote-compiled TPU path the cold
    load/compile cost scales with program size (measured on the v5e
    tunnel, DiT-L/2: unrolled dopri5 stage ~1,635 s first-ever vs euler's
    ~283 s; see docs/DESIGN.md "Adaptive program size"). Runtime math is
    identical.

    Parity with `_rk_step`: a single jitted step is BITWISE identical
    (tests/test_solvers.py::test_rolled_single_step_bitwise_matches_unrolled)
    — the stage combination accumulates left-to-right over a zero-padded
    tableau row, and the extra terms are exact ``+0.0`` (the k-buffer is
    zero-initialized, IEEE ``x + 0.0 == x``), so every intermediate float
    matches the skip-zeros sum of `_combine`; y1/err/f1 are computed by
    the same code as `_rk_step` from the unstacked k list. Across a FULL
    integration the two lowerings are different XLA programs and XLA may
    FMA-contract the error-norm reduction differently per fusion context,
    so whole-trajectory parity is decision-level (identical NFE and
    accept/reject sequence) with ulp-bounded value drift
    (test_rolled_integration_matches_unrolled).
    """
    n = len(tab.c)
    acc_t = _acc()
    a_pad = np.zeros((n, n), dtype=np.float64)
    for i in range(1, n):
        a_pad[i, : len(tab.a[i])] = tab.a[i]
    a_mat = jnp.asarray(a_pad, acc_t)
    c_vec = jnp.asarray(np.asarray(tab.c, dtype=np.float64), acc_t)

    kbuf0 = _tmap(
        lambda f: jnp.zeros((n,) + jnp.shape(f), f.dtype).at[0].set(f), f0)

    def stage(kbuf, i):
        ti = t + c_vec[i] * dt
        a_row = a_mat[i]

        def leaf(y0l, kbl):
            acc = y0l.astype(acc_t)
            for j in range(n):  # fixed left-to-right order; padded zeros
                acc = acc + (dt * a_row[j]) * kbl[j].astype(acc_t)
            return acc.astype(y0l.dtype)

        yi = _tmap(leaf, y0, kbuf)
        ki = func(ti, yi)
        kbuf = _tmap(
            lambda kb, kl: lax.dynamic_update_index_in_dim(
                kb, kl.astype(kb.dtype), i, 0), kbuf, ki)
        return kbuf, None

    kbuf, _ = lax.scan(stage, kbuf0, jnp.arange(1, n))
    ks = [_tmap(lambda kb, j=j: kb[j], kbuf) for j in range(n)]
    y1 = _combine(y0, ks, tab.b, dt)
    err = _tmap(
        lambda *kl: sum(
            (dt * c) * k.astype(_acc()) for c, k in zip(tab.b_err, kl) if c != 0.0
        ),
        *ks,
    )
    f1 = ks[-1] if tab.fsal else func(t + dt, y1)
    evals = (len(tab.c) - 1) + (0 if tab.fsal else 1)
    return y1, f1, err, evals, ks


def _interp_fit(y0, y1, ks, dt, c_mid):
    """torchdiffeq's quartic dense-output fit (rk_common.py::_interp_fit):
    a polynomial in x = (t - t0)/dt through y0 (x=0), y1 (x=1), the
    c_mid-estimated midpoint, and slopes dt*f0 / dt*f1 at the ends. Returns
    per-leaf stacked coefficients (5, *shape), highest power first. This is
    torchdiffeq's interpolant — NOT scipy's Shampine P matrix — because the
    reference evaluates odeint at t=0 through exactly this fit
    (test_flow_latent.py:61-73 -> torchdiffeq _interp_evaluate)."""
    acc_t = _acc()

    def leaf(y0l, y1l, *kl):
        y0f = y0l.astype(acc_t)
        y1f = y1l.astype(acc_t)
        ym = y0f + dt * sum(c * k.astype(acc_t)
                            for c, k in zip(c_mid, kl) if c != 0.0)
        f0 = dt * kl[0].astype(acc_t)
        f1 = dt * kl[-1].astype(acc_t)
        a = 2.0 * (f1 - f0) - 8.0 * (y1f + y0f) + 16.0 * ym
        b = 5.0 * f0 - 3.0 * f1 + 18.0 * y0f + 14.0 * y1f - 32.0 * ym
        c = f1 - 4.0 * f0 - 11.0 * y0f - 5.0 * y1f + 16.0 * ym
        return jnp.stack([a, b, c, f0, y0f])

    return _tmap(leaf, y0, y1, *ks)


def _initial_step(func, t0, y0, f0, order, rtol, atol, direction):
    """Hairer/Wanner initial-step heuristic (as in torchdiffeq/scipy)."""
    acc_t = _acc()
    scale = _tmap(lambda y: atol + rtol * jnp.abs(y.astype(acc_t)), y0)
    d0 = _rms_norm(_tmap(lambda y, s: y.astype(acc_t) / s, y0, scale))
    d1 = _rms_norm(_tmap(lambda f, s: f.astype(acc_t) / s, f0, scale))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)

    y1 = _axpy(h0 * direction, f0, y0)
    f1 = func(t0 + h0 * direction, y1)
    d2 = _rms_norm(_tmap(lambda a, b, s: (a - b).astype(acc_t) / s, f1, f0, scale)) / h0

    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1)


class _AdaptiveState(NamedTuple):
    t: jnp.ndarray
    y: Any
    f: Any
    dt: jnp.ndarray
    nfe: jnp.ndarray
    steps: jnp.ndarray
    rejected: jnp.ndarray
    # dense-output carry (dopri5 only; zeros otherwise)
    t_prev: jnp.ndarray
    h_prev: jnp.ndarray
    q: Any  # per-leaf (5, *shape): quartic fit coefficients, high power first
    trace: Any  # () or (t, dt, accept, ratio) arrays when record_trace


def _odeint_adaptive(
    func: Velocity,
    y0: Any,
    t0: float,
    t1: float,
    method: str,
    rtol: float,
    atol: float,
    max_steps: int,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
    eval_noise: Any = 0.0,
    record_trace: bool = False,
    unroll_stages: bool = False,
) -> ODEResult:
    """torchdiffeq-style adaptive integration. For dopri5 the final value is
    the quartic dense-output interpolant evaluated at t1 from the step that
    crosses it (the reference's torchdiffeq semantics — it never shortens
    steps to land on t1); other adaptive methods clamp the final step."""
    tab = _get_tableau(method)
    dense = method == "dopri5"
    acc_t = _acc()
    direction = 1.0 if t1 >= t0 else -1.0
    t0 = jnp.asarray(t0, acc_t)
    t1 = jnp.asarray(t1, acc_t)

    f0 = func(t0, y0)

    calibrate = eval_noise == "auto"
    n_extra = 0.0
    if calibrate:
        # probe calibration: evaluate the field at a point displaced by
        # d=1e-4 relative — far enough that low-precision quantization
        # decorrelates, near enough that the true field change (~d * L) is
        # negligible against it. The rms difference of the two evals is
        # sqrt(2)x the per-eval noise; a 1.5x safety factor absorbs the
        # extra decorrelation of stage points separated by a full step
        # h >> d. Swept on the TPU chip (perturbed bf16 DiT-L/2, tol 1e-5):
        # x1.15 -> NFE 3218, x1.5 -> NFE 422 at relRMS 7.8e-3 (bf16 floor
        # is 5.4e-3), x2.0 -> NFE 51 at 1.4e-2; x1.5 is the accuracy/cost
        # knee.
        d = 1e-4
        y_probe = _tmap(lambda l: l + d * (jnp.abs(l) + 1.0), y0)
        f_probe = func(t0, y_probe)
        diff2 = _rms_norm(_tmap(lambda a, b: a.astype(_acc())
                                - b.astype(_acc()), f_probe, f0))
        eval_noise = 1.5 * diff2 / (jnp.sqrt(2.0) * (_rms_norm(f0) + 1e-20))
        n_extra = 1.0

    # torchdiffeq calls _select_initial_step with ``self.order - 1``
    # (rk_common.py) so the heuristic exponent is 1/order, matching
    # scipy's error_estimator_order convention.
    dt0 = _initial_step(func, t0, y0, f0, tab.order - 1, rtol, atol,
                        direction) * direction
    zeros_q = _tmap(
        lambda l: jnp.zeros((5,) + jnp.shape(l), acc_t), y0
    ) if dense else None
    if record_trace:
        trace0 = (jnp.zeros((max_steps,), acc_t),
                  jnp.zeros((max_steps,), acc_t),
                  jnp.zeros((max_steps,), jnp.bool_),
                  jnp.zeros((max_steps,), acc_t))
    else:
        trace0 = ()
    init = _AdaptiveState(
        t=t0, y=y0, f=f0, dt=dt0,
        nfe=jnp.asarray(2.0 + n_extra, jnp.float32),  # f0 + initial-step probe (+ noise probe)
        steps=jnp.asarray(0, jnp.int32),
        rejected=jnp.asarray(0, jnp.int32),
        t_prev=t0, h_prev=jnp.asarray(1.0, acc_t), q=zeros_q,
        trace=trace0,
    )

    def cond(s: _AdaptiveState):
        not_done = jnp.abs(s.t - t1) > 1e-12
        moving_toward = (s.t - t1) * direction < 0
        return not_done & moving_toward & (s.steps + s.rejected < max_steps)

    def body(s: _AdaptiveState):
        if dense:
            dt = s.dt  # free stepping; the crossing step interpolates
            on_boundary = jnp.asarray(False)
        else:
            # clamp the step so we land exactly on t1
            remaining = t1 - s.t
            dt = jnp.where(jnp.abs(s.dt) > jnp.abs(remaining), remaining, s.dt)
            on_boundary = jnp.abs(dt) >= jnp.abs(remaining) - 1e-12

        step_fn = _rk_step if unroll_stages else _rk_step_rolled
        y1, f1, err, evals, ks = step_fn(func, tab, s.t, dt, s.y, s.f)
        ratio = _error_ratio(err, s.y, y1, rtol, atol)
        if calibrate or (not isinstance(eval_noise, (int, float))) or eval_noise > 0.0:
            # noise floor: per-element std of the embedded error under
            # independent relative rounding noise of each stage eval (the
            # correlated component cancels since sum_i b_err_i == 0);
            # subtract it from the measured ratio in quadrature — over
            # millions of elements the RMS concentrates, so the residual
            # is the truncation component.
            noise = _tmap(
                lambda *kl: jnp.abs(dt) * eval_noise * jnp.sqrt(
                    sum((c * c) * jnp.square(k.astype(_acc()))
                        for c, k in zip(tab.b_err, kl) if c != 0.0)
                ),
                *ks,
            )
            noise_ratio = _error_ratio(noise, s.y, y1, rtol, atol)
            ratio = jnp.sqrt(jnp.maximum(jnp.square(ratio) - jnp.square(noise_ratio), 0.0))
        accept = ratio <= 1.0

        # torchdiffeq's step-size update: factor = min(ifactor, max(safety/ratio^(1/order), dfactor'))
        dfac = jnp.where(ratio < 1.0, 1.0, dfactor)
        factor = jnp.where(
            ratio == 0.0,
            ifactor,
            jnp.minimum(ifactor, jnp.maximum(safety * ratio ** (-1.0 / tab.order), dfac)),
        )
        dt_next = dt * factor

        # land exactly on t1 when the clamped step reaches the boundary
        t_new = jnp.where(accept, jnp.where(on_boundary, t1, s.t + dt), s.t)
        y_new = _tmap(lambda a, b: jnp.where(accept, a, b), y1, s.y)
        f_new = _tmap(lambda a, b: jnp.where(accept, a, b), f1, s.f)

        if dense:
            q_new = _interp_fit(s.y, y1, ks, dt, tab.c_mid)
            q = _tmap(lambda a, b: jnp.where(accept, a, b), q_new, s.q)
            t_prev = jnp.where(accept, s.t, s.t_prev)
            h_prev = jnp.where(accept, dt, s.h_prev)
        else:
            q, t_prev, h_prev = s.q, s.t_prev, s.h_prev

        if record_trace:
            i = s.steps + s.rejected
            trace = (s.trace[0].at[i].set(s.t.astype(_acc())),
                     s.trace[1].at[i].set(dt.astype(_acc())),
                     s.trace[2].at[i].set(accept),
                     s.trace[3].at[i].set(ratio.astype(_acc())))
        else:
            trace = s.trace

        return _AdaptiveState(
            t=t_new, y=y_new, f=f_new, dt=dt_next,
            nfe=s.nfe + evals,
            steps=s.steps + accept.astype(jnp.int32),
            rejected=s.rejected + (1 - accept.astype(jnp.int32)),
            t_prev=t_prev, h_prev=h_prev, q=q, trace=trace,
        )

    final = lax.while_loop(cond, body, init)

    y_out = final.y
    if dense:
        # evaluate the crossing step's quartic fit at t1 (torchdiffeq
        # _interp_evaluate: Horner in x = (t - t0)/(t1 - t0))
        x = (t1 - final.t_prev) / final.h_prev

        def interp(ql, yl):
            acc = ql[0]
            for m in range(1, 5):
                acc = acc * x + ql[m]
            # fall back to the raw endpoint when no step was taken
            took_step = final.steps > 0
            return jnp.where(took_step, acc.astype(yl.dtype), yl)

        y_out = _tmap(interp, final.q, final.y)

    res = ODEResult(y=y_out, nfe=final.nfe, num_steps=final.steps,
                    num_rejected=final.rejected)
    if record_trace:
        return res, final.trace
    return res


# ---------------------------------------------------------------------------
# Fixed-step integration (lax.scan)
# ---------------------------------------------------------------------------

_FIXED_TABLEAUS = {
    # (c nodes, a rows, b weights)
    "euler": ((0.0,), ((),), (1.0,)),
    "midpoint": ((0.0, 0.5), ((), (0.5,)), (0.0, 1.0)),
    "heun": ((0.0, 1.0), ((), (1.0,)), (0.5, 0.5)),
    "rk4": (
        (0.0, 0.5, 0.5, 1.0),
        ((), (0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
        (1 / 6, 1 / 3, 1 / 3, 1 / 6),
    ),
}


def _odeint_fixed(
    func: Velocity, y0: Any, t0: float, t1: float, method: str, num_steps: int
) -> ODEResult:
    c, a, b = _FIXED_TABLEAUS[method]
    ts = jnp.linspace(t0, t1, num_steps + 1, dtype=jnp.float32)

    def step(y, tpair):
        t, t_next = tpair
        dt = t_next - t
        ks = [func(t, y)]
        for i in range(1, len(c)):
            yi = _combine(y, ks, a[i], dt)
            ks.append(func(t + c[i] * dt, yi))
        y1 = _combine(y, ks, b, dt)
        return y1, None

    y1, _ = lax.scan(step, y0, (ts[:-1], ts[1:]))
    nfe = jnp.asarray(float(num_steps * len(c)), jnp.float32)
    return ODEResult(
        y=y1, nfe=nfe,
        num_steps=jnp.asarray(num_steps, jnp.int32),
        num_rejected=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Karras-style fixed-sigma samplers (reference sampler/karras_sample.py)
# ---------------------------------------------------------------------------

def karras_sigmas(steps: int, sigma_min: float = 1e-5, sigma_max: float = 1.0) -> jnp.ndarray:
    """Linear sigma schedule sigma_max -> sigma_min (karras_sample.py:30;
    rho is unused in the reference since the schedule is linspace)."""
    return jnp.linspace(sigma_max, sigma_min, steps, dtype=jnp.float32)


def sample_euler_karras(denoiser, x, sigmas) -> Any:
    """Karras Euler loop with identity `to_d` for flow matching
    (karras_sample.py:85-118): x <- x + v(x, sigma) * (sigma_next - sigma)."""

    def step(x, spair):
        s, s_next = spair
        d = denoiser(x, s)
        return _axpy(s_next - s, d, x), None

    x1, _ = lax.scan(step, x, (sigmas[:-1], sigmas[1:]))
    return x1


def sample_heun_karras(
    denoiser, x, sigmas, *, s_churn: float = 0.0, s_tmin: float = 0.0,
    s_tmax: float = 1.0, s_noise: float = 1.0, noise_key: Optional[jax.Array] = None,
    steps_for_churn: int = 40,
) -> Any:
    """Karras Heun loop with optional churn noise + 2nd-order correction
    (karras_sample.py:121-161). The reference's correction guard is
    ``i < steps - 1`` where ``steps`` stays at its DEFAULT 40 (the dispatch
    at karras_sample.py:32-35 never forwards the actual schedule length), so
    the correction runs for the first 39 steps and schedules longer than
    that fall back to plain Euler for the tail. We mirror that exactly — as
    a STATIC split into a corrected scan followed by an Euler-only scan, so
    no wasted second model evaluation is traced for the tail."""
    n = sigmas.shape[0] - 1
    gamma_const = min(s_churn / steps_for_churn, float(np.sqrt(2) - 1)) if s_churn > 0 else 0.0
    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)

    def _churned(x, i, t_cur, t_hat):
        if gamma_const <= 0:
            return x
        key = jax.random.fold_in(noise_key, i)
        noise = _tmap(lambda l: jax.random.normal(key, l.shape, l.dtype), x)
        return _tmap(
            lambda xl, nl: xl + jnp.sqrt(jnp.maximum(t_hat**2 - t_cur**2, 0.0)) * s_noise * nl,
            x, noise,
        )

    def step(carry, i, *, correct: bool):
        x = carry
        t_cur = sigmas[i]
        t_next = sigmas[i + 1]
        gamma = jnp.where((s_tmin <= t_cur) & (t_cur <= s_tmax), gamma_const, 0.0)
        t_hat = t_cur + gamma * t_cur
        x_hat = _churned(x, i, t_cur, t_hat)
        d_cur = denoiser(x_hat, t_hat)
        x_next = _axpy(t_next - t_hat, d_cur, x_hat)
        if correct:
            d_prime = denoiser(x_next, t_next)
            d_avg = _tmap(lambda a, b: 0.5 * a + 0.5 * b, d_cur, d_prime)
            x_next = _axpy(t_next - t_hat, d_avg, x_hat)
        return x_next, None

    n_corr = min(n, steps_for_churn - 1)
    x1, _ = lax.scan(lambda c, i: step(c, i, correct=True), x, jnp.arange(n_corr))
    if n > n_corr:
        x1, _ = lax.scan(lambda c, i: step(c, i, correct=False), x1,
                         jnp.arange(n_corr, n))
    return x1


def karras_sample(
    model_fn, x_T, steps: int, *, sigma_min: float = 1e-5, sigma_max: float = 1.0,
    sampler: str = "heun", s_churn: float = 0.0, s_tmin: float = 0.0,
    s_tmax: float = 1.0, s_noise: float = 1.0, clip_denoised: bool = False,
    noise_key: Optional[jax.Array] = None,
) -> Any:
    """Dispatch euler/heun over a linear sigma schedule
    (reference karras_sample.py:7-76). `model_fn(x, sigma)` is the velocity
    (already CFG-wrapped if needed); `clip_denoised` clamps to [-1, 1]."""
    sigmas = karras_sigmas(steps, sigma_min, sigma_max)

    def denoiser(x, sigma):
        v = model_fn(x, sigma)
        if clip_denoised:
            v = _tmap(lambda l: jnp.clip(l, -1.0, 1.0), v)
        return v

    if sampler == "euler":
        return sample_euler_karras(denoiser, x_T, sigmas)
    if sampler == "heun":
        return sample_heun_karras(
            denoiser, x_T, sigmas, s_churn=s_churn, s_tmin=s_tmin,
            s_tmax=s_tmax, s_noise=s_noise, noise_key=noise_key,
        )
    raise NotImplementedError(
        f"sampler {sampler!r} not implemented (the reference dispatch table "
        "also only contains euler/heun; karras_sample.py:32-35)"
    )


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

def odeint(
    func: Velocity,
    y0: Any,
    t0: float = 1.0,
    t1: float = 0.0,
    *,
    method: str = "dopri5",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    step_size: Optional[float] = None,
    num_steps: Optional[int] = None,
    max_steps: int = 10_000,
    eval_noise: Any = 0.0,
    record_trace: bool = False,
    unroll_stages: bool = False,
) -> ODEResult:
    """Integrate dy/dt = func(t, y) from t0 to t1.

    Mirrors the reference's solver surface (method choices at
    test_flow_latent.py:378-396; adaptive tol defaults 1e-5; fixed-step
    ``options={'step_size': ...}``). Sampling goes from t0=1 (noise) to
    t1=0 (data) per the flow-matching convention (train_flow_latent.py:148).
    ``eval_noise`` is the relative evaluation noise of ``func`` used to
    noise-floor the adaptive error estimate: a float, or ``"auto"`` to
    calibrate it with one probe evaluation at t0 (the right setting for
    bf16 models; see module docstring). ``record_trace`` (adaptive only)
    additionally returns (t, dt, accept, error_ratio) arrays of length
    ``max_steps`` — one row per attempted step — for controller parity
    tests against the float64 torchdiffeq transliteration
    (tests/tdq_ref.py). ``unroll_stages`` (adaptive only) Python-unrolls
    the RK stage loop the way torchdiffeq's source reads; the default
    rolls it into a ``lax.scan`` — the same per-step math (bitwise on a
    single step) with the velocity field traced once instead of
    n_stages times, a 2.2x smaller lowered dopri5 sampling program
    (19.4 -> 8.7 MB StableHLO on DiT-L/2 bs16; see ``_rk_step_rolled``
    and docs/DESIGN.md "Adaptive program size").
    """
    if method in ADAPTIVE_SOLVERS:
        return _odeint_adaptive(func, y0, t0, t1, method, rtol, atol, max_steps,
                                eval_noise=eval_noise,
                                record_trace=record_trace,
                                unroll_stages=unroll_stages)
    if method in _FIXED_TABLEAUS:
        if num_steps is None:
            ss = step_size if step_size else 0.01
            num_steps = max(1, int(round(abs(t1 - t0) / ss)))
        return _odeint_fixed(func, y0, t0, t1, method, num_steps)
    raise NotImplementedError(f"unknown method {method!r}")
