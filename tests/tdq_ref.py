"""Host-side float64 NumPy transliteration of torchdiffeq's dopri5 adaptive
stepper, used as the controller-parity oracle for lfm_tpu.ode.solvers.

torchdiffeq itself is not installable in this environment; this is a
from-scratch reimplementation of its published algorithm
(rtqichen/torchdiffeq `_impl/rk_common.py` + `_impl/dopri5.py`), which is
what the reference integrates with (reference train_flow_latent.py:25,
test_flow_latent.py:61-73). The semantics transliterated exactly:

  * Hairer initial-step heuristic, called with ``order - 1`` as torchdiffeq
    does (rk_common.py: ``_select_initial_step(..., self.order - 1, ...)``),
    so the exponent is 1/order;
  * RMS error norm over err / (atol + rtol * max(|y0|, |y1|));
  * accept iff ratio <= 1; step update
    dt * min(ifactor, max(safety * ratio**(-1/order), dfactor')) with
    dfactor' = 1 when ratio < 1 (never shrink an accepted step) and
    ifactor on ratio == 0; safety=0.9, ifactor=10, dfactor=0.2;
  * free stepping PAST t1 (never clamping), endpoint evaluated through the
    quartic dense-output fit of the crossing step (DPS_C_MID midpoint +
    endpoint values/slopes, rk_common.py::_interp_fit);
  * FSAL: 6 new function evaluations per attempted step; +1 for f0 and +1
    for the initial-step probe.

Everything runs in float64 so the oracle trace is exact to ~1e-15; the jit
solver is compared under jax_enable_x64.
"""

from __future__ import annotations

import numpy as np

SAFETY, IFACTOR, DFACTOR = 0.9, 10.0, 0.2
ORDER = 5

_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84,
               0.0])
_B_ERR = np.array([
    35 / 384 - 1951 / 21600, 0.0, 500 / 1113 - 22642 / 50085,
    125 / 192 - 451 / 720, -2187 / 6784 + 12231 / 42400,
    11 / 84 - 649 / 6300, -1 / 60,
])
_C_MID = np.array([
    6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
    -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
    -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
])


def _rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x))))


def _select_initial_step(func, t0, y0, order, rtol, atol, f0, direction=1.0):
    """torchdiffeq integrates decreasing time by reversing it
    (odeint wraps func as -f(-t, y)); in original coordinates the Hairer
    probe therefore steps in the INTEGRATION direction."""
    scale = atol + np.abs(y0) * rtol
    d0 = _rms(y0 / scale)
    d1 = _rms(f0 / scale)
    h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
    y1 = y0 + h0 * direction * f0
    f1 = func(t0 + h0 * direction, y1)
    d2 = _rms((f1 - f0) / scale) / h0
    if d1 <= 1e-15 and d2 <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1, d2)) ** (1.0 / (order + 1))
    return min(100 * h0, h1)


def _optimal_step_size(last_step, ratio, order):
    if ratio == 0.0:
        return last_step * IFACTOR
    dfactor = 1.0 if ratio < 1.0 else DFACTOR
    return last_step * min(IFACTOR,
                           max(SAFETY * ratio ** (-1.0 / order), dfactor))


def _interp_coeffs(y0, y1, ks, dt):
    """Quartic fit [a, b, c, d, e] in x = (t - t0)/dt, highest power first."""
    y_mid = y0 + dt * np.tensordot(_C_MID, ks, axes=(0, 0))
    f0 = dt * ks[0]
    f1 = dt * ks[-1]
    a = 2.0 * (f1 - f0) - 8.0 * (y1 + y0) + 16.0 * y_mid
    b = 5.0 * f0 - 3.0 * f1 + 18.0 * y0 + 14.0 * y1 - 32.0 * y_mid
    c = f1 - 4.0 * f0 - 11.0 * y0 - 5.0 * y1 + 16.0 * y_mid
    return [a, b, c, f0, y0]


def odeint_dopri5(func, y0, t0, t1, rtol=1e-5, atol=1e-5, max_steps=10_000):
    """Returns (y_at_t1, nfe, steps, rejected, trace) where trace is a list
    of (t, dt, accepted, error_ratio) — one row per ATTEMPTED step."""
    y0 = np.asarray(y0, np.float64)
    direction = 1.0 if t1 >= t0 else -1.0
    f0 = func(t0, y0)
    dt = _select_initial_step(func, t0, y0, ORDER - 1, rtol, atol, f0,
                              direction) * direction
    nfe = 2  # f0 + the initial-step probe
    t, y, f = float(t0), y0, f0
    steps = rejected = 0
    trace = []
    coeffs, t_prev, h_prev = None, float(t0), 1.0
    while (abs(t - t1) > 1e-12 and (t - t1) * direction < 0
           and steps + rejected < max_steps):
        ks = [f]
        for i in range(1, 7):
            ti = t + _C[i] * dt
            yi = y + dt * sum(a * k for a, k in zip(_A[i], ks))
            ks.append(func(ti, yi))
        ks = np.asarray(ks)
        y1 = y + dt * np.tensordot(_B, ks, axes=(0, 0))
        err = dt * np.tensordot(_B_ERR, ks, axes=(0, 0))
        tol = atol + rtol * np.maximum(np.abs(y), np.abs(y1))
        ratio = _rms(err / tol)
        accept = ratio <= 1.0
        trace.append((t, dt, accept, ratio))
        nfe += 6
        if accept:
            coeffs = _interp_coeffs(y, y1, ks, dt)
            t_prev, h_prev = t, dt
            t = t + dt
            y, f = y1, ks[-1]
            steps += 1
        else:
            rejected += 1
        dt = _optimal_step_size(dt, ratio, ORDER)
    if coeffs is None:
        return y, nfe, steps, rejected, trace
    x = (t1 - t_prev) / h_prev
    out = coeffs[0]
    for m in range(1, 5):
        out = out * x + coeffs[m]
    return out, nfe, steps, rejected, trace
