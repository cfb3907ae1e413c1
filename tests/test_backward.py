"""Backward-time integration via time reflection (OdeModel.simulate).

Spec: ``odeint``/``solve_ivp`` accept decreasing time
(``scipy/integrate/_ivp/ivp.py:161`` direction handling). The steppers
here are forward-only by design; the model surface reflects
``τ = t0 − t`` onto the forward machinery.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tpusysbio.config import SolverConfig
from tpusysbio.model import library


def _lv():
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    return model, p


def test_backward_recovers_forward_trajectory():
    """Integrate forward 0→15, then backward 15→0 from the endpoint:
    the backward run must retrace the forward trajectory (and land on
    the original initial condition)."""
    model, p = _lv()
    t_fwd = jnp.linspace(0.0, 15.0, 16)
    cfg = SolverConfig(rtol=1e-9, atol=1e-12, max_steps=4096)
    fwd = model.simulate(p, (0.0, 15.0), t_fwd, config=cfg)
    assert int(fwd.status) == 1

    back_model = dataclasses.replace(
        model, y0=lambda pp: jnp.asarray(fwd.ys[-1], pp.dtype))
    t_back = t_fwd[::-1]  # decreasing, 15 → 0
    back = back_model.simulate(p, (15.0, 0.0), t_back, config=cfg)
    assert int(back.status) == 1
    assert float(back.t_final) == pytest.approx(0.0, abs=1e-9)

    scale = np.abs(np.asarray(fwd.ys)).max()
    err = np.abs(np.asarray(back.ys) - np.asarray(fwd.ys)[::-1]).max()
    assert err / scale < 1e-6, err / scale


def test_backward_vs_scipy():
    """Backward run from an arbitrary state vs scipy's native
    decreasing-t_span BDF."""
    model, p = _lv()
    y_start = jnp.asarray([1.7, 0.4])
    back_model = dataclasses.replace(
        model, y0=lambda pp: y_start.astype(pp.dtype))
    t_back = jnp.linspace(10.0, 1.0, 10)
    cfg = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=4096)
    res = jax.jit(lambda pp: back_model.simulate(
        pp, (10.0, 1.0), t_back, config=cfg))(p)
    assert int(res.status) == 1

    ref = solve_ivp(
        lambda t, y: np.asarray(model.rhs(t, jnp.asarray(y), p)),
        (10.0, 1.0), np.asarray(y_start), method="BDF",
        t_eval=np.asarray(t_back), rtol=1e-10, atol=1e-13)
    err = np.abs(np.asarray(res.ys) - ref.y.T).max() / np.abs(ref.y).max()
    assert err < 1e-6, err


def test_backward_sensitivities_vs_fd():
    """Reflected sensitivity RHS: backward dy/dp matches central finite
    differences of the backward trajectory."""
    model, p = _lv()
    y_start = jnp.asarray([1.7, 0.4])
    back_model = dataclasses.replace(
        model, y0=lambda pp: y_start.astype(pp.dtype))
    t_back = jnp.linspace(10.0, 2.0, 5)
    cfg = SolverConfig(rtol=1e-9, atol=1e-12, max_steps=4096)
    res = back_model.simulate_sensitivities(p, (10.0, 2.0), t_back,
                                            config=cfg)
    sens = np.asarray(res.sens)

    def traj(pp):
        return np.asarray(back_model.simulate(
            jnp.asarray(pp), (10.0, 2.0), t_back, config=cfg).ys)

    for g in range(2):  # two params suffice to pin the reflection sign
        eps = 1e-6 * max(1.0, abs(float(p[g])))
        d = np.zeros(p.shape[0])
        d[g] = eps
        fd = (traj(np.asarray(p) + d) - traj(np.asarray(p) - d)) / (2 * eps)
        scale = 1e-8 + np.abs(fd).max()
        assert np.abs(sens[:, :, g] - fd).max() / scale < 1e-4, g


def test_backward_rejects_events_and_dense():
    model, p = _lv()
    t_back = jnp.linspace(5.0, 1.0, 4)
    with pytest.raises(ValueError, match="backward"):
        model.simulate(p, (5.0, 1.0), t_back, dense_output=True)
