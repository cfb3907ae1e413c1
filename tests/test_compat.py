"""SciPy-facade parity tests (tpusysbio.compat).

Each facade is oracled against the genuine scipy call on the same
problem — the migration contract is "change the import", so the test IS
the contract: same shapes, same fields, same numbers to integration /
optimization tolerance.
"""

import numpy as np
import pytest
import scipy.integrate as si
import scipy.optimize as so

import jax
import jax.numpy as jnp

from tpusysbio import compat


def _decay_rhs(t, y):
    # linear 2-state with mild stiffness ratio
    return jnp.asarray([-0.5 * y[0] + 40.0 * (y[1] - y[0]),
                        -40.0 * (y[1] - y[0]) - 0.1 * y[1]])


def _decay_np(t, y):
    return np.asarray([-0.5 * y[0] + 40.0 * (y[1] - y[0]),
                       -40.0 * (y[1] - y[0]) - 0.1 * y[1]])


Y0 = [1.0, 0.0]


def test_solve_ivp_bdf_parity():
    t_eval = np.linspace(0.0, 5.0, 17)
    ours = compat.solve_ivp(_decay_rhs, (0.0, 5.0), Y0, method="BDF",
                            t_eval=t_eval, rtol=1e-8, atol=1e-10)
    ref = si.solve_ivp(_decay_np, (0.0, 5.0), Y0, method="BDF",
                       t_eval=t_eval, rtol=1e-10, atol=1e-12)
    assert ours.success and ours.status == 0
    assert ours.y.shape == ref.y.shape  # (n, T), scipy orientation
    np.testing.assert_allclose(ours.y, ref.y, rtol=1e-6, atol=1e-9)
    assert ours.nfev > 0 and ours.nlu > 0


def test_solve_ivp_accepted_step_grid_and_dense_output():
    """t_eval=None returns the accepted-step grid (scipy convention);
    sol(t) evaluates anywhere."""
    ours = compat.solve_ivp(_decay_rhs, (0.0, 5.0), Y0, method="BDF",
                            dense_output=True, rtol=1e-6, atol=1e-9)
    assert ours.t[0] == 0.0 and ours.t[-1] == 5.0
    assert np.all(np.diff(ours.t) > 0)
    assert ours.y.shape == (2, ours.t.size)
    ref = si.solve_ivp(_decay_np, (0.0, 5.0), Y0, method="BDF",
                       dense_output=True, rtol=1e-10, atol=1e-12)
    probe = np.linspace(0.3, 4.7, 9)
    np.testing.assert_allclose(np.asarray(ours.sol(probe)).T[:2],
                               ref.sol(probe), rtol=1e-4, atol=1e-7)


def test_solve_ivp_backward():
    # rotation system (neutrally stable both directions — a decaying
    # system would amplify solver noise exponentially backward);
    # oracle: scipy on the same decreasing t_span
    def rot(t, y):
        return jnp.asarray([y[1], -y[0]])

    def rot_np(t, y):
        return np.asarray([y[1], -y[0]])

    t_eval = np.linspace(5.0, 0.0, 11)
    ours = compat.solve_ivp(rot, (5.0, 0.0), [0.4, 0.2],
                            method="BDF", t_eval=t_eval,
                            rtol=1e-8, atol=1e-10)
    ref = si.solve_ivp(rot_np, (5.0, 0.0), [0.4, 0.2], method="BDF",
                       t_eval=t_eval, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ours.y, ref.y, rtol=1e-5, atol=1e-7)


def test_solve_ivp_events_parity():
    def ours_event(t, y):
        return y[0] - 0.5

    def ref_event(t, y):
        return y[0] - 0.5

    ref_event.terminal = True
    ref_event.direction = -1.0
    oe = lambda t, y: y[0] - 0.5  # noqa: E731
    oe.terminal = True
    oe.direction = -1.0

    t_eval = np.linspace(0.0, 5.0, 11)
    ours = compat.solve_ivp(_decay_rhs, (0.0, 5.0), Y0, method="BDF",
                            t_eval=t_eval, events=[oe],
                            rtol=1e-8, atol=1e-10)
    ref = si.solve_ivp(_decay_np, (0.0, 5.0), Y0, method="BDF",
                       t_eval=t_eval, events=[ref_event],
                       rtol=1e-10, atol=1e-12)
    assert ours.status == 1 and ref.status == 1
    assert len(ours.t_events) == 1
    np.testing.assert_allclose(ours.t_events[0], ref.t_events[0],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ours.y_events[0], ref.y_events[0],
                               rtol=1e-5, atol=1e-7)


def test_solve_ivp_explicit_and_unknown_method():
    t_eval = np.linspace(0.0, 2.0, 9)
    ours = compat.solve_ivp(_decay_rhs, (0.0, 2.0), Y0, method="RK45",
                            t_eval=t_eval, rtol=1e-8, atol=1e-10)
    ref = si.solve_ivp(_decay_np, (0.0, 2.0), Y0, method="RK45",
                       t_eval=t_eval, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ours.y, ref.y, rtol=1e-6, atol=1e-9)
    with pytest.raises(ValueError):
        compat.solve_ivp(_decay_rhs, (0.0, 2.0), Y0, method="nope",
                         t_eval=t_eval)
    with pytest.raises(ValueError):  # dense output is BDF-only
        compat.solve_ivp(_decay_rhs, (0.0, 2.0), Y0, method="RK45")


def test_odeint_parity_and_full_output():
    t = np.linspace(0.0, 5.0, 21)

    def f_ours(y, t):
        return _decay_rhs(t, y)

    def f_ref(y, t):
        return _decay_np(t, y)

    ours, info = compat.odeint(f_ours, Y0, t, full_output=True)
    ref = si.odeint(f_ref, Y0, t)
    assert ours.shape == ref.shape  # (T, n), odeint orientation
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
    assert info["nst"] > 0 and info["nfe"] > 0
    assert info["message"] == "Integration successful."

    # single-time call returns y0 (scipy behavior)
    one = compat.odeint(f_ours, Y0, np.asarray([0.0]))
    np.testing.assert_array_equal(one, np.asarray([Y0]))


def test_odeint_decreasing_t():
    # rotation system: neutrally stable backward (see backward test)
    t = np.linspace(3.0, 0.0, 13)

    def f_ours(y, t):
        return jnp.asarray([y[1], -y[0]])

    def f_ref(y, t):
        return np.asarray([y[1], -y[0]])

    ours = compat.odeint(f_ours, [0.3, 0.1], t)
    ref = si.odeint(f_ref, [0.3, 0.1], t)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)


def _powell_j(th):
    return jnp.stack([
        jnp.asarray([1e4 * th[1], 1e4 * th[0]]),
        jnp.asarray([-jnp.exp(-th[0]), -jnp.exp(-th[1])]),
    ])


def _powell_r(th):
    return jnp.stack([1e4 * th[0] * th[1] - 1.0,
                      jnp.exp(-th[0]) + jnp.exp(-th[1]) - 1.0001])


def _powell_np(th):
    return np.asarray([1e4 * th[0] * th[1] - 1.0,
                       np.exp(-th[0]) + np.exp(-th[1]) - 1.0001])


def test_leastsq_parity():
    x0 = [0.0, 1.0]
    ours_x, ours_ier = compat.leastsq(_powell_r, x0)
    ref_x, ref_ier = so.leastsq(_powell_np, x0)
    assert ours_ier in (1, 2, 3, 4) and ref_ier in (1, 2, 3, 4)
    np.testing.assert_allclose(np.sort(ours_x), np.sort(ref_x), rtol=1e-5)

    x, cov, info, mesg, ier = compat.leastsq(_powell_r, x0,
                                             full_output=True)
    _, rcov, rinfo, _, _ = so.leastsq(_powell_np, x0, full_output=True)
    np.testing.assert_allclose(cov, rcov, rtol=5e-3)
    assert info["nfev"] > 0 and info["fvec"].shape == (2,)


def test_least_squares_bounds_and_loss_parity():
    def rosen(th):
        return jnp.stack([10.0 * (th[1] - th[0] ** 2), 1.0 - th[0]])

    def rosen_np(th):
        return np.asarray([10.0 * (th[1] - th[0] ** 2), 1.0 - th[0]])

    lb, ub = [-2.0, -2.0], [0.8, 2.0]  # (1,1) infeasible
    ours = compat.least_squares(rosen, [-1.2, 1.0], bounds=(lb, ub))
    ref = so.least_squares(rosen_np, [-1.2, 1.0], bounds=(lb, ub))
    assert ours.success and ref.success
    np.testing.assert_allclose(ours.x, ref.x, atol=1e-6)
    np.testing.assert_allclose(ours.cost, ref.cost, rtol=1e-8)
    assert ours.fun.shape == ref.fun.shape
    assert ours.jac.shape == ref.jac.shape
    np.testing.assert_array_equal(ours.active_mask, ref.active_mask)

    # robust loss, unbounded: decay curve with gross outliers (the
    # realistic robust-fit shape; the deep per-loss parity suite is
    # tests/test_fit.py::test_trf_robust_loss_matches_scipy)
    t = np.linspace(0.0, 5.0, 24)
    y = 3.0 * np.exp(-0.8 * t) + 0.3
    y[5] += 2.5
    y[17] -= 1.8
    tj, yj = jnp.asarray(t), jnp.asarray(y)

    def decay_r(th):
        return th[0] * jnp.exp(-th[1] * tj) + th[2] - yj

    def decay_np(th):
        return th[0] * np.exp(-th[1] * t) + th[2] - y

    oh = compat.least_squares(decay_r, [1.0, 1.0, 0.0], loss="huber",
                              f_scale=0.5)
    rh = so.least_squares(decay_np, [1.0, 1.0, 0.0], loss="huber",
                          f_scale=0.5)
    assert oh.success and rh.success
    np.testing.assert_allclose(oh.x, rh.x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(oh.cost, rh.cost, rtol=1e-6)

    with pytest.raises(ValueError):
        compat.least_squares(rosen, [0.0, 0.0], jac="2-point")
    with pytest.raises(ValueError):
        compat.least_squares(rosen, [0.0, 0.0], method="dogbox")
