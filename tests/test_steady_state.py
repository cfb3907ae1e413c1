"""Steady-state solve + implicit-function-theorem sensitivities."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusysbio.solvers.steady_state import steady_state


def _decay_rhs(t, y, p):
    # y1' = p0 - p1*y1 ; y2' = p2*y1 - p3*y2  -> y* = (p0/p1, p2 y1*/p3)
    return jnp.stack([p[0] - p[1] * y[0], p[2] * y[0] - p[3] * y[1]])


def test_steady_state_analytic():
    p = jnp.asarray([2.0, 0.5, 1.0, 0.25])
    res = steady_state(_decay_rhs, p, jnp.asarray([0.1, 0.1]),
                       with_sens=True, t_relax=5.0)
    assert bool(res.converged)
    y_star = np.array([4.0, 16.0])
    np.testing.assert_allclose(np.asarray(res.y), y_star, rtol=1e-9)

    # analytic dy*/dp
    p0, p1, p2, p3 = map(float, p)
    expected = np.array([
        [1 / p1, -p0 / p1**2, 0.0, 0.0],
        [p2 / (p3 * p1), -p2 * p0 / (p3 * p1**2), p0 / (p1 * p3),
         -p2 * p0 / (p1 * p3**2)],
    ])
    np.testing.assert_allclose(np.asarray(res.sens), expected, rtol=1e-8)


def test_steady_state_nonlinear_vs_long_integration():
    # Michaelis-Menten with inflow: S' = v - Vm*S/(Km+S)
    def rhs(t, y, p):
        v, vm, km = p
        return jnp.stack([v - vm * y[0] / (km + y[0])])

    p = jnp.asarray([0.3, 1.0, 0.5])
    res = steady_state(rhs, p, jnp.asarray([0.01]), with_sens=True,
                       t_relax=20.0)
    assert bool(res.converged)
    # analytic: S* = v*Km/(Vm - v)
    s_star = 0.3 * 0.5 / 0.7
    np.testing.assert_allclose(float(res.y[0]), s_star, rtol=1e-9)
    # FD check of sensitivities
    eps = 1e-7
    for k in range(3):
        d = jnp.zeros(3).at[k].set(eps)
        yp = steady_state(rhs, p + d, jnp.asarray([0.01]), t_relax=20.0).y
        ym = steady_state(rhs, p - d, jnp.asarray([0.01]), t_relax=20.0).y
        fd = float((yp - ym)[0]) / (2 * eps)
        np.testing.assert_allclose(float(res.sens[0, k]), fd, rtol=1e-5,
                                   atol=1e-10)
