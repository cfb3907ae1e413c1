"""Post-hoc continuous solution (solvers/dense.py OdeSolution).

Spec: scipy ``solve_ivp(dense_output=True)`` returning an ``OdeSolution``
evaluable at arbitrary times (``scipy/integrate/_ivp/common.py:137``).
The export must (a) reproduce the in-loop dense output exactly at the
``t_eval`` grid (same polynomial), and (b) match a tight SciPy reference
at arbitrary off-grid times to the solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.solvers import OdeSolution


def _lv():
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    return model, p


def test_dense_solution_matches_t_eval_grid():
    """sol(t_eval) reproduces result.ys to roundoff — same polynomial."""
    model, p = _lv()
    t_eval = jnp.linspace(0.0, 15.0, 31)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = jax.jit(lambda pp: model.simulate(
        pp, (0.0, 15.0), t_eval, config=cfg, dense_output=True))(p)
    assert int(res.status) == 1
    sol = OdeSolution(res)
    ys = np.asarray(res.ys)
    got = sol(np.asarray(t_eval))
    scale = np.abs(ys).max()
    # skip the t==t0 prefill point (not produced by a step interpolant;
    # the first segment's polynomial still evaluates it to solver accuracy)
    np.testing.assert_allclose(got[1:], ys[1:], rtol=0, atol=1e-12 * scale)
    assert np.abs(got[0] - ys[0]).max() < 1e-5 * scale


def test_dense_solution_offgrid_vs_scipy():
    """Arbitrary off-grid times vs a tight SciPy reference."""
    model, p = _lv()
    t_eval = jnp.linspace(0.0, 15.0, 8)   # sparse grid: sol must not
    cfg = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=4096)
    res = jax.jit(lambda pp: model.simulate(
        pp, (0.0, 15.0), t_eval, config=cfg, dense_output=True))(p)
    sol = OdeSolution(res)
    assert sol.t_max == pytest.approx(15.0)

    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0.01, 14.99, 100))
    ref = solve_ivp(
        lambda t, y: np.asarray(model.rhs(t, jnp.asarray(y), p)),
        (0.0, 15.0), np.asarray(model.y0(p)), method="BDF",
        t_eval=ts, rtol=1e-10, atol=1e-13)
    err = np.abs(sol(ts) - ref.y.T).max() / np.abs(ref.y).max()
    assert err < 1e-6, err

    # scalar-time call returns (n,)
    y_mid = sol(7.5)
    assert y_mid.shape == (model.n_states,)


def test_dense_solution_sensitivities():
    """Exported interpolant carries the sensitivity columns; off-grid
    sens(t) matches the in-loop dense output at a t_eval point."""
    model, p = _lv()
    t_eval = jnp.linspace(0.0, 10.0, 21)
    cfg = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=4096)
    res = jax.jit(lambda pp: model.simulate_sensitivities(
        pp, (0.0, 10.0), t_eval, config=cfg, dense_output=True))(p)
    sol = OdeSolution(res)
    sens_grid = np.asarray(res.sens)
    got = sol.sens(np.asarray(t_eval))
    scale = np.abs(sens_grid).max()
    np.testing.assert_allclose(got[1:], sens_grid[1:], rtol=0,
                               atol=1e-10 * scale)


def test_dense_solution_vmapped_member():
    """Dense export under vmap: slicing one member reproduces the
    unvmapped solution."""
    model, p = _lv()
    t_eval = jnp.linspace(0.0, 10.0, 11)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)

    def run(pp):
        return model.simulate(pp, (0.0, 10.0), t_eval, config=cfg,
                              dense_output=True)

    ps = jnp.stack([p, p * 1.1, p * 0.9])
    batched = jax.jit(jax.vmap(run))(ps)
    single = jax.jit(run)(ps[1])
    res1 = jax.tree.map(lambda a: a[1], batched)
    sol_b = OdeSolution(res1)
    sol_s = OdeSolution(single)
    ts = np.linspace(0.3, 9.7, 37)
    np.testing.assert_allclose(sol_b(ts), sol_s(ts), rtol=0, atol=1e-12)


def test_dense_output_requires_bdf_and_export():
    model, p = _lv()
    t_eval = jnp.linspace(0.0, 1.0, 3)
    with pytest.raises(ValueError, match="bdf"):
        model.simulate(p, (0.0, 1.0), t_eval, solver="dopri5",
                       dense_output=True)
    res = model.simulate(p, (0.0, 1.0), t_eval,
                         config=SolverConfig(max_steps=256))
    with pytest.raises(ValueError, match="dense-export"):
        OdeSolution(res)
