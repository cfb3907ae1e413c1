"""Forward-sensitivity tests (SURVEY.md §4 item 2; BASELINE.json:8).

Oracles, in order of independence:
(a) SciPy BDF integration of the explicitly augmented (n + n·m)-state system
    (what the reference built with SymPy) — golden fixtures;
(b) central finite differences of the JAX solver itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.sens import make_sens_rhs
from tpusysbio.solvers import STATUS_DONE, bdf_solve, dopri5_solve

CFG = SolverConfig(rtol=1e-8, atol=1e-11)


def _solve_with_sens(model, p, t_span, t_eval, solver=bdf_solve, config=CFG):
    sens_rhs = make_sens_rhs(model.rhs, p)
    s0 = jax.jacfwd(model.y0)(p)
    return solver(lambda t, y: model.rhs(t, y, p), t_span, model.y0(p),
                  t_eval, config=config, sens_rhs=sens_rhs, s0=s0)


@pytest.mark.parametrize("name,builder,true_p", [
    ("mm3", library.michaelis_menten, library.MM_TRUE_PARAMS),
    ("lotka", library.lotka_volterra, library.LV_TRUE_PARAMS),
])
def test_sens_vs_scipy_augmented(golden, name, builder, true_p):
    g = golden(name)
    model = builder()
    p = jnp.asarray(g["p"])
    res = _solve_with_sens(model, p, tuple(g["t_span"]),
                           jnp.asarray(g["t_eval"]))
    assert int(res.status) == STATUS_DONE
    sens = np.asarray(res.sens)
    ref = g["sens"]
    scale = 1e-6 + np.max(np.abs(ref))
    assert np.max(np.abs(sens - ref)) / scale < 1e-5


def test_lotka_sens_vs_finite_differences():
    """dy0/dp flows through: LV fits its initial conditions (params 4, 5)."""
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 11)
    res = _solve_with_sens(model, p, (0.0, 10.0), t_eval)
    sens = np.asarray(res.sens)

    @jax.jit
    def traj_jit(pv):
        r = bdf_solve(lambda t, y: model.rhs(t, y, pv), (0.0, 10.0),
                      model.y0(pv), t_eval, config=CFG)
        return r.ys

    def traj(pv):
        return np.asarray(traj_jit(pv))

    eps = 1e-6
    for k in range(model.n_params):
        dp = np.zeros(model.n_params)
        dp[k] = eps
        fd = (traj(p + jnp.asarray(dp)) - traj(p - jnp.asarray(dp))) / (2 * eps)
        scale = 1e-6 + np.max(np.abs(fd))
        assert np.max(np.abs(sens[:, :, k] - fd)) / scale < 2e-4, f"param {k}"


def test_sens_dopri5_matches_bdf():
    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 6)
    r1 = _solve_with_sens(model, p, (0.0, 10.0), t_eval, solver=bdf_solve)
    r2 = _solve_with_sens(model, p, (0.0, 10.0), t_eval, solver=dopri5_solve)
    s1, s2 = np.asarray(r1.sens), np.asarray(r2.sens)
    scale = 1e-6 + np.max(np.abs(s1))
    assert np.max(np.abs(s1 - s2)) / scale < 1e-5


def test_split_precision_sensitivities():
    """sens_precision='f32': state bit-identical to full mode, sensitivity
    columns accurate to LM-Jacobian tolerance (docs/PERFORMANCE.md)."""
    from tpusysbio.model import library as lib

    model = lib.michaelis_menten()
    p = jnp.asarray(lib.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 6)
    kw = dict(rtol=1e-6, atol=1e-9)
    a = _solve_with_sens(model, p, (0.0, 10.0), t_eval,
                         config=SolverConfig(**kw))
    b = _solve_with_sens(model, p, (0.0, 10.0), t_eval,
                         config=SolverConfig(**kw, sens_precision="f32"))
    assert int(a.status) == int(b.status) == STATUS_DONE
    assert int(a.nsteps) == int(b.nsteps)
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys),
                               rtol=1e-12, atol=1e-13)
    s_a, s_b = np.asarray(a.sens), np.asarray(b.sens)
    assert np.max(np.abs(s_a - s_b)) / (1e-9 + np.max(np.abs(s_a))) < 1e-4
