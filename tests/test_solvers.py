"""Golden-trajectory solver tests (SURVEY.md §4 items 1, 6).

Each canonical config integrates with the JAX steppers and compares against
the tight-tolerance SciPy BDF fixture at the accuracy bar implied by
rtol=1e-6 local error control. Step-count budgets catch regressions in
stiff stability (a broken Newton/LU shows up as a step-count explosion long
before it shows up as wrong trajectories — SURVEY.md §4 item 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.solvers import (
    STATUS_DONE,
    bdf_solve,
    dopri5_solve,
    rosenbrock_solve,
)

CFG = SolverConfig(rtol=1e-6, atol=1e-9)


def _relerr(ys, ref, floor=1e-7):
    return np.max(np.abs(ys - ref) / (floor + np.abs(ref)))


@pytest.mark.parametrize("solver,tol", [
    (bdf_solve, 3e-4), (dopri5_solve, 3e-4), (rosenbrock_solve, 5e-3),
])
def test_mm3_trajectory(golden, solver, tol):
    g = golden("mm3")
    model = library.michaelis_menten()
    p = jnp.asarray(g["p"])
    res = solver(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                 model.y0(p), jnp.asarray(g["t_eval"]), config=CFG)
    assert int(res.status) == STATUS_DONE
    assert _relerr(np.asarray(res.ys), g["ys"]) < tol


@pytest.mark.parametrize("rtol,atol,tol", [
    (1e-6, 1e-9, 3e-4),    # local error control: global err ~ 100x rtol
    (1e-8, 1e-11, 1e-6),   # tightened BDF hits the 1e-6 reference bar
])
def test_mm3_bdf_tolerance_tiers(golden, rtol, atol, tol):
    """Tolerance-tiered accuracy (BASELINE.json:5): the global trajectory
    error tracks the local-error budget; rtol=1e-8 delivers <=1e-6."""
    g = golden("mm3")
    model = library.michaelis_menten()
    p = jnp.asarray(g["p"])
    cfg = SolverConfig(rtol=rtol, atol=atol)
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]), config=cfg)
    assert int(res.status) == STATUS_DONE
    assert _relerr(np.asarray(res.ys), g["ys"]) < tol


def test_repressilator_bdf(golden):
    g = golden("repressilator")
    model = library.repressilator()
    p = jnp.asarray(g["p"])
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]), config=CFG)
    assert int(res.status) == STATUS_DONE
    # oscillator: phase error accumulates; compare with an absolute floor
    np.testing.assert_allclose(np.asarray(res.ys), g["ys"], rtol=2e-3,
                               atol=2e-3)


@pytest.mark.slow
def test_mapk22_stiff_bdf(golden):
    g = golden("mapk22")
    model = library.mapk_huang_ferrell()
    p = jnp.asarray(g["p"])
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]), config=cfg)
    assert int(res.status) == STATUS_DONE
    assert _relerr(np.asarray(res.ys), g["ys"], floor=1e-9) < 2e-4
    # stiffness regression: SciPy BDF does this in ~240 steps; a loss of
    # stiff stability explodes the count (SURVEY.md §4 item 6)
    assert int(res.nsteps) < 600


@pytest.mark.slow
def test_mapk22_bdf_tight_hits_1e6(golden):
    """Tightened BDF (rtol=1e-8) reaches the 1e-6 reference-accuracy bar
    on the stiff config (BASELINE.json:5); Radau does it at rtol=1e-6
    (test_radau_mapk22_stiff)."""
    g = golden("mapk22")
    model = library.mapk_huang_ferrell()
    p = jnp.asarray(g["p"])
    cfg = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=4096)
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]), config=cfg)
    assert int(res.status) == STATUS_DONE
    err = np.max(np.abs(np.asarray(res.ys) - g["ys"])) / np.max(
        np.abs(g["ys"]))
    assert err < 1e-6


def test_t_eval_endpoints():
    """t_eval at t0 and t_bound must both be filled exactly."""
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    t_eval = jnp.asarray([0.0, 7.5, 15.0])
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, 15.0),
                    model.y0(p), t_eval, config=CFG)
    assert int(res.status) == STATUS_DONE
    ys = np.asarray(res.ys)
    np.testing.assert_allclose(ys[0], np.asarray(model.y0(p)), atol=1e-14)
    assert np.all(ys[1:] != 0.0)


def test_max_steps_flags_not_raises():
    """Budget exhaustion -> STATUS_MAX_STEPS, never an exception
    (vmapped-batch safety, SURVEY.md §5 failure detection)."""
    model = library.repressilator()
    p = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    cfg = SolverConfig(rtol=1e-10, atol=1e-13, max_steps=8)
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, 30.0),
                    model.y0(p), jnp.asarray([0.0, 30.0]), config=cfg)
    assert int(res.status) != STATUS_DONE
    assert np.all(np.isfinite(np.asarray(res.ys)))


@pytest.mark.parametrize("name,builder,true_p,t_end,tol", [
    ("mm3", library.michaelis_menten, library.MM_TRUE_PARAMS, 10.0, 1e-6),
])
def test_radau_trajectory(golden, name, builder, true_p, t_end, tol):
    from tpusysbio.solvers import radau_solve

    g = golden(name)
    model = builder()
    p = jnp.asarray(g["p"])
    res = radau_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                      model.y0(p), jnp.asarray(g["t_eval"]), config=CFG)
    assert int(res.status) == STATUS_DONE
    assert _relerr(np.asarray(res.ys), g["ys"]) < 1e-4


@pytest.mark.slow
def test_radau_mapk22_stiff(golden):
    from tpusysbio.solvers import radau_solve

    g = golden("mapk22")
    model = library.mapk_huang_ferrell()
    p = jnp.asarray(g["p"])
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024)
    res = radau_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                      model.y0(p), jnp.asarray(g["t_eval"]), config=cfg)
    assert int(res.status) == STATUS_DONE
    err = np.max(np.abs(np.asarray(res.ys) - g["ys"])) / np.max(
        np.abs(g["ys"]))
    assert err < 1e-6  # order 5 at rtol=1e-6 is near reference accuracy
    # order-5 stiff: SciPy Radau does this in ~126 steps
    assert int(res.nsteps) < 300


def test_radau_sensitivities_vs_bdf():
    from tpusysbio.solvers import radau_solve
    from tpusysbio.sens import make_sens_rhs

    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 6)
    cfg = SolverConfig(rtol=1e-8, atol=1e-11)
    sens_rhs = make_sens_rhs(model.rhs, p)
    s0 = jnp.zeros((3, 4))
    r1 = radau_solve(lambda t, y: model.rhs(t, y, p), (0.0, 10.0),
                     model.y0(p), t_eval, config=cfg, sens_rhs=sens_rhs,
                     s0=s0)
    r2 = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, 10.0),
                   model.y0(p), t_eval, config=cfg, sens_rhs=sens_rhs,
                   s0=s0)
    assert int(r1.status) == STATUS_DONE
    s_a, s_b = np.asarray(r1.sens), np.asarray(r2.sens)
    scale = 1e-6 + np.max(np.abs(s_b))
    assert np.max(np.abs(s_a - s_b)) / scale < 1e-5


def test_auto_solver_nonstiff_uses_rk():
    from tpusysbio.solvers import auto_solve

    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    res = auto_solve(lambda t, y: model.rhs(t, y, p), (0.0, 10.0),
                     model.y0(p), jnp.linspace(0.0, 10.0, 5), config=CFG)
    assert int(res.status) == STATUS_DONE
    assert int(res.nlu) == 0  # explicit path: no factorizations


@pytest.mark.slow
def test_auto_solver_stiff_falls_back_to_bdf(golden):
    from tpusysbio.solvers import auto_solve

    g = golden("mapk22")
    model = library.mapk_huang_ferrell()
    p = jnp.asarray(g["p"])
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = auto_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                     model.y0(p), jnp.asarray(g["t_eval"]), config=cfg,
                     nonstiff_budget=256)
    assert int(res.status) == STATUS_DONE
    assert int(res.nlu) > 0  # stiff fallback engaged
    err = np.max(np.abs(np.asarray(res.ys) - g["ys"])) / np.max(
        np.abs(g["ys"]))
    assert err < 1e-4


def test_long_horizon_memory_is_static():
    """Long-horizon memory bounding (SURVEY.md §5 long-context): the
    integrator's device memory is O(1) in the integration horizon BY
    CONSTRUCTION — one while_loop with a fixed-size carry, no per-step
    allocation, no reverse-mode tape (forward sensitivities only), and a
    static (T, n) dense-output buffer. Measured: the compiled
    executable's temp allocation is a few KB and the SAME executable
    (t_end is a traced scalar) serves any horizon, so ``jax.checkpoint``
    rematerialization has nothing to bound. This closes the 'wire
    jax.checkpoint or measure the horizon where memory matters' item:
    there is no such horizon."""
    import jax

    from tpusysbio.solvers import bdf_solve

    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1_000_000)

    def run(t_end):
        t_eval = jnp.linspace(0.0, 1.0, 41) * t_end
        r = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, t_end),
                      model.y0(p), t_eval, config=cfg)
        return r.ys, r.status, r.nsteps

    comp = jax.jit(run).lower(10.0).compile()
    ma = comp.memory_analysis()
    # fixed-size temp workspace (few KB), horizon-independent
    assert ma.temp_size_in_bytes < 1_000_000
    # the SAME executable integrates a 1000x longer horizon: memory
    # cannot depend on the step count
    short = comp(jnp.asarray(10.0))
    long = comp(jnp.asarray(10_000.0))
    assert int(short[1]) == 1 and int(long[1]) == 1
    assert int(long[2]) > int(short[2])  # genuinely more steps


def test_dense_window_bitwise_equal():
    """SolverConfig.dense_window: the windowed dense-output path (slice
    interpolation + step cap at the (window-1)-th next grid point) must be
    BITWISE identical to the full-grid path when the cap never binds, with
    the same step count — it is the bench contract's exactness claim."""
    from tpusysbio.sens import make_sens_rhs

    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 41)
    s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
    sens_rhs = make_sens_rhs(model.rhs, p)

    def run(dwin):
        cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                           dense_window=dwin)
        return jax.jit(lambda: bdf_solve(
            lambda t, y: model.rhs(t, y, p), (0.0, 10.0), model.y0(p),
            t_eval, config=cfg, sens_rhs=sens_rhs, s0=s0))()

    full, win = run(0), run(8)
    assert int(full.status) == 1 and int(win.status) == 1
    assert int(full.nsteps) == int(win.nsteps)
    np.testing.assert_array_equal(np.asarray(full.ys), np.asarray(win.ys))
    np.testing.assert_array_equal(np.asarray(full.sens),
                                  np.asarray(win.sens))


def test_dense_window_cap_binds_still_exact():
    """A tiny window on a coarse grid forces the step cap to bind: the
    trajectory changes (more steps) but stays within tolerance of the
    full-grid reference at every grid point."""
    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 9)

    def run(dwin):
        cfg = SolverConfig(rtol=1e-8, atol=1e-11, max_steps=2048,
                           dense_window=dwin)
        return jax.jit(lambda: bdf_solve(
            lambda t, y: model.rhs(t, y, p), (0.0, 10.0), model.y0(p),
            t_eval, config=cfg))()

    full, win = run(0), run(2)
    assert int(win.status) == 1
    # the cap costs extra steps on a coarse grid, never correctness
    assert int(win.nsteps) >= int(full.nsteps)
    np.testing.assert_allclose(np.asarray(win.ys), np.asarray(full.ys),
                               rtol=1e-6, atol=1e-9)
