"""Adams–Bashforth–Moulton (PECE) stepper tests (SURVEY.md §2a #8 —
the LSODA non-stiff half; spec: ODEPACK Adams semantics via
``scipy/integrate/_ivp/lsoda.py``).

Gates: accuracy vs tight references at rtol, the cost advantage that
justifies a multistep (FEWER RHS evaluations than RK45 at equal
tolerance — the whole point of Adams), sensitivity propagation, vmapped
ensembles, and the Adams→BDF warm handoff inside ``auto``."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusysbio.config import SolverConfig
from tpusysbio.solvers import STATUS_DONE, adams_solve, auto_solve, dopri5_solve


def _lv(t, y):
    a, b, c, d = 1.5, 1.0, 3.0, 1.0
    return jnp.stack([a * y[0] - b * y[0] * y[1],
                      -c * y[1] + d * y[0] * y[1]])


def _lv_ref(t_eval):
    from scipy.integrate import solve_ivp

    ref = solve_ivp(lambda t, y: np.asarray(_lv(t, jnp.asarray(y))),
                    (0.0, 15.0), [10.0, 5.0], rtol=1e-11, atol=1e-13,
                    t_eval=np.asarray(t_eval), method="DOP853")
    assert ref.success
    return ref.y.T


def test_adams_linear_exact():
    """y' = -y + sin t against the closed form."""
    def f(t, y):
        return jnp.stack([-y[0] + jnp.sin(t)])

    t_eval = jnp.linspace(0.0, 10.0, 21)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = jax.jit(lambda: adams_solve(f, (0.0, 10.0), jnp.asarray([1.0]),
                                      t_eval, config=cfg))()
    assert int(res.status) == STATUS_DONE
    t = np.asarray(t_eval)
    exact = 1.5 * np.exp(-t) + (np.sin(t) - np.cos(t)) / 2
    assert np.max(np.abs(np.asarray(res.ys[:, 0]) - exact)) < 5e-5


def test_adams_lotka_accuracy_and_economy():
    """Lotka–Volterra at rtol=1e-6: matches a tight reference AND uses
    FEWER RHS evaluations than dopri5 at the same tolerance (the
    multistep economics the verdict gate asks for)."""
    t_eval = jnp.linspace(0.0, 15.0, 31)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=8192)
    y0 = jnp.asarray([10.0, 5.0])
    ra = jax.jit(lambda: adams_solve(_lv, (0.0, 15.0), y0, t_eval,
                                     config=cfg))()
    rd = jax.jit(lambda: dopri5_solve(_lv, (0.0, 15.0), y0, t_eval,
                                      config=cfg))()
    assert int(ra.status) == STATUS_DONE
    ref = _lv_ref(t_eval)
    rel_a = np.max(np.abs(np.asarray(ra.ys) - ref)
                   / np.maximum(np.abs(ref), 1e-3))
    # global error consistent with rtol=1e-6 over 4 amplifying LV cycles
    # (dopri5 lands at ~7e-5 on the same run — different one-step error
    # constants; the tolerance-consistent bound is the contract)
    assert rel_a < 1e-3, rel_a
    # the economy gate: fewer f evals than RK45 at equal tolerance
    assert int(ra.nfev) < int(rd.nfev), (int(ra.nfev), int(rd.nfev))


def test_adams_sensitivities_match_dopri5():
    """Forward sensitivities ride the same difference array; parity with
    the RK45 sensitivity path (itself FD/augmented-system-verified in
    tests/test_sens.py)."""
    from tpusysbio.sens import make_sens_rhs

    p = jnp.asarray([1.5, 1.0, 3.0, 1.0])

    def f(t, y, pp=p):
        return jnp.stack([pp[0] * y[0] - pp[1] * y[0] * y[1],
                          -pp[2] * y[1] + pp[3] * y[0] * y[1]])

    def fp(t, y):
        return f(t, y)

    sens_rhs = make_sens_rhs(lambda t, y, pp: jnp.stack([
        pp[0] * y[0] - pp[1] * y[0] * y[1],
        -pp[2] * y[1] + pp[3] * y[0] * y[1]]), p)
    t_eval = jnp.linspace(0.0, 8.0, 9)
    cfg = SolverConfig(rtol=1e-7, atol=1e-10, max_steps=8192)
    y0 = jnp.asarray([10.0, 5.0])
    s0 = jnp.zeros((2, 4))
    ra = jax.jit(lambda: adams_solve(fp, (0.0, 8.0), y0, t_eval, config=cfg,
                                     sens_rhs=sens_rhs, s0=s0))()
    rd = jax.jit(lambda: dopri5_solve(fp, (0.0, 8.0), y0, t_eval, config=cfg,
                                      sens_rhs=sens_rhs, s0=s0))()
    assert int(ra.status) == STATUS_DONE
    scale = np.maximum(np.abs(np.asarray(rd.sens)), 1.0)
    np.testing.assert_allclose(np.asarray(ra.sens) / scale,
                               np.asarray(rd.sens) / scale, atol=2e-4)


def test_adams_vmapped_ensemble():
    t_eval = jnp.linspace(0.0, 10.0, 6)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=4096)

    def one(scale):
        y0 = jnp.asarray([10.0, 5.0]) * scale
        r = adams_solve(_lv, (0.0, 10.0), y0, t_eval, config=cfg)
        return r.ys, r.status

    scales = jnp.asarray([0.8, 1.0, 1.2, 1.5])
    ys, status = jax.jit(jax.vmap(one))(scales)
    assert (np.asarray(status) == STATUS_DONE).all()
    for i, s in enumerate(np.asarray(scales)):
        r = jax.jit(lambda s=s: adams_solve(
            _lv, (0.0, 10.0), jnp.asarray([10.0, 5.0]) * s, t_eval,
            config=cfg))()
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(r.ys),
                                   rtol=1e-6, atol=1e-8)


def test_auto_adams_handoff_transition_problem():
    """auto(explicit='adams') = the Adams→BDF LSODA contract: correct
    across the non-stiff→stiff transition, implicit machinery engaged."""
    from scipy.integrate import solve_ivp

    def rhs(t, y):
        lam = 1.0 + 1e4 * jax.nn.sigmoid((t - 5.0) * 4.0)
        return jnp.stack([-lam * (y[0] - jnp.cos(t)) - jnp.sin(t)])

    t_eval = jnp.linspace(0.0, 10.0, 21)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = jax.jit(lambda: auto_solve(
        rhs, (0.0, 10.0), jnp.asarray([1.5]), t_eval, config=cfg,
        nonstiff_budget=256, explicit="adams"))()
    assert int(res.status) == STATUS_DONE
    assert int(res.njev) > 0  # BDF ran

    ref = solve_ivp(lambda t, y: np.asarray(rhs(t, jnp.asarray(y))),
                    (0.0, 10.0), [1.5], method="BDF", rtol=1e-9, atol=1e-12,
                    t_eval=np.asarray(t_eval))
    assert ref.success
    assert np.max(np.abs(np.asarray(res.ys[:, 0]) - ref.y[0])) < 1e-4
