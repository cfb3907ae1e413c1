"""Warm-handoff auto (LSODA-role) solver tests (SURVEY.md §2a #8).

The canonical probe is a nonstiff→stiff transition problem
``y' = -λ(t)(y - cos t) - sin t`` with λ ramping 1 → 1e4 at t=5: an
explicit method is the right choice on the prefix, hopeless after the
ramp. Checks: (a) the handoff happens (BDF used, explicit phase did not
burn its whole budget integrating the stiff suffix), (b) the stitched
trajectory matches a tight SciPy reference across BOTH phases, (c) the
total step count is within ~2x of SciPy's per-step-switching LSODA on the
same problem (measured head-to-head — PARITY.md #8 records the ratio),
(d) a nonstiff problem never touches the implicit machinery, and (e) the
vmapped mixed-stiffness batch semantics hold.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.solvers import STATUS_DONE, auto_solve


def _transition_rhs(t, y, lam_hi=1e4):
    lam = 1.0 + lam_hi * jax.nn.sigmoid((t - 5.0) * 4.0)
    return jnp.stack([-lam * (y[0] - jnp.cos(t)) - jnp.sin(t)])


def _scipy_lsoda_steps():
    from scipy.integrate import odeint

    def f(y, t):
        lam = 1.0 + 1e4 / (1.0 + np.exp(-(t - 5.0) * 4.0))
        return [-lam * (y[0] - np.cos(t)) - np.sin(t)]

    t = np.linspace(0.0, 10.0, 21)
    out, info = odeint(f, [1.5], t, rtol=1e-6, atol=1e-9, full_output=True)
    return out, int(info["nst"][-1])


def test_auto_transition_handoff_matches_reference():
    from scipy.integrate import solve_ivp

    t_eval = jnp.linspace(0.0, 10.0, 21)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)
    res = jax.jit(lambda: auto_solve(
        _transition_rhs, (0.0, 10.0), jnp.asarray([1.5]), t_eval,
        config=cfg, nonstiff_budget=256))()
    assert int(res.status) == STATUS_DONE
    # the implicit stepper actually ran (handoff happened)
    assert int(res.njev) > 0

    ref = solve_ivp(
        lambda t, y: np.asarray(_transition_rhs(t, jnp.asarray(y))),
        (0.0, 10.0), [1.5], method="BDF", rtol=1e-9, atol=1e-12,
        t_eval=np.asarray(t_eval))
    assert ref.success
    err = np.max(np.abs(np.asarray(res.ys[:, 0]) - ref.y[0]))
    assert err < 1e-4

    # head-to-head vs per-step-switching LSODA (Fortran): measured ratio
    # on this problem is 0.58x (auto 180 steps vs LSODA 313 — recorded in
    # PARITY.md #8); the assertion is tightened to <=1.2x so a regression
    # to "merely 2x worse than LSODA" cannot land silently
    _, lsoda_steps = _scipy_lsoda_steps()
    assert int(res.nsteps) <= 1.2 * lsoda_steps, (
        f"auto {int(res.nsteps)} vs LSODA {lsoda_steps}")


def test_auto_nonstiff_stays_explicit():
    model = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 10.0, 6)
    res = jax.jit(lambda: auto_solve(
        lambda t, y: model.rhs(t, y, p), (0.0, 10.0), model.y0(p),
        t_eval, config=SolverConfig(rtol=1e-6, atol=1e-9)))()
    assert int(res.status) == STATUS_DONE
    assert int(res.njev) == 0 and int(res.nlu) == 0


def test_auto_vmapped_mixed_stiffness():
    """A batch mixing nonstiff and stiff members: every member correct,
    each against its own direct solve."""
    model = library.michaelis_menten()
    p_mild = jnp.asarray(library.MM_TRUE_PARAMS)
    p_stiff = p_mild.at[0].mul(2e4)  # huge k1: fast binding equilibrium
    ps = jnp.stack([p_mild, p_stiff])
    t_eval = jnp.linspace(0.0, 10.0, 6)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048)

    def one(p):
        r = auto_solve(lambda t, y: model.rhs(t, y, p), (0.0, 10.0),
                       model.y0(p), t_eval, config=cfg,
                       nonstiff_budget=128)
        return r.ys, r.status

    ys, status = jax.jit(jax.vmap(one))(ps)
    assert (np.asarray(status) == STATUS_DONE).all()

    from tpusysbio.solvers import bdf_solve
    for i, p in enumerate([p_mild, p_stiff]):
        ref = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, 10.0),
                        model.y0(p), t_eval,
                        config=SolverConfig(rtol=1e-9, atol=1e-12,
                                            max_steps=4096))
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(ref.ys),
                                   rtol=1e-3, atol=1e-8)
