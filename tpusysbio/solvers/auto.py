"""Automatic non-stiff/stiff method selection (the LSODA role).

The reference's default integrator is ODEPACK LSODA — Adams↔BDF switching
per step on stiffness heuristics (SURVEY.md §2a #8). Per-step method
switching is a poor fit for one jitted TPU program (two live method states
in lockstep, data-dependent branching on every step), so the TPU-native
``auto`` strategy switches at *segment* granularity with a WARM HANDOFF:

1. integrate with an explicit method — RK45 by default, or the
   variable-order Adams–Bashforth–Moulton multistep (solvers/adams.py:
   LSODA's actual non-stiff half; see ``auto_solve``'s ``explicit``
   docstring for the measured TPU regime analysis) — which aborts with
   ``STATUS_STIFF`` the moment its controlled step size implies the
   remaining interval cannot finish within the step budget (the
   stiffness detector — cheap: no Jacobians, no solves);
2. the BDF stepper CONTINUES from the explicit phase's final ``(t, y, S)``
   — never restarting at t0 — and the dense outputs are stitched.

For a problem that transitions nonstiff→stiff this costs ≈ the explicit
steps over the nonstiff prefix + implicit steps over the stiff suffix,
which is what per-step LSODA switching achieves on the same problem
(measured head-to-head in tests/test_auto.py and PARITY.md #8); unlike
LSODA there is no per-step mode branching, so the program stays a lean
lockstep kernel.

Vmapped ensembles: ``lax.cond`` lowers to running both branches, but the
BDF branch starts at each member's own handoff point — members that
finished explicitly contribute a single degenerate BDF step, so a batch
pays (RK45 union) + (BDF union over the stiff members' suffixes), not two
full integrations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from tpusysbio.config import SolverConfig
from tpusysbio.solvers.adams import adams_solve
from tpusysbio.solvers.bdf import bdf_solve
from tpusysbio.solvers.common import STATUS_DONE, IntegrateResult
from tpusysbio.solvers.dopri5 import dopri5_solve


def auto_solve(
    f: Callable,
    t_span,
    y0,
    t_eval,
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    s0=None,
    jac: Optional[Callable] = None,
    nonstiff_budget: Optional[int] = None,
    explicit: str = "rk45",
) -> IntegrateResult:
    """LSODA-role integration: explicit attempt, stiff warm-handoff.

    ``nonstiff_budget``: explicit-phase step budget; stiffness is declared
    as soon as the projected remaining steps exceed what is left of it
    (default ``max(config.max_steps // 4, 64)``).

    ``explicit``: the non-stiff method. ``'adams'`` is the variable-order
    Adams–Bashforth–Moulton multistep (2 RHS evaluations/step — the
    actual LSODA non-stiff half, ODEPACK semantics); ``'rk45'``
    (Dormand–Prince) is the DEFAULT because on TPU the economics invert:
    measured on vmapped ensembles (docs/PERFORMANCE.md round-3 Adams
    section), Adams spends ~30% fewer RHS evaluations but takes ~2.2×
    more (smaller) steps, and with cheap mass-action RHS the sequential
    per-step cost — not evaluation count — dominates, so RK45 wins
    wall-clock ~5-12×. Choose ``'adams'`` when the RHS is expensive
    enough that evaluation count rules (the regime LSODA's design
    assumes), or for ODEPACK-semantics parity.
    """
    budget = nonstiff_budget or max(config.max_steps // 4, 64)
    cfg_rk = dataclasses.replace(config, max_steps=budget)
    t_eval = jnp.asarray(t_eval)

    explicit_solve = {"adams": adams_solve, "rk45": dopri5_solve}[explicit]
    res_rk = explicit_solve(f, t_span, y0, t_eval, config=cfg_rk,
                            sens_rhs=sens_rhs, s0=s0, stiff_exit=True)
    m = 0 if s0 is None else s0.shape[1]

    def fallback():
        y_h = res_rk.y_final[:, 0]
        s_h = res_rk.y_final[:, 1:] if m else None
        res_b = bdf_solve(f, (res_rk.t_final, t_span[1]), y_h, t_eval,
                          config=config, sens_rhs=sens_rhs, s0=s_h, jac=jac)
        # stitch dense outputs: rows the explicit phase already produced
        # (t_eval <= handoff time) keep their RK45 values
        pre = t_eval <= res_rk.t_final
        ys = jnp.where(pre[:, None], res_rk.ys, res_b.ys)
        sens = (jnp.where(pre[:, None, None], res_rk.sens, res_b.sens)
                if m else res_b.sens)
        return IntegrateResult(
            ys=ys, sens=sens, status=res_b.status,
            nsteps=res_rk.nsteps + res_b.nsteps,
            naccepted=res_rk.naccepted + res_b.naccepted,
            nrejected=res_rk.nrejected + res_b.nrejected,
            nfev=res_rk.nfev + res_b.nfev, njev=res_b.njev,
            nlu=res_b.nlu, order_hist=res_b.order_hist,
            t_final=res_b.t_final, y_final=res_b.y_final)

    def keep():
        # shape/pytree-matched with the fallback branch
        return IntegrateResult(
            ys=res_rk.ys, sens=res_rk.sens, status=res_rk.status,
            nsteps=res_rk.nsteps, naccepted=res_rk.naccepted,
            nrejected=res_rk.nrejected, nfev=res_rk.nfev,
            njev=jnp.zeros((), jnp.int32), nlu=jnp.zeros((), jnp.int32),
            order_hist=jnp.zeros((6,), jnp.int32),
            t_final=res_rk.t_final, y_final=res_rk.y_final)

    return lax.cond(res_rk.status == STATUS_DONE, keep, fallback)
