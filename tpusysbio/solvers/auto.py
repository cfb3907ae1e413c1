"""Automatic non-stiff/stiff method selection (the LSODA role).

The reference's default integrator is ODEPACK LSODA — Adams↔BDF switching
per step on stiffness heuristics (SURVEY.md §2a #8). Per-step method
switching is a poor fit for one jitted TPU program (two live method states
in lockstep, data-dependent branching on every step), so the TPU-native
``auto`` strategy switches at *segment* granularity:

1. attempt the whole integration with the explicit RK45 under a step
   budget (non-stiff problems finish cheaply — no Jacobians, no solves);
2. if the budget is exhausted or the step size underflows (the stiffness
   signal), rerun with the BDF stepper.

Both attempts live inside one jit under ``lax.cond``. Caveat for vmapped
ensembles: ``cond`` lowers to ``select`` under ``vmap``, so a batch pays
for both methods whenever any member is stiff — for ensembles of a KNOWN
model pick ``bdf``/``radau`` explicitly; ``auto`` is for interactive use
on unknown models, which is exactly where the reference used LSODA.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
from jax import lax

from tpusysbio.config import SolverConfig
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
) -> IntegrateResult:
    """LSODA-role integration: cheap explicit attempt, stiff fallback.

    ``nonstiff_budget``: RK45 step budget before declaring stiffness
    (default ``config.max_steps // 4``).
    """
    budget = nonstiff_budget or max(config.max_steps // 4, 64)
    cfg_rk = dataclasses.replace(config, max_steps=budget)

    res_rk = dopri5_solve(f, t_span, y0, t_eval, config=cfg_rk,
                          sens_rhs=sens_rhs, s0=s0)

    def fallback():
        return bdf_solve(f, t_span, y0, t_eval, config=config,
                         sens_rhs=sens_rhs, s0=s0, jac=jac)

    def keep():
        return res_rk

    return lax.cond(res_rk.status == STATUS_DONE, keep, fallback)
