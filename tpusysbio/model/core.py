"""The ``OdeModel`` container — capability parity with the reference's
model wrapper (SURVEY.md §2 #1: holds RHS, parameter names/order,
observables; ``simulate()`` drives the integrator).

Differences by design (TPU-first):
- ``rhs`` is a pure function ``(t, y, p) -> dy/dt`` closed over nothing;
  simulation composes it with a solver from ``tpusysbio.solvers`` under one
  ``jax.jit``.
- Sensitivities are never hand-coded: ``tpusysbio.sens`` derives them from
  ``rhs`` via ``jax.jvp`` (BASELINE.json:5).
- ``y0`` may depend on parameters (e.g. conserved totals as fit parameters);
  the sensitivity layer picks up ``dy0/dp`` automatically via ``jacfwd``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpusysbio.config import SolverConfig


@dataclasses.dataclass(frozen=True)
class OdeModel:
    """A parameterized ODE system with observables.

    Attributes:
      rhs: ``(t, y, p) -> (n_states,)``.
      y0: ``(p,) -> (n_states,)`` initial condition.
      observables: ``(y, p) -> (n_obs,)`` mapping one state vector to
        observable values (vmapped over time by callers).
    """

    name: str
    n_states: int
    n_params: int
    n_obs: int
    rhs: Callable
    y0: Callable
    observables: Callable
    param_names: Tuple[str, ...] = ()
    state_names: Tuple[str, ...] = ()
    # Optional closed-form fast paths (set by the mass-action builder):
    # rhs_jac:  (t, y, p) -> (n, n) state Jacobian
    # rhs_sens: (t, y, S, p) -> (n, m) forward-sensitivity RHS w.r.t. ALL
    #           model parameters. When absent, AD (jacfwd / jvp) is used.
    # rhs_sens_dir: (t, y, S, p, C) -> (n, G) reduced forward-sensitivity
    #           RHS along parameter directions C (m, G) — the fit-parameter
    #           column block (project sens_mode='theta').
    rhs_jac: Optional[Callable] = None
    rhs_sens: Optional[Callable] = None
    rhs_sens_dir: Optional[Callable] = None

    def __post_init__(self):
        if self.param_names and len(self.param_names) != self.n_params:
            raise ValueError("param_names length mismatch")
        if self.state_names and len(self.state_names) != self.n_states:
            raise ValueError("state_names length mismatch")

    def simulate(self, p, t_span, t_eval, solver: str = "bdf",
                 config: Optional[SolverConfig] = None, events=None,
                 dense_output: bool = False):
        """Forward trajectory at ``t_eval`` (reference ``model.simulate``,
        SURVEY.md §3.2). Returns an ``IntegrateResult``.

        ``events``: optional :class:`tpusysbio.solvers.EventSpec` for
        state-dependent event detection (scipy ``solve_ivp(events=…)``
        parity, ``scipy/integrate/_ivp/ivp.py:29-158``); supported by the
        ``bdf`` solver. The event functions receive ``(t, y)``; close over
        ``p`` for parameter-dependent thresholds.

        ``dense_output=True`` (``bdf`` only) additionally records each
        accepted step's interpolant into the result's ``seg_*`` buffers;
        wrap with :class:`tpusysbio.solvers.OdeSolution` for a post-hoc
        continuous solution evaluable at arbitrary times (scipy
        ``solve_ivp(dense_output=True)`` analogue,
        ``scipy/integrate/_ivp/common.py:137``).

        Decreasing ``t_span`` (backward integration, the
        ``odeint``/``solve_ivp`` direction contract) is handled by TIME
        REFLECTION: the steppers themselves are forward-only by design
        (solvers/bdf.py module note), so ``τ = t0 − t`` with
        ``dy/dτ = −f(t0−τ, y)`` runs the same forward machinery; pass
        ``t_eval`` DECREASING from t0 to t1, rows align with it.
        ``events``/``dense_output`` are forward-only (reflected event
        direction semantics would be a silent trap — raise instead)."""
        from tpusysbio import solvers

        config = config or SolverConfig()
        p = jnp.asarray(p)
        if float(t_span[1]) < float(t_span[0]):
            if events is not None or dense_output:
                raise ValueError(
                    "backward t_span does not support events/dense_output")
            res = self._reflected(float(t_span[0])).simulate(
                p, (0.0, float(t_span[0]) - float(t_span[1])),
                float(t_span[0]) - jnp.asarray(t_eval),
                solver=solver, config=config)
            return res._replace(t_final=float(t_span[0]) - res.t_final)
        fn = solvers.SOLVERS[solver]
        y0 = self.y0(p)
        jac = (None if self.rhs_jac is None
               else (lambda t, y: self.rhs_jac(t, y, p.astype(y.dtype))))
        kw = {} if events is None else dict(events=events)
        if dense_output:
            if solver != "bdf":
                raise ValueError(
                    "dense_output=True is supported by the 'bdf' solver")
            kw["dense_export"] = True
        return fn(lambda t, y: self.rhs(t, y, p.astype(y.dtype)), t_span,
                  y0, t_eval, config=config, jac=jac, **kw)

    def _reflected(self, t0: float) -> "OdeModel":
        """The time-reflected system ``τ = t0 − t``: forward integration
        of the reflected model IS backward integration of this one."""
        return dataclasses.replace(
            self,
            rhs=lambda tau, y, p: -self.rhs(t0 - tau, y, p),
            rhs_jac=(None if self.rhs_jac is None else
                     (lambda tau, y, p: -self.rhs_jac(t0 - tau, y, p))),
            rhs_sens=(None if self.rhs_sens is None else
                      (lambda tau, y, S, p:
                       -self.rhs_sens(t0 - tau, y, S, p))),
            rhs_sens_dir=(None if self.rhs_sens_dir is None else
                          (lambda tau, y, S, p, C:
                           -self.rhs_sens_dir(t0 - tau, y, S, p, C))))

    def simulate_sensitivities(self, p, t_span, t_eval, solver: str = "bdf",
                               config: Optional[SolverConfig] = None,
                               dense_output: bool = False):
        """Trajectory + forward sensitivities dy/dp at ``t_eval``
        (reference ``simulate_sensitivities``, SURVEY.md §3.3).

        ``dense_output=True`` (``bdf`` only): see :meth:`simulate` — the
        exported interpolant carries the sensitivity columns too
        (``OdeSolution.sens``). Decreasing ``t_span`` integrates backward
        by time reflection (see :meth:`simulate`; the sensitivity RHS
        reflects with the state RHS)."""
        from tpusysbio import solvers
        from tpusysbio.sens import make_sens_rhs

        config = config or SolverConfig()
        p = jnp.asarray(p)
        if float(t_span[1]) < float(t_span[0]):
            if dense_output:
                raise ValueError(
                    "backward t_span does not support dense_output")
            res = self._reflected(
                float(t_span[0])).simulate_sensitivities(
                p, (0.0, float(t_span[0]) - float(t_span[1])),
                float(t_span[0]) - jnp.asarray(t_eval),
                solver=solver, config=config)
            return res._replace(t_final=float(t_span[0]) - res.t_final)
        fn = solvers.SOLVERS[solver]
        y0 = self.y0(p)
        s0 = jax.jacfwd(self.y0)(p)
        if self.rhs_sens is not None:
            sens_rhs = lambda t, y, S: self.rhs_sens(t, y, S, p)  # noqa: E731
        else:
            sens_rhs = make_sens_rhs(self.rhs, p)
        jac = (None if self.rhs_jac is None
               else (lambda t, y: self.rhs_jac(t, y, p.astype(y.dtype))))
        kw = {}
        if dense_output:
            if solver != "bdf":
                raise ValueError(
                    "dense_output=True is supported by the 'bdf' solver")
            kw["dense_export"] = True
        return fn(lambda t, y: self.rhs(t, y, p.astype(y.dtype)), t_span,
                  y0, t_eval, config=config, sens_rhs=sens_rhs, s0=s0,
                  jac=jac, **kw)

    def jacobian(self, t, y, p):
        """State Jacobian ∂f/∂y via forward-mode AD."""
        return jax.jacfwd(lambda yy: self.rhs(t, yy, p))(y)
