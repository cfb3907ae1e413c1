"""The ``Project``: stacked weighted residuals and sensitivity Jacobians
across a multi-experiment ensemble (SURVEY.md §2 #7, §3.1).

Pipeline (all inside one jit, vmapped over experiments):

1. θ (log space) -> per-experiment model parameters (mapping.py),
2. integrate every experiment — states + forward sensitivities w.r.t. the
   experiment's model parameters ride one column-block BDF solve
   (solvers/bdf.py), dense output at the experiment's measurement grid,
3. observables + their parameter sensitivities via ``jax.jvp`` chain rule,
4. gather at measurement (time, observable) indices — one static gather;
   steady-state rows (``Measurement(steady_state=True)``) gather instead
   from the experiment's algebraic equilibrium, solved by damped Newton
   with implicit-function-theorem sensitivities
   (solvers/steady_state.py) — never by integrating to a long horizon,
5. project-level scale factors B per measurement group with analytic dB/dθ
   (scale_factors.py),
6. residuals ``mask · (B·sim − data)/σ`` and Jacobian
   ``mask · (B·dsim + sim·dB)/σ`` with the log-transform factor folded in
   by the mapping chain (dp/dθ = p).

The residual Jacobian is exact given exact trajectory sensitivities — the
autodiff chain replaces the reference's hand-assembled chain rule
(SURVEY.md §3.1 lower frames).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpusysbio.config import SolverConfig
from tpusysbio.data import ExperimentBatch
from tpusysbio.model.core import OdeModel
from tpusysbio.project.mapping import ParameterMap
from tpusysbio.project.scale_factors import (
    scale_factors as _scale_factors,
    scale_factors_and_grad as _scale_factors_and_grad,
)
from tpusysbio.sens import make_sens_rhs, make_sens_rhs_dir
from tpusysbio import solvers


class ProjectEval(NamedTuple):
    """Full evaluation record (observability: SURVEY.md §5 metrics)."""

    residuals: jax.Array          # (R,)
    jacobian: Optional[jax.Array]  # (R, G) or None
    cost: jax.Array               # 0.5 * sum(r^2)
    scale: jax.Array              # (n_groups,) fitted scale factors
    status: jax.Array             # (E,) per-experiment solver status
    nsteps: jax.Array             # (E,)


@dataclasses.dataclass(frozen=True)
class Project:
    """Objective assembly over an experiment batch.

    ``residuals(θ)`` and ``residuals_and_jacobian(θ)`` are pure jittable
    functions of θ — hand them to the LM optimizer (optim/lm.py) or vmap
    them over a multi-start axis (fit/multistart.py).
    """

    model: OdeModel
    pmap: ParameterMap
    batch: ExperimentBatch
    solver: str = "bdf"
    config: SolverConfig = SolverConfig()
    # Optional 1-D mesh for experiment-axis sharding (the EP analogue,
    # SURVEY.md §2c): heterogeneous experiments/conditions integrate on
    # different chips; the scale-factor segment sums become the only
    # cross-chip collectives, inserted automatically by XLA.
    experiment_mesh: Optional[object] = None
    # Steady-state rows: coarse relaxation horizon seeding the equilibrium
    # Newton solve (solvers/steady_state.py); used only when the batch has
    # ``steady_state=True`` measurements.
    ss_t_relax: float = 10.0
    ss_max_newton: int = 25
    # Sensitivity column space: 'params' propagates all P model-parameter
    # columns and chains to θ afterwards (the reference's augmented-system
    # shape); 'theta' moves the chain rule INSIDE the integrator and
    # propagates only the G fit-parameter columns — for G ≪ P (EGFR: 13
    # fit parameters over ~150 rate constants; the MAPK headline: 13 over
    # 31) the Newton column block shrinks by P/G at identical math.
    # 'auto' picks 'theta' whenever G < P.
    sens_mode: str = "auto"

    @property
    def n_residuals(self) -> int:
        return self.batch.n_residuals

    @property
    def n_theta(self) -> int:
        return self.pmap.n_global

    # ------------------------------------------------------------------
    def _solver_fn(self):
        return solvers.SOLVERS[self.solver]

    @property
    def _theta_sens(self) -> bool:
        if self.sens_mode == "theta":
            return True
        if self.sens_mode == "params":
            return False
        if self.sens_mode != "auto":
            raise ValueError(f"unknown sens_mode {self.sens_mode!r}")
        return self.pmap.n_global < self.model.n_params

    def _sim_one(self, p_e, t0, t_end, t_eval, has_ss, with_sens: bool,
                 C_e=None):
        """Simulate one experiment. With ``C_e`` (P, G) — the parameter
        chain dp/dθ — sensitivities are propagated directly in θ space
        (G columns); otherwise in model-parameter space (P columns)."""
        model = self.model
        solve = self._solver_fn()
        y0 = model.y0(p_e)
        theta_sens = C_e is not None

        def f(t, y):
            # dtype-following: enables the stepper's mixed-precision mode
            return model.rhs(t, y, p_e.astype(y.dtype))

        jac = (None if model.rhs_jac is None
               else (lambda t, y: model.rhs_jac(t, y,
                                                p_e.astype(y.dtype))))
        if with_sens:
            if theta_sens:
                if model.rhs_sens_dir is not None:
                    sens_rhs = lambda t, y, S: model.rhs_sens_dir(  # noqa: E731
                        t, y, S, p_e, C_e)
                else:
                    sens_rhs = make_sens_rhs_dir(model.rhs, p_e, C_e)
                s0 = jax.jacfwd(model.y0)(p_e) @ C_e
            else:
                if model.rhs_sens is not None:
                    sens_rhs = lambda t, y, S: model.rhs_sens(  # noqa: E731
                        t, y, S, p_e)
                else:
                    sens_rhs = make_sens_rhs(model.rhs, p_e)
                s0 = jax.jacfwd(model.y0)(p_e)
            res = solve(f, (t0, t_end), y0, t_eval, config=self.config,
                        sens_rhs=sens_rhs, s0=s0, jac=jac)
        else:
            res = solve(f, (t0, t_end), y0, t_eval, config=self.config,
                        jac=jac)

        # observables g(y, p) and their total parameter derivative
        def obs(y):
            return model.observables(y, p_e)

        obs_traj = jax.vmap(obs)(res.ys)  # (T, n_obs)

        if with_sens:
            P = p_e.shape[0]
            # parameter directions per sensitivity column: dp/dθ columns
            # in θ mode, the identity in params mode
            dirs = C_e if theta_sens else jnp.eye(P, dtype=p_e.dtype)

            def obs_dcol(y, s_col, c_col):
                return jax.jvp(lambda yy, pp: model.observables(yy, pp),
                               (y, p_e), (s_col, c_col))[1]

            # vmap over time, then over sensitivity columns
            def per_t(y, S):
                return jax.vmap(obs_dcol, in_axes=(None, 1, 1),
                                out_axes=1)(y, S, dirs)

            obs_sens = jax.vmap(per_t)(res.ys, res.sens)  # (T, n_obs, G|P)
        else:
            obs_sens = None

        status = res.status
        if self.batch.has_steady:
            from tpusysbio.solvers.common import STATUS_SS_FAIL
            from tpusysbio.solvers.steady_state import steady_state

            ss = steady_state(
                model.rhs, p_e, y0, config=self.config,
                t_relax=self.ss_t_relax, max_newton=self.ss_max_newton,
                with_sens=with_sens, jac_fn=model.rhs_jac)
            obs_ss = model.observables(ss.y, p_e)  # (n_obs,)
            if with_sens:
                P = p_e.shape[0]
                dirs_ss = (C_e if theta_sens
                           else jnp.eye(P, dtype=p_e.dtype))
                # IFT sensitivities come back in model-parameter space;
                # chain to θ columns in theta mode
                ss_sens = (ss.sens @ C_e) if theta_sens else ss.sens

                def obs_ss_dcol(s_col, c_col):
                    return jax.jvp(
                        lambda yy, pp: model.observables(yy, pp),
                        (ss.y, p_e), (s_col, c_col))[1]

                obs_ss_sens = jax.vmap(obs_ss_dcol, in_axes=(1, 1),
                                       out_axes=1)(ss_sens, dirs_ss)
            else:
                obs_ss_sens = None
            # Only experiments that actually have steady-state rows can be
            # failed by a non-converged equilibrium solve: a timecourse-only
            # experiment in the same batch (the solve still runs for it —
            # under vmap a cond is a select, so gating the solve buys
            # nothing) must not inherit STATUS_SS_FAIL from a solve whose
            # result it never reads.
            status = jnp.where(has_ss & ~ss.converged, STATUS_SS_FAIL,
                               status)
        else:
            obs_ss, obs_ss_sens = None, None
        return (obs_traj, obs_sens, obs_ss, obs_ss_sens, status,
                res.nsteps)

    # ------------------------------------------------------------------
    def _gathered(self, theta, with_jac: bool):
        b = self.batch
        p_all = self.pmap.expand(theta)  # (E, P)
        if self.experiment_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = self.experiment_mesh.axis_names[0]
            sh = NamedSharding(self.experiment_mesh, PartitionSpec(axis))
            p_all = jax.lax.with_sharding_constraint(p_all, sh)

        theta_mode = with_jac and self._theta_sens
        has_ss_e = b.m_is_ss.any(axis=1)  # (E,) experiments with SS rows
        if theta_mode:
            chain = self.pmap.chain(theta)  # (E, P, G) = dp/dθ rows
            sim_fn = lambda p_e, t0, t_end, t_eval, has_ss, C_e: \
                self._sim_one(p_e, t0, t_end, t_eval, has_ss,
                              with_sens=True, C_e=C_e)  # noqa: E731
            (obs_traj, obs_sens, obs_ss, obs_ss_sens, status,
             nsteps) = jax.vmap(sim_fn)(p_all, b.t0, b.t_end, b.t_eval,
                                        has_ss_e, chain)
        else:
            sim_fn = lambda p_e, t0, t_end, t_eval, has_ss: self._sim_one(  # noqa: E731
                p_e, t0, t_end, t_eval, has_ss, with_sens=with_jac)
            (obs_traj, obs_sens, obs_ss, obs_ss_sens, status,
             nsteps) = jax.vmap(sim_fn)(p_all, b.t0, b.t_end, b.t_eval,
                                        has_ss_e)

        # gather at measurement (time, observable) indices, per experiment;
        # steady-state rows gather from the equilibrium observables instead
        def gather(traj, t_idx, o_idx):
            return traj[t_idx, o_idx]

        sim = jax.vmap(gather)(obs_traj, b.m_t_idx, b.m_obs)  # (E, M)
        if b.has_steady:
            sim_ss = jax.vmap(lambda o_ss, o_idx: o_ss[o_idx])(
                obs_ss, b.m_obs)
            sim = jnp.where(b.m_is_ss, sim_ss, sim)

        if with_jac:
            def gather_s(traj_s, t_idx, o_idx):
                return traj_s[t_idx, o_idx, :]  # (M, G|P)

            dsim_p = jax.vmap(gather_s)(obs_sens, b.m_t_idx, b.m_obs)
            if b.has_steady:
                dsim_ss = jax.vmap(lambda s_ss, o_idx: s_ss[o_idx, :])(
                    obs_ss_sens, b.m_obs)
                dsim_p = jnp.where(b.m_is_ss[:, :, None], dsim_ss, dsim_p)
            if theta_mode:
                # columns already ARE dθ derivatives (chain rule applied
                # inside the integrator)
                dsim = dsim_p
            else:
                # chain to θ (log transform folded in): (E,M,P) @ (E,P,G)
                chain = self.pmap.chain(theta)
                dsim = jnp.einsum("emp,epg->emg", dsim_p, chain)
        else:
            dsim = None
        return sim, dsim, status, nsteps

    # ------------------------------------------------------------------
    def evaluate(self, theta, with_jac: bool = False) -> ProjectEval:
        b = self.batch
        sim_em, dsim_emg, status, nsteps = self._gathered(theta, with_jac)
        R = b.n_residuals
        sim = sim_em.reshape(R)
        data = b.values.reshape(R)
        sigma = b.sigmas.reshape(R)
        group = b.group.reshape(R)
        mask = b.mask.reshape(R)
        inv_var = 1.0 / (sigma * sigma)
        inv_sig = jnp.where(mask, 1.0 / sigma, 0.0)

        if with_jac:
            dsim = dsim_emg.reshape(R, self.n_theta)
            if b.n_groups:
                B, dB = _scale_factors_and_grad(
                    sim, dsim, data, inv_var, group, mask, b.n_groups)
            else:
                B = jnp.ones((1,), theta.dtype)
                dB = jnp.zeros((1, self.n_theta), theta.dtype)
            gclip = jnp.clip(group, 0, None)
            B_row = jnp.where(group >= 0, B[gclip], 1.0)
            dB_row = jnp.where((group >= 0)[:, None], dB[gclip], 0.0)
            r = inv_sig * (B_row * sim - data)
            J = inv_sig[:, None] * (B_row[:, None] * dsim
                                    + sim[:, None] * dB_row)
        else:
            if b.n_groups:
                B = _scale_factors(sim, data, inv_var, group, mask,
                                   b.n_groups)
            else:
                B = jnp.ones((1,), theta.dtype)
            gclip = jnp.clip(group, 0, None)
            B_row = jnp.where(group >= 0, B[gclip], 1.0)
            r = inv_sig * (B_row * sim - data)
            J = None

        cost = 0.5 * jnp.sum(r * r)
        return ProjectEval(residuals=r, jacobian=J, cost=cost, scale=B,
                           status=status, nsteps=nsteps)

    # convenience closures -------------------------------------------------
    def residuals(self, theta) -> jax.Array:
        return self.evaluate(theta, with_jac=False).residuals

    def residuals_and_jacobian(self, theta):
        ev = self.evaluate(theta, with_jac=True)
        return ev.residuals, ev.jacobian

    def cost(self, theta) -> jax.Array:
        return self.evaluate(theta, with_jac=False).cost
