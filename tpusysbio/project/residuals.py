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
    # Optional log-normal priors on parameters / scale factors, appended
    # as extra least-squares rows (project/priors.py) — the reference's
    # regularized-fit mode.
    priors: Optional["Priors"] = None  # noqa: F821

    @property
    def n_residuals(self) -> int:
        extra = self.priors.n_rows if self.priors is not None else 0
        return self.batch.n_residuals + extra

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

    def _make_seg_fns(self, p_k, C_e, dirs_k, with_sens: bool):
        """RHS / Jacobian / sensitivity-RHS closures for ONE parameter
        vector ``p_k`` (one segment's effective parameters). ``dirs_k``
        (P,) zeroes the direction of parameters clamped to constants in
        this segment (their dp_k/dp vanishes while clamped); None means
        no clamping (the single-segment fast path keeps the closed-form
        full-column ``rhs_sens`` when available)."""
        model = self.model
        theta_sens = C_e is not None

        def f(t, y):
            # dtype-following: enables the stepper's mixed-precision mode
            return model.rhs(t, y, p_k.astype(y.dtype))

        jac = (None if model.rhs_jac is None
               else (lambda t, y: model.rhs_jac(t, y,
                                                p_k.astype(y.dtype))))
        if not with_sens:
            return f, jac, None
        if theta_sens:
            C_k = C_e if dirs_k is None else C_e * dirs_k[:, None]
            if model.rhs_sens_dir is not None:
                sens_rhs = lambda t, y, S: model.rhs_sens_dir(  # noqa: E731
                    t, y, S, p_k, C_k)
            else:
                sens_rhs = make_sens_rhs_dir(model.rhs, p_k, C_k)
        elif dirs_k is None:
            if model.rhs_sens is not None:
                sens_rhs = lambda t, y, S: model.rhs_sens(  # noqa: E731
                    t, y, S, p_k)
            else:
                sens_rhs = make_sens_rhs(model.rhs, p_k)
        else:
            # params mode with clamped parameters: full P columns, but
            # clamped directions contribute no ∂f/∂p term this segment
            C_k = jnp.diag(dirs_k)
            if model.rhs_sens_dir is not None:
                sens_rhs = lambda t, y, S: model.rhs_sens_dir(  # noqa: E731
                    t, y, S, p_k, C_k)
            else:
                sens_rhs = make_sens_rhs_dir(model.rhs, p_k, C_k)
        return f, jac, sens_rhs

    def _sim_one(self, p_e, t0, t_end, t_eval, has_ss, with_sens: bool,
                 C_e=None, segs=None, preeq=None, y0_over=None):
        """Simulate one experiment. With ``C_e`` (P, G) — the parameter
        chain dp/dθ — sensitivities are propagated directly in θ space
        (G columns); otherwise in model-parameter space (P columns).

        ``segs = (bounds (S+1,), mask (S, P), vals (S, P))`` integrates
        segment-by-segment across the experiment's timed perturbations
        (``Experiment.inputs``): state and sensitivity columns carry over
        each static boundary (y and S are continuous — perturbation
        values are constants), clamped parameters' direction columns are
        zeroed while clamped, and padded zero-length segments no-op.

        ``preeq = (flag, mask (P,), vals (P,))`` replaces y0 with the
        steady state under basal parameters and chains the IFT dy*/dp
        into the sensitivity initial condition (``Experiment
        .preequilibrate``)."""
        model = self.model
        solve = self._solver_fn()
        theta_sens = C_e is not None
        P = p_e.shape[0]

        if segs is not None:
            bounds, smask, svals = segs[:3]
            seg_y0 = segs[3:] if len(segs) > 3 else None
            p0_eff = jnp.where(smask[0], svals[0], p_e)
            dirs0 = (~smask[0]).astype(p_e.dtype)
        else:
            p0_eff, dirs0 = p_e, None

        y0 = model.y0(p0_eff)
        s0 = None
        if with_sens:
            dy0 = jax.jacfwd(model.y0)(p0_eff)  # (n, P)
            if dirs0 is not None:
                dy0 = dy0 * dirs0[None, :]
            s0 = dy0 @ C_e if theta_sens else dy0

        preeq_status_fail = None
        if preeq is not None:
            from tpusysbio.solvers.common import STATUS_SS_FAIL
            from tpusysbio.solvers.steady_state import steady_state

            pre_flag, pre_mask, pre_vals = preeq
            p_basal = jnp.where(pre_mask, pre_vals, p_e)
            ss0 = steady_state(
                model.rhs, p_basal, model.y0(p_basal), config=self.config,
                t_relax=self.ss_t_relax, max_newton=self.ss_max_newton,
                with_sens=with_sens, jac_fn=model.rhs_jac)
            y0 = jnp.where(pre_flag, ss0.y, y0)
            if with_sens:
                # IFT dy*/dp in model-parameter space; basal-clamped
                # parameters are constants, so their columns vanish
                s_pre = ss0.sens * (~pre_mask).astype(ss0.sens.dtype)
                if theta_sens:
                    s_pre = s_pre @ C_e
                s0 = jnp.where(pre_flag, s_pre, s0)
            preeq_status_fail = pre_flag & ~ss0.converged

        if y0_over is not None:
            # initial-VALUE overrides (PEtab condition-table species
            # columns): applied after y0(p) AND after pre-equilibration —
            # non-overridden species keep the preeq steady state,
            # overridden ones reset to the condition's value. A constant
            # start has zero parameter sensitivity.
            yo_mask, yo_vals = y0_over
            y0 = jnp.where(yo_mask, yo_vals, y0)
            if with_sens:
                s0 = s0 * (~yo_mask)[:, None].astype(s0.dtype)

        if segs is None:
            f, jac, sens_rhs = self._make_seg_fns(p_e, C_e, None,
                                                  with_sens)
            if with_sens:
                res = solve(f, (t0, t_end), y0, t_eval,
                            config=self.config, sens_rhs=sens_rhs, s0=s0,
                            jac=jac)
            else:
                res = solve(f, (t0, t_end), y0, t_eval,
                            config=self.config, jac=jac)
        else:
            res = self._sim_segments(p_e, bounds, smask, svals, t_eval,
                                     y0, s0, C_e, with_sens, solve,
                                     seg_y0=seg_y0)

        # observables g(y, p) and their total parameter derivative;
        # evaluated with the BASE parameter vector (perturbations change
        # the dynamics; the observation map stays the experiment's own)
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
        if preeq_status_fail is not None:
            from tpusysbio.solvers.common import STATUS_SS_FAIL

            status = jnp.where(preeq_status_fail, STATUS_SS_FAIL, status)
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
    def _sim_segments(self, p_e, bounds, smask, svals, t_eval, y0, s0,
                      C_e, with_sens: bool, solve, seg_y0=None):
        """Piecewise integration across static segment boundaries (the
        events-analogue; spec the reference stack meets with solve_ivp
        events + restarts, ``scipy/integrate/_ivp/ivp.py:29-158``).

        The segment COUNT is static (a Python loop over S solver calls
        inside one jit); the boundaries are traced per experiment, so a
        vmapped batch integrates heterogeneous event schedules in
        lockstep, and experiments with fewer events no-op their padded
        zero-length trailing segments (solvers/common.status_init)."""
        from tpusysbio.solvers.common import (STATUS_DONE, IntegrateResult)

        S = smask.shape[0]
        n = y0.shape[0]
        dtype = y0.dtype
        T = t_eval.shape[0]
        m = s0.shape[1] if with_sens else 0
        ys_tot = jnp.zeros((T, n), dtype)
        sens_tot = jnp.zeros((T, n, m), dtype)
        y_c, s_c = y0, s0
        status = None
        counters = None
        for k in range(S):
            t_lo, t_hi = bounds[k], bounds[k + 1]
            if seg_y0 is not None:
                # one-shot timed STATE assignment at this boundary
                # (Experiment.input_states — bolus dose / reset): the
                # carried state is SET where masked; the assigned rows'
                # sensitivity resets to zero (a constant start)
                sy_mask, sy_vals = seg_y0
                y_c = jnp.where(sy_mask[k], sy_vals[k], y_c)
                if with_sens:
                    s_c = s_c * (~sy_mask[k])[:, None].astype(s_c.dtype)
            p_k = jnp.where(smask[k], svals[k], p_e)
            dirs_k = (~smask[k]).astype(p_e.dtype)
            f, jac, sens_rhs = self._make_seg_fns(p_k, C_e, dirs_k,
                                                  with_sens)
            if with_sens:
                res = solve(f, (t_lo, t_hi), y_c, t_eval,
                            config=self.config, sens_rhs=sens_rhs,
                            s0=s_c, jac=jac)
            else:
                res = solve(f, (t_lo, t_hi), y_c, t_eval,
                            config=self.config, jac=jac)
            # the solver fills t_eval points in [t_lo, t_hi] only (t_lo
            # via the at-t0 prefill); boundary points are written by both
            # adjoining segments with the SAME carried state
            filled = (t_eval >= t_lo) & (t_eval <= t_hi)
            ys_tot = jnp.where(filled[:, None], res.ys, ys_tot)
            if with_sens:
                sens_tot = jnp.where(filled[:, None, None],
                                     res.sens.astype(dtype), sens_tot)
            # continuity across the boundary: state and sensitivity
            # columns carry over (perturbation values are constants, so
            # y(e+) = y(e-) and S(e+) = S(e-))
            y_c = res.y_final[:, 0]
            if with_sens:
                s_c = res.y_final[:, 1:]
            # first failure wins; zero-length segments report DONE
            status = (res.status if status is None else
                      jnp.where(status == STATUS_DONE, res.status, status))
            cs = (res.nsteps, res.naccepted, res.nrejected, res.nfev,
                  res.njev, res.nlu, res.order_hist)
            counters = cs if counters is None else tuple(
                a + b for a, b in zip(counters, cs))
        return IntegrateResult(
            ys=ys_tot, sens=sens_tot, status=status, nsteps=counters[0],
            naccepted=counters[1], nrejected=counters[2],
            nfev=counters[3], njev=counters[4], nlu=counters[5],
            order_hist=counters[6], t_final=bounds[-1],
            y_final=jnp.concatenate(
                [y_c[:, None]] + ([s_c] if with_sens else []), axis=1))

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
        args = [p_all, b.t0, b.t_end, b.t_eval, has_ss_e]
        if theta_mode:
            args.append(self.pmap.chain(theta))  # (E, P, G) = dp/dθ rows
        has_segs = b.seg_bounds is not None
        has_seg_y0 = b.seg_y0_mask is not None
        n_seg_args = 3 + 2 * int(has_seg_y0)
        if has_segs:
            args += [b.seg_bounds, b.seg_mask, b.seg_vals]
            if has_seg_y0:
                args += [b.seg_y0_mask, b.seg_y0_vals]
        if b.has_preeq:
            args += [b.preeq, b.preeq_mask, b.preeq_vals]
        if b.has_y0_over:
            args += [b.y0_mask, b.y0_vals]

        def sim_fn(*a):
            i = 5
            C_e = a[i] if theta_mode else None
            i += int(theta_mode)
            segs = tuple(a[i:i + n_seg_args]) if has_segs else None
            i += n_seg_args * int(has_segs)
            preeq = tuple(a[i:i + 3]) if b.has_preeq else None
            i += 3 * int(b.has_preeq)
            y0_over = tuple(a[i:i + 2]) if b.has_y0_over else None
            return self._sim_one(a[0], a[1], a[2], a[3], a[4],
                                 with_sens=with_jac, C_e=C_e, segs=segs,
                                 preeq=preeq, y0_over=y0_over)

        (obs_traj, obs_sens, obs_ss, obs_ss_sens, status,
         nsteps) = jax.vmap(sim_fn)(*args)

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
            if self.priors is not None:
                r_p, J_p = self.priors.rows(theta, B, dB)
                r = jnp.concatenate([r, r_p])
                J = jnp.concatenate([J, J_p], axis=0)
        else:
            if b.n_groups:
                B = _scale_factors(sim, data, inv_var, group, mask,
                                   b.n_groups)
            else:
                B = jnp.ones((1,), theta.dtype)
            gclip = jnp.clip(group, 0, None)
            B_row = jnp.where(group >= 0, B[gclip], 1.0)
            r = inv_sig * (B_row * sim - data)
            if self.priors is not None:
                r_p, _ = self.priors.rows(theta, B)
                r = jnp.concatenate([r, r_p])
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
