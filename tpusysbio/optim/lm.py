"""Jitted Levenberg–Marquardt with Marquardt diagonal scaling.

Algorithm: damped normal equations with trust-region-style λ adaptation
(Moré's LM as in MINPACK ``lmder`` — SURVEY.md §2 #13 — with the gain-ratio
λ update of Nielsen/Madsen instead of MINPACK's internal Δ bookkeeping;
termination tests follow ``scipy.optimize.least_squares``:
``scipy/optimize/_lsq/common.py:check_termination``).

TPU-native design decisions:
- The whole fit is ONE ``lax.while_loop`` (SURVEY.md §3.1 rebuild: LM outer
  ∘ BDF inner, zero host boundaries). Each iteration: one trial-residual
  integration; on acceptance one sensitivity integration for the fresh
  Jacobian (under ``lax.cond`` so an unbatched fit skips it when rejected).
- The LM step solves the *damped normal equations*
  ``(JᵀJ + λ·diag(JᵀJ)) δ = −Jᵀr`` with the in-house pivoted LU — in f64
  this is accurate for the P ≲ 200 parameter counts of this domain and,
  unlike the SVD subproblem (``scipy/optimize/_lsq/common.py:57``), it
  needs no LAPACK SVD (f64-broken on this TPU) and vmaps as pure matmuls +
  LU, the lockstep-friendly shape for 10k-member multi-start ensembles.
- Parameters are in log space by construction (project/mapping.py), so box
  positivity bounds are already built in; explicit bounds are optional
  clipping.

Statuses: 0 = max_iter, 1 = gtol, 2 = ftol, 3 = xtol, -1 = non-finite at
the initial point (masked member).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tpusysbio.config import FitConfig
from tpusysbio.linalg import lu as _lu


class FitResult(NamedTuple):
    theta: jax.Array
    cost: jax.Array
    grad_norm: jax.Array       # inf-norm of Jᵀr at the solution
    status: jax.Array          # see module docstring
    n_iter: jax.Array
    nfev: jax.Array            # residual-only integrations
    njev: jax.Array            # residual+jacobian (sensitivity) integrations
    # accepted-cost trace per iteration (observability, SURVEY.md §5);
    # entries beyond n_iter hold the final cost
    cost_trace: jax.Array = None
    # (JᵀJ)⁻¹ at the optimum — the reference's ``cov_x`` from
    # scipy.optimize.leastsq (scipy/optimize/_minpack_py.py:482-501, there
    # assembled from the QR factors). Multiply by the residual variance
    # (see ``param_sigma``) for the parameter covariance. NaN/inf rows
    # signal a rank-deficient Jacobian (unidentifiable parameters).
    cov: jax.Array = None
    # per-parameter 1σ error bars: sqrt(diag(cov) · 2·cost/(m−p)), i.e.
    # cov_x scaled by the reduced chi-square as scipy.optimize.curve_fit
    # does with its leastsq cov_x.
    param_sigma: jax.Array = None

    @property
    def success(self):
        return self.status > 0


class _LMState(NamedTuple):
    theta: jax.Array
    r: jax.Array
    J: jax.Array
    cost: jax.Array
    lam: jax.Array
    nu: jax.Array
    status: jax.Array
    done: jax.Array
    n_iter: jax.Array
    nfev: jax.Array
    njev: jax.Array
    grad_norm: jax.Array
    cost_trace: jax.Array      # (max_iter,) accepted-cost history


def lm_init(
    residual_and_jac_fn: Callable,
    theta0: jax.Array,
    config: FitConfig = FitConfig(),
) -> _LMState:
    """Evaluate the initial point into a resumable LM state pytree.

    The state is a plain pytree: it can be checkpointed mid-fit and
    resumed (SURVEY.md §5 checkpoint: "in-flight LM state pytree"), or
    advanced in bounded chunks via ``lm_run`` to split long fits across
    device calls.
    """
    dtype = theta0.dtype
    r0, J0 = residual_and_jac_fn(theta0)
    cost0 = 0.5 * jnp.sum(r0 * r0)
    bad0 = ~(jnp.all(jnp.isfinite(r0)) & jnp.all(jnp.isfinite(J0)))

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    g0 = J0.T @ r0
    return _LMState(
        theta=theta0, r=r0, J=J0, cost=cost0,
        lam=jnp.asarray(config.lam0, dtype),
        nu=jnp.asarray(2.0, dtype),
        status=jnp.where(bad0, i32(-1), i32(0)),
        done=bad0, n_iter=i32(0), nfev=i32(0), njev=i32(1),
        grad_norm=jnp.max(jnp.abs(g0)),
        cost_trace=jnp.full((config.max_iter,), cost0, dtype))


def lm_finish(state: _LMState) -> FitResult:
    J, r = state.J, state.r
    m, p = J.shape
    cov = _lu.lu_solve(_lu.lu_factor(J.T @ J), jnp.eye(p, dtype=J.dtype))
    s_sq = (2.0 * state.cost / (m - p)) if m > p else jnp.asarray(
        jnp.inf, J.dtype)
    param_sigma = jnp.sqrt(jnp.clip(jnp.diag(cov), 0.0, None) * s_sq)
    return FitResult(
        theta=state.theta, cost=state.cost, grad_norm=state.grad_norm,
        status=state.status, n_iter=state.n_iter, nfev=state.nfev,
        njev=state.njev, cost_trace=state.cost_trace,
        cov=cov, param_sigma=param_sigma)


def lm_fit(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    theta0: jax.Array,
    config: FitConfig = FitConfig(),
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
) -> FitResult:
    """Minimize ``0.5 ||r(θ)||²`` from ``theta0``.

    Args:
      residual_fn: ``θ -> r`` (one plain integration pass).
      residual_and_jac_fn: ``θ -> (r, J)`` (one sensitivity pass) —
        J comes from forward sensitivities, never reverse-mode through the
        solver loop (SURVEY.md §7 M5).
      lower/upper: optional box bounds in θ (log) space; steps are clipped.
    """
    state = lm_init(residual_and_jac_fn, theta0, config)
    state = lm_run(residual_fn, residual_and_jac_fn, state, config,
                   iter_cap=config.max_iter, lower=lower, upper=upper)
    return lm_finish(state)


def lm_run(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    state: _LMState,
    config: FitConfig = FitConfig(),
    iter_cap: Optional[int] = None,
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
) -> _LMState:
    """Advance LM until done or ``state.n_iter`` reaches ``iter_cap``."""
    theta0 = state.theta
    dtype = theta0.dtype
    cap = config.max_iter if iter_cap is None else iter_cap

    def clip_theta(th):
        if lower is not None:
            th = jnp.maximum(th, lower)
        if upper is not None:
            th = jnp.minimum(th, upper)
        return th

    eps = jnp.finfo(dtype).eps

    def cond(st: _LMState):
        return ~st.done & (st.n_iter < cap)

    def body(st: _LMState) -> _LMState:
        A = st.J.T @ st.J
        g = st.J.T @ st.r
        diag = jnp.clip(jnp.diag(A), 1e-12, None)
        M = A + st.lam * jnp.diag(diag)
        delta = _lu.lu_solve(_lu.lu_factor(M), -g)

        theta_t = clip_theta(st.theta + delta)
        step = theta_t - st.theta
        if config.eval_mode == "lockstep":
            # one sensitivity integration yields residual AND Jacobian
            r_t, J_t = residual_and_jac_fn(theta_t)
            finite_t = jnp.all(jnp.isfinite(r_t)) & jnp.all(
                jnp.isfinite(J_t))
        else:
            r_t = residual_fn(theta_t)
            J_t = None
            finite_t = jnp.all(jnp.isfinite(r_t))
        cost_t = 0.5 * jnp.sum(r_t * r_t)

        # gain ratio: actual vs model reduction
        pred = 0.5 * (step @ (st.lam * diag * step - g))
        pred = jnp.maximum(pred, eps)
        rho = (st.cost - cost_t) / pred
        accept = finite_t & (cost_t < st.cost)

        # λ update (Nielsen): shrink on good gain, grow geometrically on
        # rejection
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.where(
            accept,
            jnp.clip(st.lam * shrink, config.lam_min, config.lam_max),
            jnp.clip(st.lam * st.nu, config.lam_min, config.lam_max))
        nu_new = jnp.where(accept, 2.0, st.nu * 2.0)

        if config.eval_mode == "lockstep":
            r_new = jnp.where(accept, r_t, st.r)
            J_new = jnp.where(accept, J_t, st.J)
        else:
            # fresh Jacobian only on acceptance
            def fresh():
                return residual_and_jac_fn(theta_t)

            def keep():
                return st.r, st.J

            r_new, J_new = lax.cond(accept, fresh, keep)
        theta_new = jnp.where(accept, theta_t, st.theta)
        cost_new = jnp.where(accept, cost_t, st.cost)
        if config.eval_mode == "lockstep":
            njev = st.njev + 1
            nfev_inc = 0
        else:
            njev = st.njev + jnp.where(accept, 1, 0)
            nfev_inc = 1

        g_new = J_new.T @ r_new
        g_norm = jnp.max(jnp.abs(g_new))

        # termination (scipy/optimize/_lsq/common.py:705 semantics)
        dcost = st.cost - cost_t
        ftol_hit = accept & (dcost < config.ftol * st.cost)
        # MINPACK info=1 semantics (lmder): stop when BOTH the actual and
        # the PREDICTED relative reduction are below ftol with a sane gain
        # ratio — evaluated even on rejected trials, so a fit in a flat
        # valley terminates where the reference's leastsq does instead of
        # crawling until max_iter (scipy/optimize/_minpack_py.py ier=1).
        flat_hit = (finite_t
                    & (jnp.abs(dcost) <= config.ftol * st.cost)
                    & (pred <= config.ftol * st.cost)
                    & (rho <= 2.0))
        xtol_hit = accept & (
            jnp.linalg.norm(step)
            < config.xtol * (config.xtol + jnp.linalg.norm(st.theta)))
        gtol_hit = g_norm < config.gtol
        # a rejected step at λ_max cannot make progress -> xtol-style stop
        stuck = ~accept & (st.lam >= config.lam_max)

        status = jnp.where(
            gtol_hit, 1,
            jnp.where(ftol_hit | flat_hit, 2,
                      jnp.where(xtol_hit | stuck, 3, 0))).astype(jnp.int32)
        done = status > 0

        trace = st.cost_trace.at[st.n_iter].set(cost_new)
        return _LMState(
            theta=theta_new, r=r_new, J=J_new, cost=cost_new,
            lam=lam_new, nu=nu_new, status=status, done=done,
            n_iter=st.n_iter + 1, nfev=st.nfev + nfev_inc, njev=njev,
            grad_norm=g_norm, cost_trace=trace)

    return lax.while_loop(cond, body, state)


LMState = _LMState
