"""Bounded least squares: Coleman–Li scaled trust-region (TRF-style).

Spec: ``scipy/optimize/_lsq/trf.py`` (SURVEY.md §3.5) — the Coleman–Li
scaling vector ``v`` (``scipy/optimize/_lsq/common.py:CL_scaling_vector``)
turns the bound-constrained problem into an unconstrained one in scaled
variables, with first-order optimality measured by ``‖v·g‖∞``.

TPU-native deviation, by design: SciPy solves the trust-region subproblem
by SVD (common.py:57); XLA's f64 SVD is unavailable on this TPU
(SURVEY.md §7), so the subproblem here is the λ-damped scaled normal
equations solved with the in-house LU — Levenberg–Marquardt damping plays
the role of the trust radius (same stationary points, same Coleman–Li
optimality measure, different path). Steps are truncated to the strict
interior with the standard (1 − θ) back-off.

Everything is one ``lax.while_loop``, vmappable over multi-start
ensembles like ``lm_fit``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpusysbio.config import FitConfig
from tpusysbio.linalg import lu as _lu
from tpusysbio.optim.lm import FitResult
from tpusysbio.optim.loss import make_loss


class _TRFState(NamedTuple):
    x: jax.Array
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
    cost_trace: jax.Array     # (max_iter,) accepted-cost history


def _cl_scaling(x, g, lb, ub):
    """Coleman-Li v and dv/dx (scipy/optimize/_lsq/common.py)."""
    v = jnp.ones_like(x)
    dv = jnp.zeros_like(x)
    neg = (g < 0) & jnp.isfinite(ub)
    v = jnp.where(neg, ub - x, v)
    dv = jnp.where(neg, -1.0, dv)
    pos = (g > 0) & jnp.isfinite(lb)
    v = jnp.where(pos, x - lb, v)
    dv = jnp.where(pos, 1.0, dv)
    return v, dv


def _interior_fn(lb, ub):
    def interior(x):
        span = jnp.where(jnp.isfinite(ub - lb), ub - lb, 1.0)
        pad = 1e-10 * jnp.maximum(1.0, jnp.abs(span))
        x = jnp.where(jnp.isfinite(lb), jnp.maximum(x, lb + pad), x)
        x = jnp.where(jnp.isfinite(ub), jnp.minimum(x, ub - pad), x)
        return x

    return interior


def _eval_fns(residual_fn, residual_and_jac_fn, loss, f_scale):
    cost_fn, scale_fn = make_loss(loss, f_scale)

    def eval_rj(x):
        r, J = residual_and_jac_fn(x)
        bad = ~(jnp.all(jnp.isfinite(r)) & jnp.all(jnp.isfinite(J)))
        c = 0.5 * jnp.sum(r * r) if cost_fn is None else cost_fn(r)
        if scale_fn is not None:
            r, J = scale_fn(r, J)
        return r, J, c, bad

    def eval_r(x):
        if residual_fn is None:
            return None
        r = residual_fn(x)
        c = 0.5 * jnp.sum(r * r) if cost_fn is None else cost_fn(r)
        return c, jnp.all(jnp.isfinite(r))

    return eval_rj, eval_r


def trf_init(
    residual_and_jac_fn: Callable,
    theta0: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    config: FitConfig = FitConfig(),
    loss: str = "linear",
    f_scale: float = 1.0,
) -> _TRFState:
    """Evaluate the initial point into a resumable TRF state pytree —
    same contract as ``optim.lm.lm_init`` (checkpointable, advanceable in
    bounded chunks via ``trf_run``), which is what lets the two-phase
    multi-start driver run a BOUNDED polish under ``iter_chunk``."""
    dtype = theta0.dtype
    lb = jnp.asarray(lower, dtype)
    ub = jnp.asarray(upper, dtype)
    interior = _interior_fn(lb, ub)
    eval_rj, _ = _eval_fns(None, residual_and_jac_fn, loss, f_scale)

    x0 = interior(theta0)
    r0, J0, cost0, bad0 = eval_rj(x0)

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    g0 = J0.T @ r0
    v0, _ = _cl_scaling(x0, g0, lb, ub)
    return _TRFState(
        x=x0, r=r0, J=J0, cost=cost0,
        lam=jnp.asarray(config.lam0, dtype), nu=jnp.asarray(2.0, dtype),
        status=jnp.where(bad0, i32(-1), i32(0)), done=bad0,
        n_iter=i32(0), nfev=i32(0), njev=i32(1),
        grad_norm=jnp.max(jnp.abs(v0 * g0)),
        cost_trace=jnp.full((config.max_iter,), cost0, dtype))


def trf_finish(state: _TRFState) -> FitResult:
    """Assemble a FitResult incl. the covariance channel (JᵀJ)⁻¹ at the
    final iterate — mirrors ``lm_finish``; for a robust loss the stored J
    is the robust-rescaled Jacobian, so (JᵀJ)⁻¹ is the Gauss-Newton
    curvature of the robust objective (the right error-bar matrix)."""
    J, r = state.J, state.r
    m, p = J.shape
    cov = _lu.lu_solve(_lu.lu_factor(J.T @ J), jnp.eye(p, dtype=J.dtype))
    s_sq = (2.0 * state.cost / (m - p)) if m > p else jnp.asarray(
        jnp.inf, J.dtype)
    param_sigma = jnp.sqrt(jnp.clip(jnp.diag(cov), 0.0, None) * s_sq)
    return FitResult(
        theta=state.x, cost=state.cost, grad_norm=state.grad_norm,
        status=state.status, n_iter=state.n_iter, nfev=state.nfev,
        njev=state.njev, cost_trace=state.cost_trace,
        cov=cov, param_sigma=param_sigma)


def trf_fit(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    theta0: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    config: FitConfig = FitConfig(),
    subproblem: str = "normal",
    loss: str = "linear",
    f_scale: float = 1.0,
) -> FitResult:
    """Minimize ``0.5 ||r(θ)||²`` subject to ``lower < θ < upper``.

    ``theta0`` is nudged into the strict interior if needed (scipy
    ``make_strictly_feasible``).

    ``loss`` / ``f_scale`` select a robust loss exactly as in
    ``scipy.optimize.least_squares`` (``'linear'``, ``'huber'``,
    ``'soft_l1'``, ``'cauchy'``, ``'arctan'``): the objective becomes
    ``0.5·f_scale²·Σρ((r/f_scale)²)`` and residual/Jacobian are rescaled
    per iteration with the robust curvature (optim/loss.py). The
    reported ``cost`` is the robust cost.

    Known corner (measured, round 5): when EVERY residual starts in the
    huber TAIL (all |r| ≫ f_scale), the robust Gauss–Newton curvature
    ``ρ' + 2ρ''z`` is exactly 0 on every row (scipy floors it at eps
    too, ``common.py`` scale_for_robust_loss_function) and the λ-damped
    normal-equations subproblem here can stall at the start, where
    scipy's explicit trust-RADIUS subproblem still makes progress. Fits
    with at least some inlier rows — the robust-loss use case — are
    unaffected (per-loss scipy parity: tests/test_fit.py). Mitigation if
    hit: start closer / raise ``f_scale``, or fit ``loss='linear'``
    first and re-fit robustly from its optimum.

    ``subproblem`` selects the trust-region step solver:

    - ``'normal'`` (default): λ-damped scaled normal equations with the
      in-house LU — Marquardt diagonal scaling, the incumbent.
    - ``'svd'``: the SVD route of the reference subproblem
      (``scipy/optimize/_lsq/common.py:57``): SVD of the CL-augmented
      Jacobian ``[J·diag(d); diag(√(g·dv))]`` in f32 (XLA's f64 SVD is
      unavailable on this TPU), λI damping in the spectral basis
      ``p = −V (Σ²+λ)⁻¹ Vᵀ g_h``, lifted to f64 with two iterative-
      refinement steps against the f64 normal matrix. Measured head to
      head in bench/experiments/trf_subproblem_bench.py — see
      docs/PERFORMANCE.md.
    """
    state = trf_init(residual_and_jac_fn, theta0, lower, upper, config,
                     loss=loss, f_scale=f_scale)
    state = trf_run(residual_fn, residual_and_jac_fn, state, lower, upper,
                    config, subproblem=subproblem, loss=loss,
                    f_scale=f_scale)
    final = trf_finish(state)
    # the historical trf_fit contract returned no covariance channel;
    # keep it now that trf_finish provides one (callers ignore extras)
    return final


def trf_run(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    state: _TRFState,
    lower: jax.Array,
    upper: jax.Array,
    config: FitConfig = FitConfig(),
    iter_cap=None,
    subproblem: str = "normal",
    loss: str = "linear",
    f_scale: float = 1.0,
) -> _TRFState:
    """Advance TRF until done or ``state.n_iter`` reaches ``iter_cap``."""
    if subproblem not in ("normal", "svd"):
        raise ValueError(f"unknown subproblem {subproblem!r}; "
                         "expected 'normal' or 'svd'")
    dtype = state.x.dtype
    eps = jnp.finfo(dtype).eps
    lb = jnp.asarray(lower, dtype)
    ub = jnp.asarray(upper, dtype)
    cap = config.max_iter if iter_cap is None else iter_cap
    interior = _interior_fn(lb, ub)
    eval_rj, eval_r = _eval_fns(residual_fn, residual_and_jac_fn, loss,
                                f_scale)

    def cond(st: _TRFState):
        return ~st.done & (st.n_iter < cap)

    def body(st: _TRFState) -> _TRFState:
        g = st.J.T @ st.r
        v, dv = _cl_scaling(st.x, g, lb, ub)
        d = jnp.sqrt(v)
        # scaled problem: J_h = J diag(d); B = J_hᵀ J_h + diag(g·dv)
        Jh = st.J * d[None, :]
        gh = d * g
        diag_h = jnp.maximum(g * dv, 0.0)
        B = Jh.T @ Jh + jnp.diag(diag_h)
        diagB = jnp.clip(jnp.diag(B), 1e-12, None)
        if subproblem == "svd":
            # spectral subproblem: B = J_augᵀJ_aug with
            # J_aug = [Jh; diag(√diag_h)]; f32 SVD gives V, Σ and the
            # λI-damped step p_h = −V (Σ²+λ)⁻¹ Vᵀ g_h, refined in f64
            J_aug = jnp.concatenate(
                [Jh, jnp.diag(jnp.sqrt(diag_h))], axis=0)
            _, s, Vt = jnp.linalg.svd(J_aug.astype(jnp.float32),
                                      full_matrices=False)
            s = s.astype(dtype)
            V = Vt.astype(dtype).T
            inv_spec = 1.0 / (s * s + st.lam)

            def spec_solve(rhs):
                return V @ (inv_spec * (V.T @ rhs))

            ph = spec_solve(-gh)
            M_f64 = B + st.lam * jnp.eye(B.shape[0], dtype=dtype)
            for _ in range(2):  # iterative refinement to f64 accuracy
                ph = ph + spec_solve(-gh - M_f64 @ ph)
            damp_diag = jnp.ones_like(diagB)
        else:
            M = B + st.lam * jnp.diag(diagB)
            ph = _lu.lu_solve(_lu.lu_factor(M), -gh)
            damp_diag = diagB
        p = d * ph

        # project onto the strict interior per coordinate (a global stride
        # back-off stalls the whole step when one coordinate presses its
        # bound; per-coordinate projection lets the free coordinates keep
        # moving — same KKT points under the CL optimality measure)
        x_t = interior(st.x + p)
        step = x_t - st.x

        cost_t, finite_t = eval_r(x_t)

        pred = 0.5 * (ph @ (st.lam * damp_diag * ph - gh))
        pred = jnp.maximum(pred, eps)
        rho = (st.cost - cost_t) / pred
        accept = finite_t & (cost_t < st.cost)

        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.where(
            accept, jnp.clip(st.lam * shrink, config.lam_min, config.lam_max),
            jnp.clip(st.lam * st.nu, config.lam_min, config.lam_max))
        nu_new = jnp.where(accept, 2.0, st.nu * 2.0)

        r_new, J_new = lax.cond(
            accept, lambda: eval_rj(x_t)[:2], lambda: (st.r, st.J))
        x_new = jnp.where(accept, x_t, st.x)
        cost_new = jnp.where(accept, cost_t, st.cost)
        njev = st.njev + jnp.where(accept, 1, 0)

        g_new = J_new.T @ r_new
        v_new, _ = _cl_scaling(x_new, g_new, lb, ub)
        g_norm = jnp.max(jnp.abs(v_new * g_new))

        dcost = st.cost - cost_t
        ftol_hit = accept & (dcost < config.ftol * st.cost)
        xtol_hit = accept & (
            jnp.linalg.norm(step)
            < config.xtol * (config.xtol + jnp.linalg.norm(st.x)))
        gtol_hit = g_norm < config.gtol
        stuck = ~accept & (st.lam >= config.lam_max)
        status = jnp.where(
            gtol_hit, 1,
            jnp.where(ftol_hit, 2,
                      jnp.where(xtol_hit | stuck, 3, 0))).astype(jnp.int32)

        return _TRFState(
            x=x_new, r=r_new, J=J_new, cost=cost_new,
            lam=lam_new, nu=nu_new, status=status, done=status > 0,
            n_iter=st.n_iter + 1, nfev=st.nfev + 1, njev=njev,
            grad_norm=g_norm,
            cost_trace=st.cost_trace.at[st.n_iter].set(cost_new))

    return lax.while_loop(cond, body, state)


TRFState = _TRFState
