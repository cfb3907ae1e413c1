"""Radau IIA order-5 implicit Runge-Kutta stiff integrator.

Spec parity: ``scipy/integrate/_ivp/radau.py`` (SURVEY.md §2 #10) — the
collocation system solved in the eigenbasis of the Butcher matrix
(``solve_collocation_system``, radau.py:48), Hairer two-step predictive
step control (``predict_factor``, radau.py:135), the rejected-step error
re-evaluation, the Jacobian-recompute heuristic (n_iter > 2 and
rate > 1e-3), and the ``RadauDenseOutput`` cubic interpolant.

TPU-native decisions:
- SciPy factors one real and one COMPLEX n×n matrix per step
  (radau.py:455-456). Complex f64 is hostile on TPU (emulated f64 has no
  complex path), so the complex solve ``(μc/h·I − J)(u+iv) = a+ib`` is
  embedded as a real 2n×2n system ``[[Re, −Im·I], [Im·I, Re]]`` and
  factored with the in-house pivoted LU — branch-free, vmappable,
  f64-emulation-safe.
- Same column-block state convention as solvers/bdf.py: ``Y`` is (n, k)
  with forward-sensitivity columns sharing both factorizations per step.
- Same branchless while-loop structure; statuses/counters identical.

Why ship Radau at all: stiffly accurate, L-stable, order 5 — higher order
per step than BDF at tight tolerances, and *fixed* stage count per step
(no order adaptation), which narrows the lockstep union for vmapped
ensembles relative to BDF's variable order.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpusysbio.config import SolverConfig
from tpusysbio.linalg import make_linear_solver
from tpusysbio.solvers import common
from tpusysbio.solvers.common import (
    STATUS_DONE,
    STATUS_MAX_STEPS,
    STATUS_RUNNING,
    STATUS_TOO_SMALL_STEP,
    IntegrateResult,
    rms_norm,
)

_S6 = math.sqrt(6.0)
_C = np.array([(4 - _S6) / 10, (4 + _S6) / 10, 1.0])
_E = np.array([-13 - 7 * _S6, -13 + 7 * _S6, -1.0]) / 3
_MU_REAL = 3 + 3 ** (2 / 3) - 3 ** (1 / 3)
_MU_C_RE = 3 + 0.5 * (3 ** (1 / 3) - 3 ** (2 / 3))
_MU_C_IM = -0.5 * (3 ** (5 / 6) + 3 ** (7 / 6))
_T = np.array([
    [0.09443876248897524, -0.14125529502095421, 0.03002919410514742],
    [0.25021312296533332, 0.20412935229379994, -0.38294211275726192],
    [1.0, 1.0, 0.0]])
_TI = np.array([
    [4.17871859155190428, 0.32768282076106237, 0.52337644549944951],
    [-4.17871859155190428, -0.32768282076106237, 0.47662355450055044],
    [0.50287263494578682, -2.57192694985560522, 0.59603920482822492]])
_P = np.array([
    [13 / 3 + 7 * _S6 / 3, -23 / 3 - 22 * _S6 / 3, 10 / 3 + 5 * _S6],
    [13 / 3 - 7 * _S6 / 3, -23 / 3 + 22 * _S6 / 3, 10 / 3 - 5 * _S6],
    [1 / 3, -8 / 3, 10 / 3]])

NEWTON_MAXITER = 6
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0


class _RadauState(NamedTuple):
    t: jax.Array
    y: jax.Array               # (n, k)
    f: jax.Array               # (n, k)
    h_abs: jax.Array
    h_abs_old: jax.Array
    error_norm_old: jax.Array
    have_old: jax.Array        # bool: two-step controller history valid
    J: jax.Array               # (n, n)
    fact_real: object          # factorization of MU_REAL/h I - J
    fact_cplx: object          # factorization of the 2n real embedding
    lu_valid: jax.Array
    current_jac: jax.Array
    rejected: jax.Array        # within-step rejection flag (radau.py:430)
    # previous dense output for the collocation warm start (radau.py:446)
    Q_prev: jax.Array          # (3, n, k) interpolant coefficients
    y_prev: jax.Array          # (n, k) y at previous step start
    t_prev: jax.Array
    h_prev: jax.Array
    have_sol: jax.Array
    status: jax.Array
    ys_acc: jax.Array
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    njev: jax.Array
    nlu: jax.Array


def radau_solve(
    f: Callable,
    t_span,
    y0: jax.Array,
    t_eval: jax.Array,
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    s0: Optional[jax.Array] = None,
    jac: Optional[Callable] = None,
) -> IntegrateResult:
    """Integrate ``dy/dt = f(t, y)`` forward; same interface as ``bdf_solve``."""
    dtype = jnp.result_type(y0.dtype)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(t_span[0], dtype)
    t_bound = jnp.asarray(t_span[1], dtype)
    n = y0.shape[0]
    t_eval = jnp.asarray(t_eval, dtype)

    if sens_rhs is not None:
        if s0 is None:
            raise ValueError("sens_rhs requires s0 of shape (n, m)")
        m = s0.shape[1]
    else:
        m = 0
    k = 1 + m

    if sens_rhs is None:
        def faug(t, Y):
            return f(t, Y[:, 0])[:, None]
    else:
        def faug(t, Y):
            y = Y[:, 0]
            return jnp.concatenate(
                [f(t, y)[:, None], sens_rhs(t, y, Y[:, 1:])], axis=1)

    if jac is None:
        def jac(t, y):
            return jax.jacfwd(lambda yy: f(t, yy))(y)

    factor_fn, solve_fn = make_linear_solver(config.linear_solver,
                                             config.jac_bandwidth)
    eps = jnp.finfo(dtype).eps
    newton_tol = max(10 * float(eps) / config.rtol,
                     min(0.03, config.rtol ** 0.5))
    rtol, atol = config.rtol, config.atol
    max_step = jnp.asarray(config.max_step, dtype)
    I_n = jnp.eye(n, dtype=dtype)
    I_2n = jnp.eye(2 * n, dtype=dtype)
    C3 = jnp.asarray(_C, dtype)
    E3 = jnp.asarray(_E, dtype)
    Tm = jnp.asarray(_T, dtype)
    TIm = jnp.asarray(_TI, dtype)
    Pm = jnp.asarray(_P, dtype)
    mu_r = jnp.asarray(_MU_REAL, dtype)
    mu_re = jnp.asarray(_MU_C_RE, dtype)
    mu_im = jnp.asarray(_MU_C_IM, dtype)

    # Split-precision sensitivities (see solvers/bdf.py): sensitivity
    # columns evaluate and solve in f32; the state column and error
    # control stay f64 (state trajectory identical to 'full').
    split_sens = (config.sens_precision == "f32" and m > 0
                  and dtype == jnp.float64)
    f32 = jnp.float32

    def _fact32(fact):
        return jax.tree.map(
            lambda a: a.astype(f32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, fact)

    if split_sens:
        def faug_split(t, Y):
            y = Y[:, 0]
            fy = f(t, y)
            fs = sens_rhs(t.astype(f32), y.astype(f32),
                          Y[:, 1:].astype(f32))
            return jnp.concatenate([fy[:, None], fs.astype(dtype)], axis=1)
    else:
        faug_split = faug

    def factor_pair(h, J):
        """Factor MU_REAL/h I − J and the real embedding of
        MU_COMPLEX/h I − J."""
        fr = factor_fn(mu_r / h * I_n - J)
        a = mu_re / h
        b = mu_im / h
        top = jnp.concatenate([a * I_n - J, -b * I_n], axis=1)
        bot = jnp.concatenate([b * I_n, a * I_n - J], axis=1)
        fc = factor_fn(jnp.concatenate([top, bot], axis=0))
        return fr, fc

    def solve_complex(fc, re, im):
        """Solve the embedded complex system for (n, k) real/imag RHS."""
        rhs = jnp.concatenate([re, im], axis=0)  # (2n, k)
        out = solve_fn(fc, rhs)
        return out[:n], out[n:]

    # --- init --------------------------------------------------------
    Y0 = y0[:, None]
    if m:
        Y0 = jnp.concatenate([Y0, jnp.asarray(s0, dtype)], axis=1)
    F0 = faug(t0, Y0)
    if config.first_step is None:
        h0 = common.select_initial_step(
            f, t0, y0, F0[:, 0], t_bound, config.max_step, rtol, atol,
            order=4)
    else:
        h0 = jnp.asarray(config.first_step, dtype)
    h0 = jnp.minimum(h0, jnp.abs(t_bound - t0))

    J0 = jac(t0, y0)
    fr0, fc0 = factor_pair(jnp.ones((), dtype), jnp.zeros_like(J0))

    ys0 = jnp.where((t_eval == t0)[:, None, None],
                    Y0[None], jnp.zeros((t_eval.shape[0], n, k), dtype))

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    one = jnp.ones((), dtype)
    state = _RadauState(
        t=t0, y=Y0, f=F0, h_abs=h0, h_abs_old=one,
        error_norm_old=one, have_old=jnp.asarray(False),
        J=J0, fact_real=fr0, fact_cplx=fc0, lu_valid=jnp.asarray(False),
        current_jac=jnp.asarray(True), rejected=jnp.asarray(False),
        Q_prev=jnp.zeros((3, n, k), dtype), y_prev=Y0, t_prev=t0,
        h_prev=one, have_sol=jnp.asarray(False),
        status=common.status_init(t0, t_bound), ys_acc=ys0,
        nsteps=i32(0), naccepted=i32(0), nrejected=i32(0),
        nfev=i32(1 + (0 if config.first_step is not None else 2)),
        njev=i32(1), nlu=i32(0))

    def cond(st: _RadauState):
        return st.status == STATUS_RUNNING

    def prev_sol_eval(st, tv):
        """Previous step's dense output at times tv (3,) -> (3, n, k)."""
        x = (tv - st.t_prev) / st.h_prev          # (3,)
        p1 = x
        p2 = x * x
        p3 = p2 * x
        px = jnp.stack([p1, p2, p3], axis=1)      # (3 stages, 3 powers)
        return st.y_prev[None] + jnp.einsum("sp,pnk->snk", px, st.Q_prev)

    def body(st: _RadauState) -> _RadauState:
        t, Y = st.t, st.y
        min_step = 10 * jnp.finfo(dtype).eps * jnp.abs(t)
        too_small = (st.h_abs < min_step) & st.rejected
        # top-of-step clamp invalidates the two-step controller history
        h_clamped = jnp.clip(st.h_abs, min_step, max_step)
        clamped = h_clamped != st.h_abs
        have_old = st.have_old & ~clamped
        h_abs = h_clamped

        t_new = jnp.minimum(t + h_abs, t_bound)
        h = t_new - t
        h_abs = h

        # warm start from previous dense output (radau.py:446-449)
        Z0 = jnp.where(
            st.have_sol,
            prev_sol_eval(st, t + h * C3) - Y[None],
            jnp.zeros((3, n, k), dtype))
        scale = atol + jnp.abs(Y[:, 0]) * rtol

        fr, fc = lax.cond(
            st.lu_valid,
            lambda: (st.fact_real, st.fact_cplx),
            lambda: factor_pair(h, st.J))
        nlu = st.nlu + jnp.where(st.lu_valid, 0, 2)

        # --- collocation Newton (radau.py:48-133), masked fixed trips ---
        W0 = jnp.einsum("ij,jnk->ink", TIm, Z0)

        def newton_body(it, carry):
            Z, W, dW_norm_old, n_iter, rate, converged, failed = carry
            active = ~(converged | failed)
            F = jnp.stack([faug_split(t + C3[0] * h, Y + Z[0]),
                           faug_split(t + C3[1] * h, Y + Z[1]),
                           faug_split(t + C3[2] * h, Y + Z[2])])
            nonfinite = ~jnp.all(jnp.isfinite(F))
            f_real = (jnp.einsum("i,ink->nk", TIm[0], F)
                      - (mu_r / h) * W[0])
            f_cplx_re = (jnp.einsum("i,ink->nk", TIm[1], F)
                         - (mu_re / h) * W[1] + (mu_im / h) * W[2])
            f_cplx_im = (jnp.einsum("i,ink->nk", TIm[2], F)
                         - (mu_im / h) * W[1] - (mu_re / h) * W[2])
            if split_sens:
                dW0_s = solve_fn(fr, f_real[:, :1])
                dW0_x = solve_fn(_fact32(fr),
                                 f_real[:, 1:].astype(f32)).astype(dtype)
                dW0 = jnp.concatenate([dW0_s, dW0_x], axis=1)
                d1s, d2s = solve_complex(fc, f_cplx_re[:, :1],
                                         f_cplx_im[:, :1])
                rhs32 = jnp.concatenate(
                    [f_cplx_re[:, 1:], f_cplx_im[:, 1:]],
                    axis=0).astype(f32)
                out32 = solve_fn(_fact32(fc), rhs32).astype(dtype)
                dW1 = jnp.concatenate([d1s, out32[:n]], axis=1)
                dW2 = jnp.concatenate([d2s, out32[n:]], axis=1)
            else:
                dW0 = solve_fn(fr, f_real)
                dW1, dW2 = solve_complex(fc, f_cplx_re, f_cplx_im)
            dW = jnp.stack([dW0, dW1, dW2])
            dW_norm = rms_norm(dW[:, :, 0] / scale[None])
            rate_new = dW_norm / jnp.where(dW_norm_old > 0, dW_norm_old, 1.0)
            have_rate = it > 0
            diverged = have_rate & (
                (rate_new >= 1.0)
                | (rate_new ** (NEWTON_MAXITER - it) / (1.0 - rate_new)
                   * dW_norm > newton_tol))
            ok = active & ~nonfinite & ~diverged
            W = jnp.where(ok, W + dW, W)
            Z = jnp.where(ok, jnp.einsum("ij,jnk->ink", Tm, W), Z)
            conv_now = ok & ((dW_norm == 0.0)
                             | (have_rate
                                & (rate_new / (1.0 - rate_new) * dW_norm
                                   < newton_tol)))
            converged = converged | conv_now
            failed = failed | (active & (nonfinite | diverged))
            n_iter = n_iter + jnp.where(active, 1, 0)
            rate = jnp.where(active & have_rate, rate_new, rate)
            dW_norm_old = jnp.where(ok, dW_norm, dW_norm_old)
            return Z, W, dW_norm_old, n_iter, rate, converged, failed

        init = (Z0, W0, jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                jnp.zeros((), dtype), jnp.asarray(False), jnp.asarray(False))
        Z, _, _, n_iter, rate, converged, _ = lax.fori_loop(
            0, NEWTON_MAXITER, newton_body, init)
        nfev = st.nfev + 3 * n_iter

        # Newton failure handling (radau.py:460-474)
        case_B = ~converged & ~st.current_jac   # refresh J, retry same h
        case_C = ~converged & st.current_jac    # halve h
        J = lax.cond(case_B, lambda: jac(t, Y[:, 0]), lambda: st.J)
        njev_mid = st.njev + jnp.where(case_B, 1, 0)

        # --- error estimate (radau.py:476-489) ---
        y_new = Y + Z[2]
        ZE = jnp.einsum("i,ink->nk", E3, Z) / h
        err = solve_fn(fr, st.f + ZE)
        scale_new = atol + jnp.maximum(jnp.abs(Y[:, 0]),
                                       jnp.abs(y_new[:, 0])) * rtol
        error_norm = rms_norm(err[:, 0] / scale_new)
        safety = (0.9 * (2 * NEWTON_MAXITER + 1)
                  / (2 * NEWTON_MAXITER + n_iter.astype(dtype)))

        # rejected-step stabilized re-estimate (radau.py:484-486)
        def stabilized():
            err2 = solve_fn(fr, faug(t, Y + err) + ZE)
            return rms_norm(err2[:, 0] / scale_new)

        redo = st.rejected & (error_norm > 1.0) & converged
        error_norm = lax.cond(redo, stabilized, lambda: error_norm)
        nfev = nfev + jnp.where(redo, 1, 0)

        bad_err = ~jnp.isfinite(error_norm)
        error_norm = jnp.where(bad_err, jnp.asarray(2.0, dtype), error_norm)
        reject = converged & ((error_norm > 1.0) | bad_err)
        accept = converged & ~reject

        # --- Hairer predictive controller (radau.py:135-175) ---
        def predict_factor(e_norm):
            mult = jnp.where(
                st.have_old & (e_norm > 0),
                h_abs / st.h_abs_old
                * jnp.where(e_norm > 0,
                            (st.error_norm_old
                             / jnp.maximum(e_norm, eps)) ** 0.25, 1.0),
                1.0)
            safe_e = jnp.maximum(e_norm, eps)
            return jnp.minimum(1.0, mult) * safe_e ** -0.25

        factor_rej = jnp.maximum(MIN_FACTOR, safety * predict_factor(
            error_norm))
        # acceptance path factor (radau.py:493-503)
        recompute_jac = (n_iter > 2) & (rate > 1e-3)
        factor_acc = jnp.minimum(MAX_FACTOR, safety * predict_factor(
            error_norm))
        keep_h = ~recompute_jac & (factor_acc < 1.2)
        factor_acc = jnp.where(keep_h, 1.0, factor_acc)

        h_factor = jnp.where(case_C, 0.5,
                             jnp.where(reject, factor_rej,
                                       jnp.where(accept, factor_acc, 1.0)))
        h_new = h_abs * h_factor

        f_new = lax.cond(accept, lambda: faug(t_new, y_new), lambda: st.f)
        nfev = nfev + jnp.where(accept, 1, 0)
        J = lax.cond(accept & recompute_jac,
                     lambda: jac(t_new, y_new[:, 0]), lambda: J)
        njev = njev_mid + jnp.where(accept & recompute_jac, 1, 0)
        current_jac = jnp.where(
            case_B, True,
            jnp.where(accept, recompute_jac, st.current_jac))

        # LU stays valid only on an accepted step that kept h and J
        lu_valid = accept & keep_h & ~recompute_jac
        # but a failed/rejected attempt with unchanged (h, J)? SciPy always
        # nulls LU on rejection/halving (h changes) — matches h_factor != 1.

        # --- dense output (RadauDenseOutput) ---
        Q = jnp.einsum("ink,ip->pnk", Z, Pm)  # (3 powers, n, k)

        def interp(tv):
            x = ((tv - t) / h)[:, None]       # (T, 1)
            px = jnp.concatenate([x, x * x, x * x * x], axis=1)  # (T, 3)
            return Y[None] + jnp.einsum("tp,pnk->tnk", px, Q)

        ys_acc = jnp.where(
            accept,
            common.interp_accumulate(t_eval, t, t_new, interp, st.ys_acc),
            st.ys_acc)

        done = accept & (t_new >= t_bound)
        nsteps = st.nsteps + 1
        status = jnp.where(
            done, STATUS_DONE,
            jnp.where(nsteps >= config.max_steps, STATUS_MAX_STEPS,
                      STATUS_RUNNING)).astype(jnp.int32)

        new_st = _RadauState(
            t=jnp.where(accept, t_new, t),
            y=jnp.where(accept, y_new, Y),
            f=f_new,
            h_abs=h_new,
            h_abs_old=jnp.where(accept, h_abs, st.h_abs_old),
            error_norm_old=jnp.where(accept, error_norm,
                                     st.error_norm_old),
            have_old=jnp.where(accept, True, have_old),
            J=J, fact_real=fr, fact_cplx=fc, lu_valid=lu_valid,
            current_jac=current_jac,
            rejected=jnp.where(accept, False, st.rejected | reject | case_C),
            Q_prev=jnp.where(accept, Q, st.Q_prev),
            y_prev=jnp.where(accept, Y, st.y_prev),
            t_prev=jnp.where(accept, t, st.t_prev),
            h_prev=jnp.where(accept, h, st.h_prev),
            have_sol=st.have_sol | accept,
            status=status, ys_acc=ys_acc, nsteps=nsteps,
            naccepted=st.naccepted + jnp.where(accept, 1, 0),
            nrejected=st.nrejected + jnp.where(reject | case_C, 1, 0),
            nfev=nfev, njev=njev, nlu=nlu)

        frozen = st._replace(status=i32(STATUS_TOO_SMALL_STEP))
        return jax.tree.map(
            lambda a, b: jnp.where(too_small, a, b), frozen, new_st)

    final = lax.while_loop(cond, body, state)
    return IntegrateResult(
        ys=final.ys_acc[:, :, 0], sens=final.ys_acc[:, :, 1:],
        status=final.status, nsteps=final.nsteps,
        naccepted=final.naccepted, nrejected=final.nrejected,
        nfev=final.nfev, njev=final.njev, nlu=final.nlu,
        order_hist=jnp.zeros((6,), jnp.int32),
        t_final=final.t, y_final=final.y)
