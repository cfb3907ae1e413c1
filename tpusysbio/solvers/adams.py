"""Variable-order Adams–Bashforth–Moulton (PECE) non-stiff integrator.

The reference's LSODA (``scipy/integrate/_ivp/lsoda.py``; ODEPACK
semantics) runs variable-order Adams–Moulton with functional iteration on
its non-stiff phase — no Jacobians, no factorizations. This module is the
TPU-native equivalent: a predictor–corrector Adams method of order 2..9
as ONE ``lax.while_loop`` with **fixed work per step (two RHS
evaluations)** — the best possible lockstep-vmap shape (a vmapped
ensemble pays the union of step *sizes* only, never divergent iteration
counts).

Formulation (quasi-constant step, backward-difference form — Hairer,
Nørsett & Wanner I, §III.1):

- State carries the backward-difference array of f:
  ``DF[j] = ∇^j f_n`` on a uniform grid of spacing h (fixed
  ``(MAX_Q+2, n, k)`` rows, masked by the live order).
- Predict (Adams–Bashforth, order q):  ``y_pred = y_n + h Σ_{j<q} γ_j DF[j]``.
- Correct (Adams–Moulton, order q+1) via the classic identity
  ``y_AM(q+1) = y_AB(q) + h γ_q ∇^q f_{n+1}`` where the new-point
  differences telescope as ``∇^j f_{n+1} = f_{n+1} − Σ_{i<j} DF[i]``
  — one masked prefix-sum einsum, no sequential update loop.
- Evaluate f at the corrected point; its differences become the new DF
  (the final E of PECE) and feed the error estimates
  ``LTE(p) ≈ h γ*_p ∇^p f_{n+1}`` (γ* = Adams–Moulton coefficients),
  giving order-(q−1, q, q+1) candidates exactly like the BDF stepper's
  ``D[order±1]`` logic (scipy/integrate/_ivp/bdf.py:421-448 analogue).
- Step-size changes rescale DF with the same masked difference-transform
  the BDF stepper uses for D (``scipy/integrate/_ivp/bdf.py`` change_D):
  the operator re-samples the degree-q interpolating polynomial on the
  scaled grid and is agnostic to which sampled function the differences
  belong to.
- Dense output integrates the Newton backward-difference interpolant of
  f through the new point: ``y(t_{n+1}+θh) = y_{n+1} + h Σ_j I_j(θ) ∇^j
  f_{n+1}`` with STATIC integral-coefficient polynomials ``I_j`` (built
  once with numpy; ``−I_j(−1) = γ*_j`` makes the interpolant consistent
  with the corrector at both step ends).

``stiff_exit=True`` aborts with ``STATUS_STIFF`` on a persistent
stability-limited pace (same detector as dopri5) so ``auto_solve`` can
warm-hand the state to BDF — the LSODA switching contract at segment
granularity (SURVEY.md §2a #8).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpusysbio.config import SolverConfig
from tpusysbio.solvers import common
from tpusysbio.solvers.common import (
    STATUS_DONE,
    STATUS_MAX_STEPS,
    STATUS_RUNNING,
    STATUS_TOO_SMALL_STEP,
    IntegrateResult,
    rms_norm,
)

MAX_Q = 8               # max predictor (AB) order; corrector order MAX_Q+1
ROWS = MAX_Q + 2        # difference rows 0..MAX_Q+1


def _adams_gammas(n_terms: int):
    """AB coefficients γ_j and AM coefficients γ*_j (HNW I, III.1.6/1.8).

    γ_j  : γ_0 = 1,  Σ_{i=0}^{m} γ_i/(m+1−i) = ... via the recurrence
           γ_m = 1 − Σ_{i=0}^{m−1} γ_i/(m+1−i).
    γ*_j : γ*_0 = 1, γ*_m = −Σ_{i=0}^{m−1} γ*_i/(m+1−i)  (m ≥ 1);
           equivalently γ*_m = γ_m − γ_{m−1}.
    """
    g = np.zeros(n_terms)
    gs = np.zeros(n_terms)
    g[0] = gs[0] = 1.0
    for m in range(1, n_terms):
        g[m] = 1.0 - sum(g[i] / (m + 1 - i) for i in range(m))
        gs[m] = -sum(gs[i] / (m + 1 - i) for i in range(m))
    return g, gs


_GAMMA, _GAMMA_STAR = _adams_gammas(ROWS + 1)


def _dense_coeffs():
    """Static (ROWS, ROWS+2) matrix C with I_j(θ) = Σ_m C[j, m] θ^m,
    the antiderivative of term_j(u) = Π_{i=0}^{j-1} (u+i)/(i+1)
    (= (−1)^j · binom(−u, j), the Newton backward-difference basis)."""
    C = np.zeros((ROWS, ROWS + 2))
    term = np.array([1.0])           # polynomial coefficients, low->high
    for j in range(ROWS):
        anti = np.concatenate([[0.0], term / np.arange(1, term.size + 1)])
        C[j, :anti.size] = anti
        term = (np.convolve(term, [j, 1.0])) / (j + 1)  # *(u+j)/(j+1)
    return C


_DENSE_C = _dense_coeffs()


def _compute_R(factor, dtype):
    """Difference-rescaling matrix on ROWS rows (bdf.py compute_R shape,
    generalized size)."""
    i = jnp.arange(ROWS, dtype=dtype)[:, None]
    j = jnp.arange(ROWS, dtype=dtype)[None, :]
    body = (i - 1.0 - factor * j) / jnp.maximum(i, 1.0)
    m = jnp.where(i == 0, 1.0, jnp.where(j == 0, 0.0, body))
    return jnp.cumprod(m, axis=0)


def _change_DF(DF, order, factor):
    """Rescale ``DF[:order+1]`` for a step change (bdf.py change_D
    semantics: masked transform embedded in the identity)."""
    dtype = DF.dtype
    factor = factor.astype(dtype)
    P = _compute_R(factor, dtype) @ _compute_R(jnp.ones((), dtype), dtype)
    rows = jnp.arange(ROWS)
    i = rows[:, None]
    j = rows[None, :]
    in_block = (i <= order) & (j <= order)
    eye = (i == j).astype(dtype)
    T = jnp.where(in_block, P.T, eye)
    return jnp.einsum("ij,j...->i...", T, DF)


class _AdamsState(NamedTuple):
    t: jax.Array
    y: jax.Array              # (n, k) column block (state + sensitivities)
    DF: jax.Array             # (ROWS, n, k) backward differences of f·1
    h_abs: jax.Array
    order: jax.Array          # int32 predictor order q, 1..MAX_Q
    n_equal_steps: jax.Array  # int32 steps at current (h, q)
    n_fail: jax.Array         # int32 consecutive rejected attempts
    last_accepted: jax.Array
    status: jax.Array
    ys_acc: jax.Array         # (T, n, k)
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    order_hist: jax.Array     # (6,) accepted steps per corrector order
    stiff_count: jax.Array


def adams_solve(
    f: Callable,
    t_span,
    y0: jax.Array,
    t_eval: jax.Array,
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    s0: Optional[jax.Array] = None,
    jac: Optional[Callable] = None,  # unused (no Newton iteration)
    stiff_exit: bool = False,
) -> IntegrateResult:
    """Integrate ``dy/dt = f(t, y)`` forward; same interface as
    ``bdf_solve``/``dopri5_solve``. Fixed 2 RHS evaluations per step."""
    del jac
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

    gamma = jnp.asarray(_GAMMA, dtype)
    gamma_star = jnp.asarray(_GAMMA_STAR, dtype)
    dense_C = jnp.asarray(_DENSE_C, dtype)
    rtol, atol = config.rtol, config.atol
    max_step = jnp.asarray(config.max_step, dtype)
    rows = jnp.arange(ROWS)
    eps = jnp.finfo(dtype).eps

    Y0 = y0[:, None]
    if m:
        Y0 = jnp.concatenate([Y0, jnp.asarray(s0, dtype)], axis=1)
    F0 = faug(t0, Y0)
    if config.first_step is None:
        h0 = common.select_initial_step(
            f, t0, y0, F0[:, 0], t_bound, config.max_step, rtol, atol,
            order=1)
    else:
        h0 = jnp.asarray(config.first_step, dtype)
    h0 = jnp.minimum(h0, jnp.abs(t_bound - t0))

    DF0 = jnp.zeros((ROWS, n, k), dtype).at[0].set(F0)

    ys0 = jnp.where((t_eval == t0)[:, None, None],
                    Y0[None], jnp.zeros((t_eval.shape[0], n, k), dtype))

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    state = _AdamsState(
        t=t0, y=Y0, DF=DF0, h_abs=h0, order=i32(1),
        n_equal_steps=i32(0), n_fail=i32(0),
        last_accepted=jnp.asarray(True),
        status=common.status_init(t0, t_bound), ys_acc=ys0, nsteps=i32(0),
        naccepted=i32(0), nrejected=i32(0),
        nfev=i32(1 + (0 if config.first_step is not None else 2)),
        order_hist=jnp.zeros((6,), jnp.int32),
        stiff_count=i32(0))

    def cond(st: _AdamsState):
        return st.status == STATUS_RUNNING

    def body(st: _AdamsState) -> _AdamsState:
        t, y, order = st.t, st.y, st.order
        orderf = order.astype(dtype)
        DF = st.DF
        h_abs = st.h_abs
        n_equal = st.n_equal_steps

        min_step = 10 * eps * jnp.abs(t)
        too_small = (h_abs < min_step) & ~st.last_accepted
        h_clamped = jnp.clip(h_abs, min_step, max_step)
        pre_clamp = st.last_accepted & (h_clamped != h_abs)
        DF = jnp.where(pre_clamp, _change_DF(DF, order,
                                             h_clamped / h_abs), DF)
        n_equal = jnp.where(pre_clamp, 0, n_equal)
        h_abs = jnp.where(st.last_accepted, h_clamped, h_abs)

        # clip the final step to t_bound, rescaling DF
        t_new_raw = t + h_abs
        clipped = t_new_raw > t_bound
        t_new = jnp.where(clipped, t_bound, t_new_raw)
        h = t_new - t
        clip_factor = jnp.where(clipped, h / h_abs, jnp.ones((), dtype))
        DF = jnp.where(clipped, _change_DF(DF, order, clip_factor), DF)
        n_equal = jnp.where(clipped, 0, n_equal)
        h_abs = h

        # --- P: Adams–Bashforth predictor, order q -----------------------
        pred_w = jnp.where(rows <= order - 1, gamma[rows], 0.0)
        y_pred = y + h * jnp.einsum("i,ink->nk", pred_w, DF)
        f_pred = faug(t_new, y_pred)

        # new-point differences from the predicted f:
        # ∇^j f_{n+1} = f_{n+1} − Σ_{i<j} DF[i]   (telescoped prefix sum)
        prefix = jnp.cumsum(DF, axis=0)           # Σ_{i<=j} DF[i]
        prefix_ex = jnp.concatenate(
            [jnp.zeros((1, n, k), dtype), prefix[:-1]], axis=0)

        def new_diffs(f_np1):
            return f_np1[None] - prefix_ex        # (ROWS, n, k)

        c_pred = new_diffs(f_pred)
        g_q = jnp.take(gamma, order)

        # --- C: Adams–Moulton corrector, order q+1 -----------------------
        # y_AM(q+1) = y_AB(q) + h γ_q ∇^q f_{n+1}
        c_q_pred = jnp.take(c_pred, order, axis=0)
        y_corr1 = y_pred + h * g_q * c_q_pred

        # --- E: evaluation at the corrected point; its differences drive
        #     error, history, AND a SECOND corrector application (P(EC)²
        #     semantics at zero extra evals: the re-correction reuses the
        #     same evaluation the history update needs anyway) -----------
        f_new = faug(t_new, y_corr1)
        c = new_diffs(f_new)
        y_new = y_pred + h * g_q * jnp.take(c, order, axis=0)

        scale = atol + rtol * jnp.maximum(jnp.abs(y[:, 0]),
                                          jnp.abs(y_new[:, 0]))

        def est_norm(p):
            """Scaled LTE norm of corrector order p: h γ*_p ∇^p f_{n+1}."""
            cp = jnp.take(c, jnp.clip(p, 0, ROWS - 1), axis=0)
            est = h * jnp.take(gamma_star, jnp.clip(p, 0, ROWS)) * cp
            if config.sens_error_control and m:
                scale_full = atol + rtol * jnp.maximum(jnp.abs(y),
                                                       jnp.abs(y_new))
                return rms_norm(est / scale_full)
            return rms_norm(est[:, 0] / scale)

        error_norm = est_norm(order + 1)
        finite = jnp.all(jnp.isfinite(y_new)) & jnp.all(jnp.isfinite(f_new))
        bad_err = ~jnp.isfinite(error_norm) | ~finite
        error_norm = jnp.where(bad_err, jnp.asarray(2.0, dtype), error_norm)
        accept = ~bad_err & (error_norm <= 1.0)

        # --- order adaptation (after q+1 equal steps, bdf.py-style) ------
        n_equal_acc = n_equal + 1
        do_adapt = accept & (n_equal_acc >= order + 1)
        inf_ = jnp.asarray(jnp.inf, dtype)
        err_m = jnp.where(order > 1, est_norm(order), inf_)
        err_p = jnp.where(order < MAX_Q, est_norm(order + 2), inf_)
        error_norms = jnp.stack([err_m, error_norm, err_p])
        # corrector orders q, q+1, q+2 -> one-step exponents −1/(p+1)
        exponents = -1.0 / (orderf + 1.0 + jnp.arange(3, dtype=dtype))
        finite_norm = jnp.isfinite(error_norms)
        safe_norms = jnp.where(finite_norm,
                               jnp.maximum(error_norms, eps), 1.0)
        factors = jnp.where(finite_norm, safe_norms ** exponents, 0.0)
        best = jnp.argmax(factors).astype(jnp.int32)
        order_adapt = jnp.clip(order + best - 1, 1, MAX_Q)
        factor_adapt = jnp.minimum(config.max_factor,
                                   config.safety * jnp.max(factors))

        factor_rej = jnp.where(
            bad_err, jnp.asarray(0.5, dtype),
            jnp.maximum(config.min_factor,
                        config.safety
                        * error_norm ** (-1.0 / (orderf + 2.0))))
        h_factor = jnp.where(
            accept, jnp.where(do_adapt, factor_adapt, 1.0), factor_rej)
        change = ~accept | do_adapt
        # Order REDUCTION on rejection storms (LSODE/ode113 semantics):
        # PECE at high order is often STABILITY-limited, not
        # accuracy-limited — the controller then oscillates accept/reject
        # with shrinking h while the raise-only n_equal gate keeps the
        # order pinned (observed on Lotka–Volterra at q=7: h underflow).
        # Each rejection beyond the first drops one order; the raise path
        # re-earns it through the equal-step ramp.
        n_fail_new = jnp.where(accept, 0, st.n_fail + 1)
        order_drop = jnp.maximum(
            order - jnp.maximum(n_fail_new - 1, 0), 1)
        order_new = jnp.where(
            accept, jnp.where(do_adapt, order_adapt, order), order_drop)

        DF_base = jnp.where(accept, c, DF)
        DF_new = jnp.where(change, _change_DF(DF_base, order_new, h_factor),
                           DF_base)
        h_new = h_abs * jnp.where(change, h_factor, 1.0)
        n_equal_new = jnp.where(accept & ~do_adapt, n_equal_acc, 0)

        # --- dense output (integrated backward-difference interpolant) ---
        def interp(tv):
            theta = ((tv - t_new) / h)[:, None]            # (T, 1), in [-1,0]
            # powers via cumprod: jnp.power is exp(e*log b) on TPU and
            # yields NaN at theta == 0 (docs/PERFORMANCE.md hazards)
            pw = jnp.concatenate(
                [jnp.ones_like(theta),
                 jnp.cumprod(jnp.repeat(theta, ROWS + 1, axis=1), axis=1)],
                axis=1)                                    # (T, ROWS+2)
            Ij = pw @ dense_C.T                            # (T, ROWS)
            Ij = jnp.where(rows[None, :] <= order, Ij, 0.0)
            return y_new[None] + h * jnp.einsum("ti,ink->tnk", Ij, c)

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
        if stiff_exit:
            # persistent stability-limited pace => stiff (dopri5's
            # detector adapted to a multistep: Adams changes h only at
            # adaptation events, so gate on the controller's HYPOTHETICAL
            # growth factor — accuracy headroom means the method is not
            # stability-limited even while h is held constant)
            t_cur = jnp.where(accept, t_new, t)
            projected = (t_bound - t_cur) / jnp.maximum(h_new, min_step)
            hypo = config.safety * jnp.maximum(error_norm, eps) ** (
                -1.0 / (orderf + 2.0))
            would_grow = accept & (hypo > 1.2)
            limited = (~done & ~would_grow
                       & (projected
                          > (config.max_steps - nsteps).astype(dtype)))
            stiff_count = jnp.where(limited, st.stiff_count + 1, 0)
            status = jnp.where(stiff_count >= 5, common.STATUS_STIFF,
                               status)
        else:
            stiff_count = st.stiff_count

        new_st = _AdamsState(
            t=jnp.where(accept, t_new, t),
            y=jnp.where(accept, y_new, y),
            DF=DF_new, h_abs=h_new, order=order_new,
            n_equal_steps=n_equal_new, n_fail=n_fail_new,
            last_accepted=accept,
            status=status, ys_acc=ys_acc, nsteps=nsteps,
            naccepted=st.naccepted + jnp.where(accept, 1, 0),
            nrejected=st.nrejected + jnp.where(accept, 0, 1),
            nfev=st.nfev + 2,
            order_hist=st.order_hist.at[jnp.minimum(order + 1, 5)].add(
                jnp.where(accept, 1, 0)),
            stiff_count=stiff_count)

        frozen = st._replace(status=i32(STATUS_TOO_SMALL_STEP))
        return jax.tree.map(
            lambda a, b: jnp.where(too_small, a, b), frozen, new_st)

    final = lax.while_loop(cond, body, state)
    return IntegrateResult(
        ys=final.ys_acc[:, :, 0], sens=final.ys_acc[:, :, 1:],
        status=final.status, nsteps=final.nsteps,
        naccepted=final.naccepted, nrejected=final.nrejected,
        nfev=final.nfev, njev=jnp.zeros((), jnp.int32),
        nlu=jnp.zeros((), jnp.int32),
        order_hist=final.order_hist, t_final=final.t, y_final=final.y)
