"""Explicit Dormand–Prince RK45 for non-stiff problems, one ``lax.while_loop``.

Spec parity: ``scipy/integrate/_ivp/rk.py`` (RK45 tableau, PI-free step
control, quartic dense-output interpolant). Used for the non-stiff configs
(Michaelis–Menten, Lotka–Volterra — BASELINE.json:7-8) and as the M1
end-to-end slice integrator (SURVEY.md §7). Shares the column-block state
convention with the BDF stepper: ``Y`` is (n, k) with sensitivities in
columns 1..m riding the same tableau (an explicit method needs no Newton,
so the augmented system integrates at marginal cost).
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

# Dormand-Prince 5(4) tableau (scipy/integrate/_ivp/rk.py RK45)
_C = np.array([0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1], dtype=np.float64)
_A = np.array([
    [0, 0, 0, 0, 0],
    [1 / 5, 0, 0, 0, 0],
    [3 / 40, 9 / 40, 0, 0, 0],
    [44 / 45, -56 / 15, 32 / 9, 0, 0],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
], dtype=np.float64)
_B = np.array([35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
              dtype=np.float64)
_E = np.array([71 / 57600, 0, -71 / 16695, 71 / 1920, -17253 / 339200,
               22 / 525, -1 / 40], dtype=np.float64)
_P = np.array([
    [1, -8048581381 / 2820520608, 8663915743 / 2820520608,
     -12715105075 / 11282082432],
    [0, 0, 0, 0],
    [0, 131558114200 / 32700410799, -68118460800 / 10900136933,
     87487479700 / 32700410799],
    [0, -1754552775 / 470086768, 14199869525 / 1410260304,
     -10690763975 / 1880347072],
    [0, 127303824393 / 49829197408, -318862633887 / 49829197408,
     701980252875 / 199316789632],
    [0, -282668133 / 205662961, 2019193451 / 616988883,
     -1453857185 / 822651844],
    [0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423],
], dtype=np.float64)

_ERROR_EXPONENT = -1.0 / 5.0  # error_estimator_order 4 (rk.py)


class _RKState(NamedTuple):
    t: jax.Array
    y: jax.Array              # (n, k)
    f: jax.Array              # (n, k) RHS at (t, y) (FSAL)
    h_abs: jax.Array
    step_rejected: jax.Array
    status: jax.Array
    ys_acc: jax.Array         # (T, n, k)
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    stiff_count: jax.Array    # consecutive stability-limited-pace steps


def dopri5_solve(
    f: Callable,
    t_span,
    y0: jax.Array,
    t_eval: jax.Array,
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    s0: Optional[jax.Array] = None,
    jac: Optional[Callable] = None,  # unused (explicit method)
    stiff_exit: bool = False,
) -> IntegrateResult:
    """Integrate ``dy/dt = f(t, y)`` forward; same interface as ``bdf_solve``.

    ``stiff_exit``: abort with ``STATUS_STIFF`` as soon as the controlled
    step size implies the remaining interval cannot finish within the step
    budget — the cheap stiffness detector for ``auto_solve``'s explicit
    phase (LSODA-role switching, SURVEY.md §2a #8). The final ``(t, Y)``
    is reported in ``t_final``/``y_final`` for a warm handoff.
    """
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

    A = jnp.asarray(_A, dtype)
    B = jnp.asarray(_B, dtype)
    C = jnp.asarray(_C, dtype)
    E = jnp.asarray(_E, dtype)
    P = jnp.asarray(_P, dtype)
    rtol, atol = config.rtol, config.atol
    max_step = jnp.asarray(config.max_step, dtype)

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

    ys0 = jnp.where((t_eval == t0)[:, None, None],
                    Y0[None], jnp.zeros((t_eval.shape[0], n, k), dtype))

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    state = _RKState(
        t=t0, y=Y0, f=F0, h_abs=h0, step_rejected=jnp.asarray(False),
        status=common.status_init(t0, t_bound), ys_acc=ys0, nsteps=i32(0),
        naccepted=i32(0), nrejected=i32(0),
        nfev=i32(1 + (0 if config.first_step is not None else 2)),
        stiff_count=i32(0))

    def cond(st: _RKState):
        return st.status == STATUS_RUNNING

    def body(st: _RKState) -> _RKState:
        t, y = st.t, st.y
        # ~10 ulp of t (jnp.nextafter breaks the TPU f64 rewriter; the
        # eps-based spacing is equivalent for the underflow guard)
        min_step = 10 * jnp.finfo(dtype).eps * jnp.abs(t)
        too_small = st.h_abs < min_step
        h_abs = jnp.clip(st.h_abs, min_step, max_step)
        t_new = jnp.minimum(t + h_abs, t_bound)
        h = t_new - t

        # 6 stages + FSAL 7th
        K = jnp.zeros((7, n, k), dtype)
        K = K.at[0].set(st.f)

        for s in range(1, 6):
            a = A[s, :s]
            dy = h * jnp.einsum("j,jnk->nk", a, K[:s])
            K = K.at[s].set(faug(t + C[s] * h, y + dy))

        y_new = y + h * jnp.einsum("j,jnk->nk", B, K[:6])
        f_new = faug(t_new, y_new)
        K = K.at[6].set(f_new)

        err = h * jnp.einsum("j,jnk->nk", E, K)
        scale = atol + rtol * jnp.maximum(jnp.abs(y[:, 0]),
                                          jnp.abs(y_new[:, 0]))
        if config.sens_error_control and m:
            scale_full = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
            error_norm = rms_norm(err / scale_full)
        else:
            error_norm = rms_norm(err[:, 0] / scale)

        finite = jnp.all(jnp.isfinite(y_new)) & jnp.all(jnp.isfinite(err))
        accept = finite & (error_norm < 1.0)
        factor_acc = jnp.where(
            error_norm == 0.0, config.max_factor,
            jnp.minimum(config.max_factor,
                        config.safety * jnp.where(error_norm > 0, error_norm,
                                                  1.0) ** _ERROR_EXPONENT))
        factor_acc = jnp.where(st.step_rejected,
                               jnp.minimum(1.0, factor_acc), factor_acc)
        factor_rej = jnp.where(
            finite,
            jnp.maximum(config.min_factor,
                        config.safety * error_norm ** _ERROR_EXPONENT),
            0.5)
        h_new = h_abs * jnp.where(accept, factor_acc, factor_rej)

        # quartic dense output (rk.py RkDenseOutput)
        Q = jnp.einsum("jnk,jq->qnk", K, P)  # (4, n, k)

        def interp(tv):
            x = ((tv - t) / h)[:, None]  # (T, 1)
            px = jnp.cumprod(jnp.repeat(x, 4, axis=1), axis=1)  # (T, 4)
            return y[None] + h * jnp.einsum("tq,qnk->tnk", px, Q)

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
            # pace check: steps still needed at the controlled h vs budget.
            # Gated on "h stopped growing" (during the initial ramp from
            # the conservative Hairer h0 the projection is meaninglessly
            # large; h grows ~10x per accepted step) and required on
            # SEVERAL consecutive steps, so one early rejection cannot
            # spuriously declare a nonstiff problem stiff.
            t_cur = jnp.where(accept, t_new, t)
            projected = (t_bound - t_cur) / jnp.maximum(h_new, min_step)
            not_growing = h_new <= 1.2 * h_abs
            limited = (~done & not_growing
                       & (projected
                          > (config.max_steps - nsteps).astype(dtype)))
            stiff_count = jnp.where(limited, st.stiff_count + 1, 0)
            status = jnp.where(stiff_count >= 5, common.STATUS_STIFF,
                               status)
        else:
            stiff_count = st.stiff_count

        new_st = _RKState(
            t=jnp.where(accept, t_new, t),
            y=jnp.where(accept, y_new, y),
            f=jnp.where(accept, f_new, st.f),
            h_abs=h_new,
            step_rejected=jnp.where(accept, False, True),
            status=status, ys_acc=ys_acc, nsteps=nsteps,
            naccepted=st.naccepted + jnp.where(accept, 1, 0),
            nrejected=st.nrejected + jnp.where(accept, 0, 1),
            nfev=st.nfev + 6, stiff_count=stiff_count)

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
        order_hist=jnp.zeros((6,), jnp.int32),
        t_final=final.t, y_final=final.y)
