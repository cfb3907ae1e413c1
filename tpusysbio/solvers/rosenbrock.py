"""Linearly-implicit Rosenbrock 2(3) stiff stepper (Shampine–Reichelt ode23s).

Why a Rosenbrock stepper at all (SURVEY.md §7 M8, BASELINE.json:5 names
"BDF and Rosenbrock steppers"): no Newton iteration — every step costs
exactly one Jacobian, one factorization of ``W = I - h d J`` and three
linear solves. *Fixed work per step* is the ideal lockstep shape for
vmapped multi-start ensembles, where the BDF's data-dependent Newton/reject
paths make the batch pay the union of all members' work (SURVEY.md §7 hard
part 1). This may be the default ensemble integrator once profiled.

Scheme: the modified Rosenbrock pair of Shampine & Reichelt (the MATLAB
``ode23s`` method), d = 1/(2+sqrt(2)), with its quadratic dense-output
interpolant. Order 2 with a 3rd-order error companion — robust at moderate
tolerances; BDF remains the high-accuracy reference path.

Sensitivity columns ride the same linear solves with the state-block ``W``
(a W-method treatment — the off-diagonal coupling of the augmented Jacobian
is dropped from ``W`` but kept in the RHS). Accuracy is maintained by the
embedded error control; golden tests gate it (tests/test_sens.py).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

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

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)


class _RosState(NamedTuple):
    t: jax.Array
    y: jax.Array              # (n, k)
    f: jax.Array              # (n, k) RHS at (t, y)
    h_abs: jax.Array
    step_rejected: jax.Array
    status: jax.Array
    ys_acc: jax.Array
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    njev: jax.Array
    nlu: jax.Array


def rosenbrock_solve(
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

    def dfdt(t, Y):
        # time partial of the augmented RHS via jvp in t (non-autonomous term)
        return jax.jvp(lambda tt: faug(tt, Y), (t,),
                       (jnp.ones((), dtype),))[1]

    factor_fn, solve_fn = make_linear_solver(config.linear_solver,
                                             config.jac_bandwidth)
    rtol, atol = config.rtol, config.atol
    max_step = jnp.asarray(config.max_step, dtype)
    I_n = jnp.eye(n, dtype=dtype)
    d = jnp.asarray(_D, dtype)

    Y0 = y0[:, None]
    if m:
        Y0 = jnp.concatenate([Y0, jnp.asarray(s0, dtype)], axis=1)
    F0 = faug(t0, Y0)
    if config.first_step is None:
        h0 = common.select_initial_step(
            f, t0, y0, F0[:, 0], t_bound, config.max_step, rtol, atol,
            order=2)
    else:
        h0 = jnp.asarray(config.first_step, dtype)
    h0 = jnp.minimum(h0, jnp.abs(t_bound - t0))

    ys0 = jnp.where((t_eval == t0)[:, None, None],
                    Y0[None], jnp.zeros((t_eval.shape[0], n, k), dtype))

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    state = _RosState(
        t=t0, y=Y0, f=F0, h_abs=h0, step_rejected=jnp.asarray(False),
        status=common.status_init(t0, t_bound), ys_acc=ys0, nsteps=i32(0),
        naccepted=i32(0), nrejected=i32(0),
        nfev=i32(1 + (0 if config.first_step is not None else 2)),
        njev=i32(0), nlu=i32(0))

    def cond(st: _RosState):
        return st.status == STATUS_RUNNING

    def body(st: _RosState) -> _RosState:
        t, Y = st.t, st.y
        # ~10 ulp of t (jnp.nextafter breaks the TPU f64 rewriter; the
        # eps-based spacing is equivalent for the underflow guard)
        min_step = 10 * jnp.finfo(dtype).eps * jnp.abs(t)
        too_small = st.h_abs < min_step
        h_abs = jnp.clip(st.h_abs, min_step, max_step)
        t_new = jnp.minimum(t + h_abs, t_bound)
        h = t_new - t

        J = jac(t, Y[:, 0])
        W_fact = factor_fn(I_n - (h * d) * J)
        T = dfdt(t, Y)

        F0v = st.f
        hdT = (h * d) * T
        k1 = solve_fn(W_fact, F0v + hdT)
        F1 = faug(t + 0.5 * h, Y + (0.5 * h) * k1)
        k2 = solve_fn(W_fact, F1 - k1) + k1
        Y_new = Y + h * k2
        F2 = faug(t_new, Y_new)
        k3 = solve_fn(
            W_fact, F2 - _E32 * (k2 - F1) - 2.0 * (k1 - F0v) + hdT)
        err = (h / 6.0) * (k1 - 2.0 * k2 + k3)

        scale = atol + rtol * jnp.maximum(jnp.abs(Y[:, 0]),
                                          jnp.abs(Y_new[:, 0]))
        if config.sens_error_control and m:
            scale_full = atol + rtol * jnp.maximum(jnp.abs(Y),
                                                   jnp.abs(Y_new))
            error_norm = rms_norm(err / scale_full)
        else:
            error_norm = rms_norm(err[:, 0] / scale)

        finite = jnp.all(jnp.isfinite(Y_new)) & jnp.all(jnp.isfinite(err))
        accept = finite & (error_norm < 1.0)
        exp = jnp.asarray(-1.0 / 3.0, dtype)  # 3rd-order error companion
        factor_acc = jnp.where(
            error_norm == 0.0, config.max_factor,
            jnp.minimum(config.max_factor,
                        config.safety
                        * jnp.where(error_norm > 0, error_norm, 1.0) ** exp))
        factor_acc = jnp.where(st.step_rejected,
                               jnp.minimum(1.0, factor_acc), factor_acc)
        factor_rej = jnp.where(
            finite,
            jnp.maximum(config.min_factor,
                        config.safety * error_norm ** exp),
            0.5)
        h_new = h_abs * jnp.where(accept, factor_acc, factor_rej)

        # ntrp23s quadratic interpolant
        one_m_2d = 1.0 - 2.0 * d

        def interp(tv):
            s = ((tv - t) / h)[:, None, None]  # (T, 1, 1)
            w1 = s * (1.0 - s) / one_m_2d
            w2 = s * (s - 2.0 * d) / one_m_2d
            return Y[None] + h * (w1 * k1[None] + w2 * k2[None])

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

        new_st = _RosState(
            t=jnp.where(accept, t_new, t),
            y=jnp.where(accept, Y_new, Y),
            f=jnp.where(accept, F2, st.f),
            h_abs=h_new,
            step_rejected=~accept,
            status=status, ys_acc=ys_acc, nsteps=nsteps,
            naccepted=st.naccepted + jnp.where(accept, 1, 0),
            nrejected=st.nrejected + jnp.where(accept, 0, 1),
            nfev=st.nfev + 2, njev=st.njev + 1, nlu=st.nlu + 1)

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
