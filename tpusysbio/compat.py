"""Drop-in SciPy-style facades over the TPU-native core.

The reference framework's users call ``scipy.integrate.odeint`` /
``solve_ivp`` and ``scipy.optimize.leastsq`` / ``least_squares``
directly (SURVEY.md §1 L1: ``scipy/integrate/_odepack_py.py:252``,
``scipy/integrate/_ivp/ivp.py:161``, ``scipy/optimize/_minpack_py.py:292``,
``scipy/optimize/_lsq/least_squares.py:267``). This module gives those
call sites a same-shaped surface whose execution is the jitted TPU path
(solvers/, optim/) instead of Fortran — the migration story is "change
the import".

The one honest contract difference: callables must be JAX-traceable
(``jax.numpy`` ops on traced arguments — no data-dependent Python
control flow, no in-place numpy). Everything the reference framework
passes (mass-action RHS, closed-form residuals) already satisfies this.

Static-shape notes (TPU semantics, documented per function):
- ``solve_ivp(t_eval=None)`` returns the ACCEPTED-STEP grid via the
  BDF dense-export channel (scipy returns the same grid); only
  ``method='BDF'/'LSODA'`` support it.
- event occurrence buffers are static: ``max_events`` per event
  function (scipy's lists grow dynamically).
"""

from __future__ import annotations

import types
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tpusysbio import solvers
from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.optim import lm_fit
from tpusysbio.optim.trf import trf_fit
from tpusysbio.solvers import (
    STATUS_DONE,
    STATUS_EVENT,
    STATUS_MAX_STEPS,
    EventSpec,
    OdeSolution,
)

__all__ = ["solve_ivp", "odeint", "leastsq", "least_squares"]

_METHODS = {
    # scipy name -> (solver key, stiff)
    "BDF": "bdf",
    "LSODA": "auto",
    "Radau": "radau",
    "RK45": "dopri5",
    "DOP853": "dopri5",   # same family; honest: order-5 core, not 8
    "Rosenbrock": "rosenbrock",  # extension (not a scipy method name)
    "Adams": "adams",            # extension
}

_STATUS_MSG = {
    0: "The solver successfully reached the end of the integration interval.",
    1: "A termination event occurred.",
    -1: "Integration step failed.",
}


def _direction(t0: float, t1: float):
    return 1.0 if t1 >= t0 else -1.0


def _reflect(fun):
    """Forward-time image of a backward integration: τ = -t."""
    return lambda tau, y: -fun(-tau, y)


def solve_ivp(fun: Callable, t_span, y0, method: str = "RK45",
              t_eval=None, dense_output: bool = False,
              events=None, args=None,
              rtol: float = 1e-3, atol: float = 1e-6,
              first_step: Optional[float] = None,
              max_step: float = float("inf"),
              jac: Optional[Callable] = None,
              max_steps: int = 4096, max_events: int = 8):
    """``scipy.integrate.solve_ivp`` facade (spec ``ivp.py:161``).

    Differences from scipy, all static-shape consequences:
    - ``fun`` (and ``jac``/``events``) must be JAX-traceable.
    - ``t_eval=None`` (scipy: report accepted steps) needs the
      dense-export channel — supported for ``method='BDF'`` and
      ``'LSODA'``; other methods require an explicit ``t_eval``.
    - ``dense_output=True`` likewise BDF/LSODA-only.
    - per-event occurrences are recorded into a static ``max_events``
      buffer (extras are counted, not stored).
    - backward integration (t1 < t0) is lowered by time reflection.
    """
    if method not in _METHODS:
        raise ValueError(f"unknown method {method!r}; "
                         f"one of {sorted(_METHODS)}")
    key = _METHODS[method]
    t0, t1 = float(t_span[0]), float(t_span[1])
    sign = _direction(t0, t1)
    if args:
        base = fun
        fun = lambda t, y: base(t, y, *args)  # noqa: E731
    y0 = jnp.asarray(y0)
    f = fun if sign > 0 else _reflect(fun)
    span = (t0, t1) if sign > 0 else (-t0, -t1)
    jac_f = None
    if jac is not None:
        jac_f = (jac if sign > 0
                 else (lambda tau, y: -jac(-tau, y)))

    needs_dense = t_eval is None or dense_output
    if needs_dense and key != "bdf":
        raise ValueError(
            "t_eval=None / dense_output=True need the dense-export "
            "channel — use method='BDF'")
    if t_eval is None:
        te = jnp.asarray([t1 if sign > 0 else -t1])
    else:
        te = jnp.asarray(np.asarray(t_eval, np.float64) * sign)

    ev_spec = None
    if events is not None:
        ev_list = list(events) if isinstance(events, (list, tuple)) \
            else [events]
        if args:
            ev_fns = [lambda t, y, _e=e: _e(t, y, *args) for e in ev_list]
        else:
            ev_fns = list(ev_list)
        if sign > 0:
            ev_vec = lambda t, y: jnp.stack(  # noqa: E731
                [jnp.asarray(e(t, y), y.dtype) for e in ev_fns])
        else:
            ev_vec = lambda t, y: jnp.stack(  # noqa: E731
                [jnp.asarray(e(-t, y), y.dtype) for e in ev_fns])
        # scipy semantics: direction reverses with integration direction
        # only through g's time argument (handled above); attribute
        # defaults per ivp.py:29-158.
        ev_spec = EventSpec(
            fn=ev_vec,
            direction=tuple(float(getattr(e, "direction", 0.0))
                            for e in ev_list),
            terminal=tuple(bool(getattr(e, "terminal", False))
                           for e in ev_list),
            capacity=max_events)
        if key not in ("bdf",):
            raise ValueError("events need method='BDF'")

    cfg = SolverConfig(rtol=float(rtol), atol=float(atol),
                       max_steps=int(max_steps),
                       first_step=first_step, max_step=float(max_step))
    # explicit methods take no Jacobian (scipy ignores it there too)
    kwargs = ({"jac": jac_f} if jac_f is not None
              and key in ("bdf", "radau", "auto", "rosenbrock") else {})
    if key == "bdf":
        res = solvers.bdf_solve(f, span, y0, te, config=cfg,
                                events=ev_spec, dense_export=needs_dense,
                                **kwargs)
    else:
        res = solvers.SOLVERS[key](f, span, y0, te, config=cfg, **kwargs)

    st = int(res.status)
    status = 0 if st == STATUS_DONE else (1 if st == STATUS_EVENT else -1)
    sol = None
    ts_out = np.asarray(te, np.float64) * sign
    ys_out = np.asarray(res.ys, np.float64)
    if needs_dense:
        dsol = OdeSolution(res)
        if t_eval is None:
            # scipy convention: t = [t0, every accepted step's end time]
            grid = np.concatenate([[t0 * sign], dsol.ts])
            ys_out = np.asarray(dsol(grid))
            ts_out = grid * sign
        if dense_output:
            if sign > 0:
                sol = dsol
            else:
                sol = lambda t: dsol(-np.asarray(t))  # noqa: E731

    t_events = y_events = None
    if ev_spec is not None:
        t_events, y_events = [], []
        cnt = np.asarray(res.event_count)
        et = np.asarray(res.event_t)
        ey = np.asarray(res.event_y)
        for i in range(len(ev_spec.direction)):
            k = int(min(cnt[i], et.shape[1]))
            t_events.append(et[i, :k] * sign)
            y_events.append(ey[i, :k])

    return types.SimpleNamespace(
        t=ts_out, y=ys_out.T, sol=sol,
        t_events=t_events, y_events=y_events,
        nfev=int(res.nfev), njev=int(res.njev), nlu=int(res.nlu),
        status=status, success=status >= 0,
        message=_STATUS_MSG[status])


def odeint(func: Callable, y0, t, args=(), Dfun: Optional[Callable] = None,
           full_output: bool = False, rtol: Optional[float] = None,
           atol: Optional[float] = None, tfirst: bool = False,
           mxstep: int = 0):
    """``scipy.integrate.odeint`` facade (LSODA role; spec
    ``scipy/integrate/_odepack_py.py:252-255``).

    ``func(y, t, *args)`` (``tfirst=False``, the odeint convention) must
    be JAX-traceable. ``t[0]`` is the initial time; ``t`` may increase or
    decrease (decreasing is lowered by time reflection). Defaults match
    odeint's documented ``rtol=atol=1.49012e-8``.
    """
    t = np.asarray(t, np.float64)
    if t.ndim != 1 or t.size < 1:
        raise ValueError("t must be a 1-D array of at least one time")
    rtol = 1.49012e-8 if rtol is None else float(rtol)
    atol = 1.49012e-8 if atol is None else float(atol)
    if tfirst:
        f = (lambda tt, y: func(tt, y, *args)) if args else func
        jac = Dfun if Dfun is None or not args else (
            lambda tt, y: Dfun(tt, y, *args))
    else:
        f = lambda tt, y: func(y, tt, *args)  # noqa: E731
        jac = None if Dfun is None else (
            lambda tt, y: Dfun(y, tt, *args))

    t0 = float(t[0])
    tf = float(t[-1])
    if t.size == 1 or tf == t0:
        ys = np.broadcast_to(np.asarray(y0, np.float64),
                             (t.size, np.asarray(y0).shape[0])).copy()
        return (ys, {"nst": 0, "nfe": 0, "nje": 0,
                     "message": "Integration successful."}) \
            if full_output else ys
    sign = _direction(t0, tf)
    g = f if sign > 0 else _reflect(f)
    jg = None
    if jac is not None:
        jg = jac if sign > 0 else (lambda tau, y: -jac(-tau, y))
    cfg = SolverConfig(rtol=rtol, atol=atol,
                       max_steps=int(mxstep) if mxstep else 4096)
    te = jnp.asarray(t * sign)
    kwargs = {"jac": jg} if jg is not None else {}
    res = solvers.auto_solve(g, (t0 * sign, tf * sign),
                             jnp.asarray(y0), te, config=cfg, **kwargs)
    ys = np.asarray(res.ys, np.float64)
    if not full_output:
        return ys
    info = {
        "nst": int(res.nsteps), "nfe": int(res.nfev),
        "nje": int(res.njev),
        "message": ("Integration successful."
                    if int(res.status) == STATUS_DONE
                    else f"solver status {int(res.status)}"),
    }
    return ys, info


def _wrap_residuals(func, x0, args, Dfun):
    x0 = jnp.asarray(x0, jnp.result_type(float))
    if args:
        r_fn = lambda th: jnp.atleast_1d(jnp.asarray(func(th, *args)))
    else:
        r_fn = lambda th: jnp.atleast_1d(jnp.asarray(func(th)))
    if Dfun is not None:
        if args:
            j_base = lambda th: jnp.asarray(Dfun(th, *args))
        else:
            j_base = lambda th: jnp.asarray(Dfun(th))
        rj_fn = lambda th: (r_fn(th), j_base(th))
    else:
        rj_fn = lambda th: (r_fn(th), jax.jacfwd(r_fn)(th))
    return x0, r_fn, rj_fn


def leastsq(func: Callable, x0, args=(), Dfun: Optional[Callable] = None,
            full_output: bool = False, ftol: float = 1.49012e-8,
            xtol: float = 1.49012e-8, gtol: float = 0.0,
            maxfev: int = 0):
    """``scipy.optimize.leastsq`` facade (MINPACK lmdif/lmder role; spec
    ``scipy/optimize/_minpack_py.py:292``). ``func`` must be
    JAX-traceable; with no ``Dfun`` the Jacobian is exact forward-mode
    autodiff rather than MINPACK's finite differences.
    """
    x0, r_fn, rj_fn = _wrap_residuals(func, x0, args, Dfun)
    n = int(x0.shape[0])
    max_iter = int(maxfev) if maxfev else 100 * (n + 1)
    cfg = FitConfig(ftol=float(ftol), xtol=float(xtol),
                    gtol=float(gtol) if gtol else 1e-14,
                    max_iter=max_iter)
    fit = jax.jit(lambda th: lm_fit(r_fn, rj_fn, th, cfg))(x0)
    status = int(fit.status)
    # MINPACK ier: 1-4 are success flavors, 5 = exceeded maxfev
    ier = {1: 4, 2: 1, 3: 2}.get(status, 5)
    x = np.asarray(fit.theta)
    if not full_output:
        return x, ier
    fvec = np.asarray(r_fn(fit.theta))
    infodict = {
        "fvec": fvec, "nfev": int(fit.nfev) + int(fit.njev),
        "njev": int(fit.njev),
    }
    mesg = ("Both actual and predicted relative reductions in the sum "
            "of squares are at most ftol." if ier in (1, 2, 3, 4)
            else "Number of iterations has reached max_iter.")
    cov_x = None if fit.cov is None else np.asarray(fit.cov)
    return x, cov_x, infodict, mesg, ier


def least_squares(fun: Callable, x0, jac=None, bounds=(-np.inf, np.inf),
                  method: str = "trf", ftol: float = 1e-8,
                  xtol: float = 1e-8, gtol: float = 1e-8,
                  loss: str = "linear", f_scale: float = 1.0,
                  max_nfev: Optional[int] = None, args=(),
                  tr_solver: Optional[str] = None):
    """``scipy.optimize.least_squares`` facade (spec
    ``scipy/optimize/_lsq/least_squares.py:267``). ``fun`` must be
    JAX-traceable; ``jac`` may be a callable (callable-only: the autodiff
    Jacobian is exact, so the '2-point'/'3-point' strings are pointless
    here and raise). ``method='trf'`` (bounds, robust losses) and
    ``method='lm'`` (unbounded) are supported; ``tr_solver='svd'``
    selects the SVD trust-region subproblem.
    """
    if isinstance(jac, str):
        raise ValueError(
            "finite-difference jac strings are not supported: the "
            "Jacobian is exact forward-mode autodiff when jac=None")
    if method not in ("trf", "lm"):
        raise ValueError(f"method {method!r} not supported (trf | lm)")
    x0, r_fn, rj_fn = _wrap_residuals(fun, x0, args, jac)
    n = int(x0.shape[0])
    cfg = FitConfig(ftol=float(ftol), xtol=float(xtol), gtol=float(gtol),
                    max_iter=int(max_nfev) if max_nfev else 100 * n)

    lb = np.broadcast_to(np.asarray(bounds[0], np.float64), (n,))
    ub = np.broadcast_to(np.asarray(bounds[1], np.float64), (n,))
    unbounded = bool(np.all(np.isinf(lb)) and np.all(np.isinf(ub)))

    if method == "lm" or (unbounded and loss == "linear"):
        if not unbounded:
            raise ValueError("method='lm' supports no bounds")
        fit = jax.jit(lambda th: lm_fit(r_fn, rj_fn, th, cfg))(x0)
    else:
        sub = "svd" if tr_solver == "svd" else "normal"
        fit = jax.jit(lambda th: trf_fit(
            r_fn, rj_fn, th, jnp.asarray(lb), jnp.asarray(ub), cfg,
            subproblem=sub, loss=loss, f_scale=float(f_scale)))(x0)

    x = np.asarray(fit.theta)
    r = np.asarray(r_fn(fit.theta))
    J = np.asarray(rj_fn(fit.theta)[1])
    g = J.T @ r
    active = np.zeros(n, int)
    if not unbounded:
        active[np.isclose(x, lb)] = -1
        active[np.isclose(x, ub)] = 1
    status = int(fit.status)
    msgs = {1: "`gtol` termination condition is satisfied.",
            2: "`ftol` termination condition is satisfied.",
            3: "`xtol` termination condition is satisfied.",
            0: "The maximum number of iterations is exceeded."}
    return types.SimpleNamespace(
        x=x, cost=float(fit.cost), fun=r, jac=J, grad=g,
        optimality=float(np.max(np.abs(g))), active_mask=active,
        nfev=int(fit.nfev) + int(fit.njev), njev=int(fit.njev),
        status=status, success=status > 0,
        message=msgs.get(status, f"status {status}"))
