"""Shared stepper infrastructure: norms, initial-step heuristic, statuses.

Spec parity targets (SURVEY.md §2 #11):
- RMS norm: ``scipy/integrate/_ivp/common.py:63-65``
- Hairer initial-step heuristic: ``select_initial_step``,
  ``scipy/integrate/_ivp/common.py:68-134``

Status codes replace the reference stack's mixed error signalling
(``odeint`` warnings at ``scipy/integrate/_odepack_py.py:256-259``, MINPACK
``ier`` flags) with per-member integer codes carried in the solver state —
jit-compatible, and maskable across a vmapped ensemble so one failed member
never aborts the batch (SURVEY.md §5 failure detection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

STATUS_RUNNING = 0
STATUS_DONE = 1
STATUS_TOO_SMALL_STEP = 2   # h underflowed machine spacing (bdf.py:340-341 analogue)
STATUS_NONFINITE = 3        # RHS produced non-finite values (bdf.py:44-45 analogue)
STATUS_MAX_STEPS = 4        # step budget exhausted (lockstep safety net)
STATUS_SS_FAIL = 5          # algebraic steady-state Newton did not converge
STATUS_STIFF = 6            # explicit stepper detected stiffness (handoff)
STATUS_EVENT = 7            # a terminal event fired (successful stop, like
                            # scipy solve_ivp status=1, ivp.py:590-596)


def rms_norm(x: jax.Array) -> jax.Array:
    """sqrt(mean(x^2)) over all elements (common.py:63-65)."""
    return jnp.sqrt(jnp.mean(jnp.square(x)))


class EventSpec(NamedTuple):
    """State-dependent events ``g(t, y) = 0`` (scipy ``solve_ivp(events=…)``
    contract, ``scipy/integrate/_ivp/ivp.py:29-158``), TPU-native form.

    The reference detects a sign change of each event function across every
    accepted step and locates the root on the dense output with ``brentq``,
    appending to Python lists and honoring ``terminal``/``direction``
    attributes. Here the same contract is expressed with static shapes so
    it lives inside the jitted ``lax.while_loop`` and vmaps over ensembles
    (heterogeneous events via parameters closed over in ``fn``):

    - ``fn(t, y) -> (E,)`` evaluates ALL event functions at once (one
      vector instead of a list of callables — E is static).
    - roots are located by in-loop bisection on the stepper's dense-output
      polynomial (static iteration count; |interval| shrinks by 2^-iters,
      48 iterations ≈ f64-exact for any realistic step size).
    - occurrences are recorded into a static ``(E, capacity)`` buffer;
      ``event_count`` says how many are valid (extras beyond capacity are
      counted but not stored — no dynamic allocation in jit).
    - a fired terminal event stops integration at the event time with
      status ``STATUS_EVENT``; ``t_eval`` points past it stay unfilled,
      and ``y_final`` is the interpolated column block at the event time.

    Attributes:
      fn: ``(t, y) -> (E,)`` event values; must follow ``y``'s dtype.
      direction: per-event trigger direction, +1 (g rising through 0),
        -1 (falling), 0 (either) — scipy ``event.direction`` semantics.
      terminal: per-event bool, stop integration at the first occurrence
        (scipy ``event.terminal``).
      capacity: max recorded occurrences per event (static buffer width).
      bisect_iters: static bisection iteration count per detection.
    """

    fn: object
    direction: tuple = ()
    terminal: tuple = ()
    capacity: int = 8
    bisect_iters: int = 48


class IntegrateResult(NamedTuple):
    """Dense-output evaluations at the requested times plus diagnostics.

    ``ys``: (T, n) solution at ``t_eval``; ``sens``: (T, n, m) forward
    sensitivities (zeros when m == 0). Diagnostic counters mirror the
    reference's ``full_output=1`` channel (``nfev/njev/nlu``,
    ``scipy/integrate/_odepack_py.py:264-265``; SURVEY.md §5 tracing).
    """

    ys: jax.Array
    sens: jax.Array
    status: jax.Array       # int32 scalar, one of STATUS_*
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    njev: jax.Array
    nlu: jax.Array
    # accepted-step counts per BDF order 1..5 (zeros for other steppers) —
    # the "order histogram" observability channel (SURVEY.md §5)
    order_hist: jax.Array = None
    # Final integration state (t, column block (n, 1+m)) — the warm-handoff
    # channel: ``auto_solve`` continues a stiffness-aborted explicit run
    # with the BDF stepper from here instead of restarting at t0.
    t_final: jax.Array = None
    y_final: jax.Array = None
    # Event channel (EventSpec; scipy solve_ivp t_events/y_events analogue,
    # ivp.py:597-613): static (E, K) time buffer (+inf = unfilled slot),
    # (E, K, n) states at the event times, (E,) occurrence counts.
    event_t: jax.Array = None
    event_y: jax.Array = None
    event_count: jax.Array = None
    # Dense-export channel (``bdf_solve(dense_export=True)``): the
    # per-accepted-step interpolant parameters for the post-hoc
    # continuous OdeSolution (solvers/dense.py; scipy OdeSolution spec,
    # scipy/integrate/_ivp/common.py:137). (S,)/(S,)/(S,) +
    # per-part tuple of (S, MAX_ORDER+1, n, k_p); slots past
    # ``naccepted`` are unfilled.
    seg_t: jax.Array = None
    seg_h: jax.Array = None
    seg_order: jax.Array = None
    seg_D: tuple = None

    @property
    def success(self):
        # a terminal-event stop is a successful termination, matching
        # scipy solve_ivp status=1 (ivp.py:746-753)
        return (self.status == STATUS_DONE) | (self.status == STATUS_EVENT)


def select_initial_step(f, t0, y0, f0, t_bound, max_step, rtol, atol, order):
    """Hairer-Wanner initial step size (common.py:68-134, direction=+1).

    ``order`` is the error-estimator order + 1 exponent used by SciPy
    (e.g. 1 for BDF start at order 1, 5 for RK45).
    """
    dtype = y0.dtype
    scale = atol + jnp.abs(y0) * rtol
    d0 = rms_norm(y0 / scale)
    d1 = rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), jnp.asarray(1e-6, dtype),
                   0.01 * d0 / d1)
    interval = jnp.abs(t_bound - t0)
    # Zero-length intervals (padded segments of a timed-perturbation
    # experiment; the stepper no-ops on them) must not divide by h0=0 —
    # the NaN would trip the sanitizer lane even though nothing reads it.
    empty = interval <= 0
    h0 = jnp.where(empty, jnp.ones((), dtype),
                   jnp.minimum(h0, 0.5 * interval))

    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1)
    d2 = rms_norm((f1 - f0) / scale) / h0

    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(jnp.asarray(1e-6, dtype), h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1.0)),
    )
    h = jnp.minimum(jnp.minimum(100 * h0, h1),
                    jnp.minimum(interval, jnp.asarray(max_step, dtype)))
    return jnp.where(empty, jnp.ones((), dtype), h)


def status_init(t0, t_bound):
    """Initial stepper status: DONE for an empty interval (t0 >= t_bound).

    Zero-length integrations arise as PADDED SEGMENTS of timed-perturbation
    experiments (data/experiment.py ``Experiment.inputs``): under vmap,
    experiments with fewer events than the batch maximum carry trailing
    ``[t_end, t_end]`` segments, which must no-op at zero cost — the
    while_loop body never runs, ``ys`` keeps only the ``t_eval == t0``
    prefill, and ``y_final`` is the initial column block unchanged."""
    return jnp.where(t_bound > t0, STATUS_RUNNING,
                     STATUS_DONE).astype(jnp.int32)


def debug_check(enabled: bool, pred, msg: str, **fmt_kwargs):
    """In-jit assertion lane (SURVEY.md §5 sanitizers): when ``enabled``
    (SolverConfig.debug_checks, a STATIC flag — zero cost when off), emit
    a ``checkify.check``. The production failure contract is unchanged
    (non-finite members are status-flagged and masked, never abort the
    batch); this lane is for debugging runs where those same conditions
    should THROW with a message and the offending values — wrap the
    entry point with ``tpusysbio.utils.checked`` to functionalize and
    raise. Usage::

        cfg = SolverConfig(debug_checks=True)
        sim = utils.checked(jax.jit(lambda p: model.simulate(p, ...)))
        sim(p)   # raises JaxRuntimeError("non-finite RHS at t=...") """
    if enabled:
        from jax.experimental import checkify

        checkify.check(pred, msg, **fmt_kwargs)


def interp_accumulate(t_eval, t_old, t_new, interp_fn, ys_acc):
    """Fold dense output into the ``t_eval`` accumulator after an accepted step.

    Rather than restarting integration at each measurement time (the
    reference evaluates solver output at experimental timepoints,
    BASELINE.json:5), the interpolant for the just-accepted step is evaluated
    at ALL static ``t_eval`` points and written where
    ``t_old < t <= t_new`` — static shapes, no data-dependent control flow
    (SURVEY.md §3.2 rebuild note).

    ``interp_fn(t_vec) -> (T, ...)``; ``ys_acc``: (T, ...) accumulator.
    """
    mask = (t_eval > t_old) & (t_eval <= t_new)
    vals = interp_fn(t_eval)
    mask_b = mask.reshape(mask.shape + (1,) * (ys_acc.ndim - 1))
    return jnp.where(mask_b, vals, ys_acc)


def interp_accumulate_windowed(t_eval, lo, t_old, t_new, interp_fn, ys_acc,
                               window: int, gate=True):
    """Windowed :func:`interp_accumulate` (SolverConfig.dense_window).

    ``lo`` is the index of the first ``t_eval`` point > ``t_old`` (the
    caller already computed it for the step-size cap). The caller
    guarantees every point in ``(t_old, t_new]`` lies in
    ``[lo, lo + window)`` by capping the step at the (window-1)-th next
    grid point, so evaluating and writing only that slice is exact —
    ``window``-row interpolation einsum + one in-place
    ``dynamic_update_slice`` instead of T rows + a full-accumulator
    rewrite per step. ``gate`` (e.g. the step's accept flag) folds into
    the slice mask so a gated-off call still writes only slice-sized
    no-op traffic, never the full accumulator.
    """
    T = t_eval.shape[0]
    if window >= T:
        return jnp.where(
            gate, interp_accumulate(t_eval, t_old, t_new, interp_fn,
                                    ys_acc), ys_acc)
    # keep the slice in range; points that shift into view get masked
    lo_s = jnp.minimum(lo, T - window)
    tv = lax.dynamic_slice_in_dim(t_eval, lo_s, window)
    mask = (tv > t_old) & (tv <= t_new) & gate
    vals = interp_fn(tv)
    acc_slice = lax.dynamic_slice_in_dim(ys_acc, lo_s, window)
    mask_b = mask.reshape(mask.shape + (1,) * (ys_acc.ndim - 1))
    new_slice = jnp.where(mask_b, vals.astype(ys_acc.dtype), acc_slice)
    return lax.dynamic_update_slice_in_dim(ys_acc, new_slice, lo_s, 0)
