"""Variable-order BDF/NDF stiff integrator as one jitted ``lax.while_loop``.

Algorithm spec parity: ``scipy/integrate/_ivp/bdf.py`` (SURVEY.md §2 #9,
§3.2) — NDF constants kappa/gamma/alpha (bdf.py:244-247), modified Newton
with reused factorization (bdf.py:36-69), quasi-constant step via the
difference array ``D`` with the ``change_D``/``compute_R`` rescaling,
order adaptation from ``D[order±1]`` error estimates (bdf.py:421-448), and
the ``BdfDenseOutput`` interpolant (bdf.py:457-479) for measurement-time
alignment. Deliberate SciPy quirks preserved for step-sequence parity:
``current_jac`` resets at each fresh step, and the factorization is NOT
invalidated on an error-test rejection (stale ``c`` reused, bdf.py:397-398).

TPU-native design decisions (NOT a port — SURVEY.md §7 M2):

- The reference's three nested host loops (solve_ivp step loop ⇄ Fortran
  LSODA ⇄ per-step Python RHS callbacks, SURVEY.md §3.1) collapse into one
  ``lax.while_loop`` whose body performs exactly one step *attempt*; Newton
  retry with a fresh Jacobian, step rejection, and acceptance are branchless
  ``jnp.where`` merges of the full carry (SURVEY.md §7 hard part 2), so the
  stepper vmaps over multi-start ensembles with per-member adaptivity.
- State is a column block: column 0 is the model state, columns 1..m are
  forward sensitivities. The Newton matrix of the augmented system is
  block-diagonal with identical blocks ``I - c J``, so one factorization
  serves state and all sensitivity columns as a multi-RHS solve — the
  CVODES staggered/simultaneous-corrector trick (SURVEY.md §3.3) expressed
  as a matmul, the MXU-friendly shape.
- The column block is stored as a tuple of PARTS with independent dtypes:
  with ``config.sens_precision='f32'`` the state part (column 0, error
  control, dense output) stays f64 while the entire sensitivity part —
  RHS evaluations, Newton solves, difference-array bookkeeping, dense
  output — lives in f32 (docs/PERFORMANCE.md: f64 is software-emulated on
  TPU; sensitivities only need LM-Jacobian accuracy). The state trajectory
  is bit-identical to full precision.
- ``t_eval`` alignment evaluates the dense-output polynomial at ALL static
  output times after each accepted step under a mask — static shapes, no
  restarts at measurement times (SURVEY.md §3.2 rebuild note).
- All linear algebra goes through ``tpusysbio.linalg`` (the stock XLA LU is
  f64-broken on this TPU — SURVEY.md §7 environment notes).

Only forward integration (``t_span[1] > t_span[0]``) is supported at
this layer; ``OdeModel.simulate`` accepts decreasing ``t_span`` and
lowers it onto the forward stepper by time reflection (adjoints remain
out of scope by design — forward sensitivities are the Jacobian source,
BASELINE.json:5).
"""

from __future__ import annotations

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

MAX_ORDER = 5
NEWTON_MAXITER = 4
_DEBUG = False  # eager-mode (disable_jit) tracing of step decisions
# Rows of the difference array: D[0..order+2] live, order <= 5 -> 8 rows.
D_ROWS = MAX_ORDER + 3


def _ndf_constants(dtype):
    """NDF modification constants (bdf.py:244-247)."""
    kappa = jnp.array([0.0, -0.1850, -1 / 9, -0.0823, -0.0415, 0.0], dtype)
    k = jnp.arange(1, MAX_ORDER + 1, dtype=dtype)
    gamma = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(1.0 / k)])
    alpha = (1.0 - kappa) * gamma
    error_const = kappa * gamma + 1.0 / jnp.arange(1, MAX_ORDER + 2, dtype=dtype)
    return kappa, gamma, alpha, error_const


def _compute_R(factor, dtype):
    """Full (MAX_ORDER+1)^2 difference-rescaling matrix (bdf.py compute_R).

    Entries are independent of the working order: ``compute_R(order, f)`` is
    the leading submatrix of ``compute_R(MAX_ORDER, f)``, so one full static
    matrix plus masking replaces the reference's dynamically-sized one.
    """
    i = jnp.arange(MAX_ORDER + 1, dtype=dtype)[:, None]
    j = jnp.arange(MAX_ORDER + 1, dtype=dtype)[None, :]
    body = (i - 1.0 - factor * j) / jnp.maximum(i, 1.0)
    m = jnp.where(i == 0, 1.0, jnp.where(j == 0, 0.0, body))
    return jnp.cumprod(m, axis=0)


def _change_D(D, order, factor):
    """Rescale differences for a step-size change (bdf.py change_D).

    Applies ``(R(order, factor) @ R(order, 1)).T`` to ``D[:order+1]`` with a
    runtime ``order`` via a D_ROWS² masked transform embedded in the
    identity — one einsum, no dynamic slicing.
    """
    dtype = D.dtype
    factor = factor.astype(dtype)
    P = _compute_R(factor, dtype) @ _compute_R(jnp.ones((), dtype), dtype)
    rows = jnp.arange(D_ROWS)
    i = rows[:, None]
    j = rows[None, :]
    Ppad = jnp.zeros((D_ROWS, D_ROWS), dtype)
    Ppad = Ppad.at[: MAX_ORDER + 1, : MAX_ORDER + 1].set(P)
    in_block = (i <= order) & (j <= order)
    eye = (i == j).astype(dtype)
    # D_new[i] = sum_j P[j, i] * D[j] within the block, identity outside.
    T = jnp.where(in_block, Ppad.T, eye)
    return _rowmix(T, D)


# Static per-part size (n·k) above which the row-mix contractions go
# back to dot_general. Measured on v5e (round 5): elementwise wins for
# MAPK-22 parts (22·31 → 249→352 int/s/chip) because XLA lowers the
# tiny dot to a bf16 multi-pass MXU algorithm with per-row
# dynamic-update-slice assembly; the dot wins for compute-bound
# EGFR-97 (97·13: 218.9 s r4 einsum vs 232.7 s all-elementwise) where
# the R-fold operand re-reads of the broadcast form cost more than the
# DUS assembly. 1024 splits the two measured regimes.
_ELEMENTWISE_PART_MAX = 1024


def _part_size(D):
    return D.shape[-2] * D.shape[-1] if D.ndim >= 3 else D.shape[-1]


def _rowmix(T, D):
    """``(R,R) @ (R, ...)`` small-contraction product. For small parts
    (``n·k ≤ _ELEMENTWISE_PART_MAX``) an explicit broadcast
    multiply+sum: XLA:TPU lowers the equivalent ``dot_general`` to a
    bf16 multi-pass MXU algorithm with per-row dynamic-update-slice
    assembly and layout-transposed operand copies — measured ~37% of
    the tight-path wall on the r5 device trace (hlo_stats: the
    f32[8,B,n,m]/bf16[4,B,n,m] DUS+copy cluster). The contraction dim
    here is 8; the elementwise form fuses into one VPU reduction
    instead. Large parts keep the dot (see _ELEMENTWISE_PART_MAX)."""
    if _part_size(D) > _ELEMENTWISE_PART_MAX:
        return jnp.einsum("ij,j...->i...", T, D)
    Texp = T.reshape(T.shape + (1,) * (D.ndim - 1))
    return jnp.sum(Texp * D[None], axis=1)


def _rowsum(w, D):
    """``(R,) · (R, ...)`` weighted row sum, same size-gated lowering
    choice as :func:`_rowmix`."""
    if _part_size(D) > _ELEMENTWISE_PART_MAX:
        return jnp.einsum("i,i...->...", w, D)
    wexp = w.reshape(w.shape + (1,) * (D.ndim - 1))
    return jnp.sum(wexp * D, axis=0)


class _BDFState(NamedTuple):
    t: jax.Array
    h_abs: jax.Array
    order: jax.Array          # int32, 1..5
    D: tuple                  # per-part (D_ROWS, n, k_p) difference arrays
    J: jax.Array              # (n, n) cached state Jacobian
    fact: object              # factorization pytree of I - c*J
    lu_valid: jax.Array       # bool: fact usable (SciPy reuse semantics)
    current_jac: jax.Array    # bool: J evaluated at current attempt point
    last_accepted: jax.Array  # bool: previous body iteration accepted a step
    n_equal_steps: jax.Array  # int32
    status: jax.Array         # int32
    ys_acc: tuple             # per-part (T, n, k_p) dense output accumulators
    nsteps: jax.Array
    naccepted: jax.Array
    nrejected: jax.Array
    nfev: jax.Array
    njev: jax.Array
    nlu: jax.Array
    order_hist: jax.Array     # (MAX_ORDER+1,) accepted steps per order
    # event channel (zero-size when no EventSpec is given)
    g_old: jax.Array          # (E,) event values at the accepted point
    ev_t: jax.Array           # (E, K) recorded event times (+inf unfilled)
    ev_y: jax.Array           # (E, K, n) states at the recorded times
    ev_count: jax.Array       # (E,) int32 occurrence counts
    # dense-export channel (zero-capacity unless dense_export=True): the
    # per-accepted-step interpolant parameters for the post-hoc
    # OdeSolution (solvers/dense.py)
    seg_t: jax.Array          # (S,) step end times (+inf unfilled)
    seg_h: jax.Array          # (S,) interpolant step sizes
    seg_order: jax.Array      # (S,) int32 interpolant orders
    seg_D: tuple              # per-part (S, MAX_ORDER+1, n, k_p) D rows


def bdf_solve(
    f: Callable,
    t_span,
    y0: jax.Array,
    t_eval: jax.Array,
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    s0: Optional[jax.Array] = None,
    jac: Optional[Callable] = None,
    events: Optional[common.EventSpec] = None,
    dense_export: bool = False,
) -> IntegrateResult:
    """Integrate ``dy/dt = f(t, y)`` from t_span[0] to t_span[1] (forward).

    Args:
      f: RHS ``f(t, y) -> (n,)`` (parameters closed over; must follow the
        dtype of ``y`` so the stepper can control compute precision).
      t_span: ``(t0, t1)`` with ``t1 > t0``.
      y0: initial state ``(n,)``.
      t_eval: static sorted output times within ``[t0, t1]``.
      config: solver configuration (tolerances, step budget, linear solver).
      sens_rhs: optional ``(t, y, S) -> (n, m)`` computing the forward
        sensitivity RHS ``(∂f/∂y) S + ∂f/∂p``; enables in-stepper
        sensitivities. Requires ``s0`` of shape (n, m).
      jac: optional analytic state Jacobian ``(t, y) -> (n, n)``
        (closed-form mass-action fast path); jacfwd otherwise.
      events: optional :class:`~tpusysbio.solvers.common.EventSpec` —
        state-dependent event detection ``g(t, y) = 0`` with per-event
        direction/terminal semantics (scipy ``solve_ivp(events=…)``
        contract, ``scipy/integrate/_ivp/ivp.py:29-158``), root-found by
        in-loop bisection on the dense-output polynomial after each
        accepted step. Fills ``event_t``/``event_y``/``event_count`` on
        the result; a terminal event stops with ``STATUS_EVENT``.
      dense_export: record each accepted step's interpolant parameters
        into static ``max_steps``-capacity result buffers
        (``seg_t/seg_h/seg_order/seg_D``) for the post-hoc continuous
        :class:`~tpusysbio.solvers.dense.OdeSolution` (scipy
        ``dense_output=True`` analogue, spec
        ``scipy/integrate/_ivp/common.py:137``). Off by default — the
        buffers cost ``max_steps·(MAX_ORDER+1)·n·(1+m)`` per member.

    Returns an ``IntegrateResult`` with ``ys`` (T, n), ``sens`` (T, n, m).
    """
    dtype = jnp.result_type(y0.dtype)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(t_span[0], dtype)
    t_bound = jnp.asarray(t_span[1], dtype)
    n = y0.shape[0]
    t_eval = jnp.asarray(t_eval, dtype)
    # dense-output windowing (SolverConfig.dense_window): active only
    # when the window is a strict subset of the grid
    dw = int(config.dense_window)
    dw = dw if 0 < dw < t_eval.shape[0] else 0

    if sens_rhs is not None:
        if s0 is None:
            raise ValueError("sens_rhs requires s0 of shape (n, m)")
        m = s0.shape[1]
    else:
        m = 0

    if jac is None:
        def jac(t, y):
            return jax.jacfwd(lambda yy: f(t, yy))(y)

    factor_fn, solve_fn = make_linear_solver(config.linear_solver,
                                             config.jac_bandwidth)

    # Mixed-precision hot loop (config.mixed_precision): RHS/Jacobian/
    # solves in f32, accumulation + control in f64 (screening mode).
    mp = config.mixed_precision and dtype == jnp.float64
    cdt = jnp.float32 if mp else dtype
    if mp:
        # f32 hot loop INCLUDING storage: the column block, difference
        # arrays, and dense output all live in f32 (measured: f64 D-array
        # bookkeeping of the 31-column block cost 3x the per-iteration
        # time of the tight config — docs/PERFORMANCE.md round-2 #3).
        # Time/step control stays f64.
        def jac_c(t, y):
            return jac(t, y.astype(cdt)).astype(cdt)

        def factor_c(a):
            return factor_fn(a.astype(cdt))

        def solve_c(fact, b):
            return solve_fn(fact, b.astype(cdt))

        def f_c(t, y):
            return f(t.astype(cdt), y.astype(cdt))
    else:
        jac_c, factor_c, solve_c, f_c = jac, factor_fn, solve_fn, f

    # Column parts: [(n_cols, dtype), ...]. With sens_precision='f32' the
    # sensitivity columns live ENTIRELY in f32 (storage, RHS, solves,
    # bookkeeping, dense output); part 0 (the state) drives all control.
    # Under mixed_precision the WHOLE block (state included) is stored in
    # f32 — time/step control stays f64 (screening mode).
    split = (config.sens_precision == "f32" and m > 0 and not mp
             and dtype == jnp.float64 and not config.sens_error_control)
    f32 = jnp.float32
    if split:
        parts = ((1, dtype), (m, f32))
    elif mp:
        parts = ((1 + m, f32),)
    else:
        parts = ((1 + m, dtype),)

    def bmap(fn, *blocks):
        return tuple(fn(*(b[i] for b in blocks), i)
                     for i in range(len(parts)))

    def _fact32(fact):
        return jax.tree.map(
            lambda a: a.astype(f32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, fact)

    # part-wise augmented RHS: returns a block tuple
    if m == 0:
        def faug_b(t, Yb):
            return (f_c(t, Yb[0][:, 0])[:, None],)
    elif split:
        def faug_b(t, Yb):
            y = Yb[0][:, 0]
            fy = f(t, y)
            fs = sens_rhs(t.astype(f32), y.astype(f32), Yb[1])
            return (fy[:, None], fs)
    else:
        def faug_b(t, Yb):
            Y = Yb[0]
            y = Y[:, 0]
            if mp:
                # storage is already f32; evaluate in f32 throughout
                fy = f(t.astype(cdt), y)
                fs = sens_rhs(t.astype(cdt), y, Y[:, 1:])
                return (jnp.concatenate([fy[:, None], fs], axis=1),)
            fy = f(t, y)
            fs = sens_rhs(t, y, Y[:, 1:])
            return (jnp.concatenate([fy[:, None], fs], axis=1),)

    _, gamma, alpha, error_const = _ndf_constants(dtype)
    eps = jnp.finfo(dtype).eps
    newton_tol = max(10 * float(eps) / config.rtol,
                     min(0.03, config.rtol ** 0.5))
    rtol, atol = config.rtol, config.atol
    max_step = jnp.asarray(config.max_step, dtype)
    I_n = jnp.eye(n, dtype=dtype)
    rows = jnp.arange(D_ROWS)
    gamma_pad = jnp.pad(gamma, (0, D_ROWS - MAX_ORDER - 1))
    ks5 = jnp.arange(1, MAX_ORDER + 1)

    # --- initialization (bdf.py __init__) -------------------------------
    if split:
        Y0b = (y0[:, None], jnp.asarray(s0, f32))
    elif m:
        Y0b = (jnp.concatenate(
            [y0[:, None], jnp.asarray(s0, dtype)], axis=1).astype(cdt),)
    else:
        Y0b = (y0[:, None].astype(cdt),)
    F0b = faug_b(t0, Y0b)
    f0 = F0b[0][:, 0].astype(dtype)
    common.debug_check(
        config.debug_checks, jnp.isfinite(f0).all(),
        "non-finite RHS at the initial condition (t0={t0})", t0=t0)
    if config.first_step is None:
        h0 = common.select_initial_step(
            f, t0, y0, f0, t_bound, config.max_step, rtol, atol, order=1)
    else:
        h0 = jnp.asarray(config.first_step, dtype)
    h0 = jnp.minimum(h0, jnp.abs(t_bound - t0))

    D0 = bmap(
        lambda Y0p, F0p, i: jnp.zeros(
            (D_ROWS,) + Y0p.shape, Y0p.dtype
        ).at[0].set(Y0p).at[1].set(F0p * h0.astype(Y0p.dtype)),
        Y0b, F0b)

    J0 = jac_c(t0, y0)
    fact0 = factor_c(I_n)  # placeholder with the right pytree structure

    # prefill outputs at t_eval points exactly at t0
    at_t0 = (t_eval == t0)[:, None, None]
    ys0 = bmap(
        lambda Y0p, i: jnp.where(
            at_t0, Y0p[None],
            jnp.zeros((t_eval.shape[0],) + Y0p.shape, Y0p.dtype)),
        Y0b)

    def i32(v):
        return jnp.asarray(v, jnp.int32)

    # --- event channel setup (EventSpec; zero-size arrays when unused so
    #     the state pytree and compiled program are unchanged) ---
    if events is not None:
        g0 = jnp.atleast_1d(jnp.asarray(events.fn(t0, y0), dtype))
        n_ev = g0.shape[0]
        ev_cap = int(events.capacity)
        ev_dir = jnp.asarray(
            events.direction if events.direction else (0,) * n_ev,
            jnp.int32)
        ev_term = jnp.asarray(
            events.terminal if events.terminal else (False,) * n_ev)
        if ev_dir.shape != (n_ev,) or ev_term.shape != (n_ev,):
            raise ValueError("EventSpec direction/terminal length must "
                             "match the event vector length")
    else:
        g0 = jnp.zeros((0,), dtype)
        n_ev, ev_cap = 0, 1

    # --- dense-export buffers (zero-capacity when off, like the event
    #     channel, so the state pytree shape is decided at trace time) ---
    seg_cap = int(config.max_steps) if dense_export else 0
    seg_t0 = jnp.full((seg_cap,), jnp.inf, dtype)
    seg_h0 = jnp.zeros((seg_cap,), dtype)
    seg_ord0 = jnp.zeros((seg_cap,), jnp.int32)
    seg_D0 = bmap(
        lambda Y0p, i: jnp.zeros((seg_cap, MAX_ORDER + 1) + Y0p.shape,
                                 Y0p.dtype), Y0b)

    state = _BDFState(
        t=t0, h_abs=h0, order=i32(1), D=D0, J=J0, fact=fact0,
        lu_valid=jnp.asarray(False), current_jac=jnp.asarray(False),
        last_accepted=jnp.asarray(True),
        n_equal_steps=i32(0), status=common.status_init(t0, t_bound),
        ys_acc=ys0,
        nsteps=i32(0), naccepted=i32(0), nrejected=i32(0),
        nfev=i32(1 + (0 if config.first_step is not None else 2)),
        njev=i32(1), nlu=i32(0),
        order_hist=jnp.zeros((MAX_ORDER + 1,), jnp.int32),
        g_old=g0,
        ev_t=jnp.full((n_ev, ev_cap), jnp.inf, dtype),
        ev_y=jnp.zeros((n_ev, ev_cap, n), dtype),
        ev_count=jnp.zeros((n_ev,), jnp.int32),
        seg_t=seg_t0, seg_h=seg_h0, seg_order=seg_ord0, seg_D=seg_D0,
    )

    def cond(st: _BDFState):
        return st.status == STATUS_RUNNING

    def body(st: _BDFState) -> _BDFState:
        t, order = st.t, st.order
        orderf = order.astype(dtype)
        h_abs = st.h_abs
        D = st.D
        lu_valid = st.lu_valid
        n_equal_steps = st.n_equal_steps

        common.debug_check(
            config.debug_checks,
            (h_abs > 0) | (st.status != STATUS_RUNNING),
            "non-positive step size h={h} at t={t}", h=h_abs, t=t)
        # ~10 ulp of t (jnp.nextafter breaks the TPU f64 rewriter; the
        # eps-based spacing is equivalent for the underflow guard)
        min_step = 10 * jnp.finfo(dtype).eps * jnp.abs(t)
        # At a fresh step SciPy clamps h into [min_step, max_step] with a
        # change_D rescale (bdf.py:315-323); inside a retry sequence
        # h < min_step is fatal (bdf.py:340-341).
        too_small = (h_abs < min_step) & ~st.last_accepted
        h_clamped = jnp.clip(h_abs, min_step, max_step)
        pre_clamp = st.last_accepted & (h_clamped != h_abs)
        pre_factor = jnp.where(pre_clamp, h_clamped / h_abs,
                               jnp.ones((), dtype))
        n_equal_steps = jnp.where(pre_clamp, 0, n_equal_steps)
        h_abs = jnp.where(st.last_accepted, h_clamped, h_abs)

        # clip the final step to t_bound (bdf.py:345-350). The clamp and
        # clip rescalings compose multiplicatively (change_D represents
        # the h -> f*h scaling group), so ONE masked transform serves both
        # instead of two full passes over D.
        # With dense_window, the step is ALSO capped at the
        # (dense_window-1)-th next t_eval point, so the windowed
        # dense-output slice below provably covers every point the step
        # passes (the cap rides the same clip/rescale machinery as
        # t_bound and binds only when one step would skip a whole window
        # of grid points).
        if dw:
            lo_eval = jnp.searchsorted(t_eval, t, side="right")
            _last = jnp.minimum(lo_eval + (dw - 1), t_eval.shape[0] - 1)
            t_cap = jnp.where(lo_eval + (dw - 1) < t_eval.shape[0],
                              t_eval[_last], jnp.asarray(jnp.inf, dtype))
            bound_eff = jnp.minimum(t_bound, t_cap)
        else:
            lo_eval = None
            bound_eff = t_bound
        t_new_raw = t + h_abs
        clipped = t_new_raw > bound_eff
        t_new = jnp.where(clipped, bound_eff, t_new_raw)
        h = t_new - t
        clip_factor = jnp.where(clipped, h / h_abs, jnp.ones((), dtype))
        D = bmap(lambda Dp, i: jnp.where(
            pre_clamp | clipped,
            _change_D(Dp, order, pre_factor * clip_factor), Dp), D)
        n_equal_steps = jnp.where(clipped, 0, n_equal_steps)
        lu_valid = lu_valid & ~clipped
        h_abs = h

        # --- prediction (bdf.py:355-358) ---
        pred_mask = (rows <= order)
        y_predict = bmap(
            lambda Dp, i: _rowsum(pred_mask.astype(Dp.dtype), Dp), D)
        psi_w = jnp.where((rows >= 1) & (rows <= order), gamma_pad[rows],
                          0.0)
        c = h / alpha[order]
        psi = bmap(
            lambda Dp, i: _rowsum((psi_w / alpha[order]).astype(Dp.dtype),
                                  Dp),
            D)
        scale_state = atol + rtol * jnp.abs(y_predict[0][:, 0])

        # --- factorization (reused while SciPy would reuse it) ---
        with jax.named_scope("bdf.factor"):
            fact = lax.cond(
                lu_valid,
                lambda: st.fact,
                lambda: factor_c(I_n - c * st.J.astype(dtype)),
            )
        nlu = st.nlu + jnp.where(lu_valid, 0, 1)
        fact32 = _fact32(fact) if split else None

        # --- modified Newton, early-exit while_loop, masked
        #     (bdf.py:36-69). Under vmap the loop runs the batch UNION of
        #     per-member Newton trips (every member's updates stay masked
        #     by ``active``, so results are identical to the fixed-trip
        #     form) — typically 1-2 trips instead of always
        #     NEWTON_MAXITER, and each trip is one RHS eval + solve. ---
        c_b = tuple(c.astype(dt) for _, dt in parts)

        def newton_cond(carry):
            *_, n_iter_c, converged_c, failed_c, it = carry
            return (it < NEWTON_MAXITER) & ~(converged_c | failed_c)

        def newton_body(carry):
            Y, d, dy_norm_old, n_iter, converged, failed, it = carry
            active = ~(converged | failed)
            Fv = faug_b(t_new, Y)
            nonfinite = ~jnp.stack(
                [jnp.all(jnp.isfinite(Fp)) for Fp in Fv]).all()
            resid = bmap(lambda Fp, pp, dp, i: c_b[i] * Fp - pp - dp,
                         Fv, psi, d)
            if split:
                dy = (solve_c(fact, resid[0]),
                      solve_fn(fact32, resid[1]))
            else:
                dy = (solve_c(fact, resid[0]),)
            dy_norm = rms_norm(dy[0][:, 0] / scale_state)
            rate = dy_norm / jnp.where(dy_norm_old > 0, dy_norm_old, 1.0)
            have_rate = it > 0
            diverged = have_rate & (
                (rate >= 1.0)
                | (rate ** (NEWTON_MAXITER - it) / (1.0 - rate) * dy_norm
                   > newton_tol))
            ok = active & ~nonfinite & ~diverged
            Y = bmap(lambda Yp, dyp, i: jnp.where(ok, Yp + dyp, Yp), Y, dy)
            d = bmap(lambda dp, dyp, i: jnp.where(ok, dp + dyp, dp), d, dy)
            conv_now = ok & ((dy_norm == 0.0)
                             | (have_rate
                                & (rate / (1.0 - rate) * dy_norm
                                   < newton_tol)))
            converged = converged | conv_now
            failed = failed | (active & (nonfinite | diverged))
            n_iter = n_iter + jnp.where(active, 1, 0)
            dy_norm_old = jnp.where(ok, dy_norm, dy_norm_old)
            return Y, d, dy_norm_old, n_iter, converged, failed, it + 1

        init = (y_predict, bmap(lambda yp, i: jnp.zeros_like(yp), y_predict),
                jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                jnp.asarray(False), jnp.asarray(False),
                jnp.zeros((), jnp.int32))
        with jax.named_scope("bdf.newton"):
            Y_new, d, _, n_iter, converged, _, _ = lax.while_loop(
                newton_cond, newton_body, init)
        nfev = st.nfev + n_iter

        # --- outcome classification (bdf.py:362-401) ---
        # B: Newton failed with a stale J -> refresh J, retry at same h.
        case_B = ~converged & ~st.current_jac
        # C: Newton failed with fresh J -> halve the step.
        case_C = ~converged & st.current_jac
        J = lax.cond(case_B, lambda: jac_c(t_new, y_predict[0][:, 0]),
                     lambda: st.J)
        njev = st.njev + jnp.where(case_B, 1, 0)

        safety = (config.safety * (2 * NEWTON_MAXITER + 1)
                  / (2 * NEWTON_MAXITER + n_iter.astype(dtype)))
        scale_new = atol + rtol * jnp.abs(Y_new[0][:, 0])
        err = error_const[order].astype(d[0].dtype) * d[0]
        if config.sens_error_control and m and not split:
            scale_full = atol + rtol * jnp.abs(Y_new[0])
            error_norm = rms_norm(err / scale_full).astype(dtype)
        else:
            error_norm = rms_norm(err[:, 0] / scale_new).astype(dtype)
        # NaN compares false, which would silently ACCEPT a garbage step;
        # force non-finite error estimates onto the rejection path.
        bad_err = ~jnp.isfinite(error_norm)
        error_norm = jnp.where(bad_err, jnp.asarray(2.0, dtype), error_norm)
        reject = converged & ((error_norm > 1.0) | bad_err)
        accept = converged & ~reject

        # --- D update on accept (bdf.py:409-415), composed below into ONE
        #     linear map on D. The accept-path update (append d at rows
        #     order+1/order+2, then the downward telescoping sweep) is
        #     ``M @ D + u ⊗ d`` with
        #       rows i<=order:  Σ_{j=i}^{order} D[j] + d
        #       row order+1:    d
        #       row order+2:    d - D[order+1]
        #       rows above:     identity
        #     The order-adaptation error rows of the would-be D_acc are
        #     read off directly instead of materializing it.
        n_equal_acc = n_equal_steps + 1
        # --- order/step adaptation once n_equal > order (bdf.py:421-448) ---
        do_adapt = accept & (n_equal_acc >= order + 1)
        pdt = D[0].dtype
        ec_m = error_const[jnp.maximum(order - 1, 0)].astype(pdt)
        ec_p = error_const[jnp.minimum(order + 1, MAX_ORDER + 1)].astype(pdt)
        # D_acc[order] = D[order] + d;  D_acc[order+2] = d - D[order+1]
        err_m = ec_m * (jnp.take(D[0], order, axis=0) + d[0])
        err_p = ec_p * (d[0] - jnp.take(D[0], order + 1, axis=0))
        inf_ = jnp.asarray(jnp.inf, dtype)
        if config.sens_error_control and m and not split:
            scale_full = atol + rtol * jnp.abs(Y_new[0])
            err_m_norm = jnp.where(
                order > 1, rms_norm(err_m / scale_full).astype(dtype), inf_)
            err_p_norm = jnp.where(
                order < MAX_ORDER,
                rms_norm(err_p / scale_full).astype(dtype), inf_)
        else:
            err_m_norm = jnp.where(
                order > 1,
                rms_norm(err_m[:, 0] / scale_new).astype(dtype), inf_)
            err_p_norm = jnp.where(
                order < MAX_ORDER,
                rms_norm(err_p[:, 0] / scale_new).astype(dtype), inf_)
        error_norms = jnp.stack([err_m_norm, error_norm, err_p_norm])
        exponents = -1.0 / (orderf + jnp.arange(3, dtype=dtype))
        # TPU emulated-f64 pow(inf, negative) yields NaN (not 0); guard the
        # inf/non-finite markers explicitly instead of relying on pow.
        finite_norm = jnp.isfinite(error_norms)
        safe_norms = jnp.where(finite_norm,
                               jnp.maximum(error_norms, eps), 1.0)
        factors = jnp.where(finite_norm, safe_norms ** exponents, 0.0)
        best = jnp.argmax(factors).astype(jnp.int32)
        order_adapt = jnp.clip(order + best - 1, 1, MAX_ORDER)
        factor_adapt = jnp.minimum(config.max_factor,
                                   safety * jnp.max(factors))

        if _DEBUG:
            print(f"dbg t={float(t):.6e} h={float(h_abs):.4e} "
                  f"ord={int(order)} n_iter={int(n_iter)} "
                  f"conv={bool(converged)} err={float(error_norm):.4e} "
                  f"em={float(err_m_norm):.4e} ep={float(err_p_norm):.4e} "
                  f"adapt={bool(do_adapt)} best={int(best)} "
                  f"fadapt={float(factor_adapt):.4f}")

        # merge the h-factor for the three D-rescaling cases
        factor_rej = jnp.maximum(
            config.min_factor,
            safety * error_norm ** (-1.0 / (orderf + 1.0)))
        h_factor = jnp.where(
            case_C, 0.5,
            jnp.where(reject, factor_rej,
                      jnp.where(do_adapt, factor_adapt, 1.0)))
        change = case_C | reject | do_adapt
        order_new = jnp.where(do_adapt, order_adapt, order)

        # Compose (change_D rescale ∘ accept-merge ∘ accept-update) into
        # one (D_ROWS, D_ROWS) matrix W and rank-one weight v, then apply
        # with a single pass over each D part: D_new = W @ D + v ⊗ d.
        # Replaces 2 dynamic-row writes + 3 full-array passes per part
        # (profiled: the D bookkeeping was the largest non-linalg block of
        # emulated-f64 work on the tight path).
        ri = rows[:, None]
        rj = rows[None, :]
        eyeD = (ri == rj).astype(dtype)
        acc_M = jnp.where(
            ri <= order, ((rj >= ri) & (rj <= order)).astype(dtype),
            jnp.where(ri == order + 2,
                      -(rj == order + 1).astype(dtype),
                      ((ri == rj) & (ri > order + 2)).astype(dtype)))
        acc_u = (rows <= order + 2).astype(dtype)
        Ma = jnp.where(accept, acc_M, eyeD)
        ua = jnp.where(accept, acc_u, jnp.zeros((), dtype))
        # change_D's transform as a full D_ROWS² matrix at (order_new,
        # h_factor), identity outside the active block (cf. _change_D)
        P = (_compute_R(h_factor, dtype)
             @ _compute_R(jnp.ones((), dtype), dtype))
        Ppad = jnp.zeros((D_ROWS, D_ROWS), dtype)
        Ppad = Ppad.at[: MAX_ORDER + 1, : MAX_ORDER + 1].set(P)
        in_block = (ri <= order_new) & (rj <= order_new)
        T = jnp.where(in_block, Ppad.T, eyeD)
        Tc = jnp.where(change, T, eyeD)
        W = Tc @ Ma
        v = Tc @ ua
        D_new = bmap(
            lambda Dp, dp, i: _rowmix(W.astype(Dp.dtype), Dp)
            + v.astype(Dp.dtype)[:, None, None] * dp[None],
            D, d)
        h_new = h_abs * jnp.where(change, h_factor, 1.0)

        t_next = jnp.where(accept, t_new, t)
        n_equal_new = jnp.where(accept & ~do_adapt, n_equal_acc, 0)
        # SciPy keeps the factorization across error-test rejections
        # (stale c, bdf.py:397-398); only Newton failure, Jacobian refresh,
        # or order/step adaptation invalidate it.
        lu_valid_new = ~(case_B | case_C | do_adapt)
        current_jac_new = jnp.where(case_B, True,
                                    jnp.where(accept, False,
                                              st.current_jac))

        # --- dense output at t_eval (BdfDenseOutput, bdf.py:457-479) ---
        # Uses post-update D/order/h: the change_D rescaling preserves the
        # interpolating polynomial, matching SciPy's _dense_output_impl.
        def interp_part(Dp, tv):
            dt = Dp.dtype
            # with config.dense_f32, the interpolation CORRECTION (on top
            # of the exact D[0] anchor) runs in f32 even for f64 parts:
            # ~eps32·|correction| ≪ rtol·|y| on outputs, and it removes
            # the largest per-accepted-step block of emulated-f64 MACs on
            # TPU (41 t_eval × MAX_ORDER × n). See SolverConfig.dense_f32
            # for why it is opt-in (FD consumers of outputs).
            cdt = f32 if config.dense_f32 else dt
            jj = jnp.arange(MAX_ORDER, dtype=dtype)
            t_shift = t_new - h_new * jj
            denom = h_new * (1.0 + jj)
            # the time differences cancel catastrophically in f32 — form
            # x in f64, then run the polynomial in the correction dtype
            x = (tv[:, None] - t_shift[None, :]) / denom
            p = jnp.cumprod(x.astype(cdt), axis=1)
            p = jnp.where(ks5[None, :] <= order_new, p,
                          jnp.zeros((), cdt))
            # small-contraction (J=5) product, elementwise for small
            # parts for the same dot_general-lowering reason as _rowmix
            # (size-gated: the dot wins for large compute-bound parts)
            if _part_size(Dp) > _ELEMENTWISE_PART_MAX:
                corr = jnp.einsum("tj,jnk->tnk", p,
                                  Dp[1:MAX_ORDER + 1].astype(cdt))
            else:
                corr = jnp.sum(p[:, :, None, None]
                               * Dp[1:MAX_ORDER + 1].astype(cdt)[None],
                               axis=1)
            return Dp[0][None] + corr.astype(dt)

        # --- dense export (solvers/dense.py OdeSolution): record this
        #     accepted step's interpolant (t_new, h_new, order_new,
        #     D_new[:MAX_ORDER+1]) at slot ``naccepted``. Uses the
        #     PRE-event-rewrite D_new — a terminal event overwrites the
        #     anchor row below, which would corrupt the polynomial.
        #     Python-level gate: zero cost and unchanged HLO when off. ---
        if dense_export:
            slot_d = jnp.minimum(st.naccepted, seg_cap - 1)
            seg_t_new = st.seg_t.at[slot_d].set(
                jnp.where(accept, t_new, st.seg_t[slot_d]))
            seg_h_new = st.seg_h.at[slot_d].set(
                jnp.where(accept, h_new, st.seg_h[slot_d]))
            seg_ord_new = st.seg_order.at[slot_d].set(
                jnp.where(accept, order_new, st.seg_order[slot_d]))
            seg_D_new = bmap(
                lambda Dp, buf, i: buf.at[slot_d].set(
                    jnp.where(accept, Dp[: MAX_ORDER + 1], buf[slot_d])),
                D_new, st.seg_D)
        else:
            seg_t_new, seg_h_new = st.seg_t, st.seg_h
            seg_ord_new, seg_D_new = st.seg_order, st.seg_D

        # --- state-dependent events (EventSpec; scipy solve_ivp events,
        #     ivp.py:29-158): after an accepted step, detect a sign change
        #     of g across [t, t_new] per scipy's find_active_events
        #     (ivp.py:98-123) honoring per-event direction, bisect each
        #     fired event's root on the just-built dense-output polynomial
        #     (static iteration count — the brentq analogue,
        #     solve_event_equation ivp.py:29-60), and record into the
        #     static (E, K) buffers. A fired terminal event stops the
        #     integration AT the event time (handle_events ivp.py:126-158):
        #     later t_eval points stay unfilled and the D anchor row is
        #     rewritten to the interpolated column block so y_final is
        #     y(t_event). ---
        if events is not None:
            def y_at(tv):
                # state column of the current-step dense output at time tv
                return interp_part(D_new[0], tv[None])[0, :, 0].astype(dtype)

            y_new_state = Y_new[0][:, 0].astype(dtype)
            g_new = jnp.atleast_1d(jnp.asarray(
                events.fn(t_new, y_new_state), dtype))
            up = (st.g_old <= 0) & (g_new >= 0)
            down = (st.g_old >= 0) & (g_new <= 0)
            trig = jnp.where(ev_dir > 0, up,
                             jnp.where(ev_dir < 0, down, up | down))
            fired = accept & trig

            def find_roots():
                def bis(_, carry):
                    lo, hi, glo = carry
                    mid = 0.5 * (lo + hi)
                    ys_mid = jax.vmap(y_at)(mid)              # (E, n)
                    gm = jax.vmap(lambda tm, ym: jnp.atleast_1d(
                        jnp.asarray(events.fn(tm, ym), dtype)))(mid, ys_mid)
                    g_mid = jnp.diagonal(gm)                  # event e at its own mid
                    same = (jnp.sign(g_mid) == jnp.sign(glo)) & (g_mid != 0.0)
                    return (jnp.where(same, mid, lo),
                            jnp.where(same, hi, mid),
                            jnp.where(same, g_mid, glo))

                lo0 = jnp.full((n_ev,), t, dtype)
                hi0 = jnp.full((n_ev,), t_new, dtype)
                _, hi, _ = lax.fori_loop(0, int(events.bisect_iters), bis,
                                         (lo0, hi0, st.g_old))
                return hi

            t_root = lax.cond(jnp.any(fired), find_roots,
                              lambda: jnp.full((n_ev,), t_new, dtype))
            t_root = jnp.where(fired, t_root, jnp.asarray(jnp.inf, dtype))
            # earliest terminal root ends the integration there; later
            # occurrences (of any event) are discarded (ivp.py:148-155)
            t_term = jnp.min(jnp.where(fired & ev_term, t_root,
                                       jnp.asarray(jnp.inf, dtype)))
            has_term = jnp.isfinite(t_term)
            rec = fired & (t_root <= t_term)
            slot = jnp.clip(st.ev_count, 0, ev_cap - 1)
            can_store = rec & (st.ev_count < ev_cap)
            t_root_safe = jnp.where(jnp.isfinite(t_root), t_root, t_new)
            ys_root = jax.vmap(y_at)(t_root_safe)             # (E, n)
            er = jnp.arange(n_ev)
            ev_t = st.ev_t.at[er, slot].set(
                jnp.where(can_store, t_root, st.ev_t[er, slot]))
            ev_y = st.ev_y.at[er, slot].set(
                jnp.where(can_store[:, None], ys_root, st.ev_y[er, slot]))
            ev_count = st.ev_count + rec.astype(jnp.int32)
            g_old_new = jnp.where(accept, g_new, st.g_old)
            t_term_safe = jnp.where(has_term, t_term, t_new)
            Y_term = bmap(
                lambda Dp, i: interp_part(Dp, t_term_safe[None])[0], D_new)
            D_new = bmap(lambda Dp, Yt, i: Dp.at[0].set(
                jnp.where(has_term, Yt, Dp[0])), D_new, Y_term)
            t_fill_hi = t_term_safe
        else:
            has_term = jnp.asarray(False)
            t_fill_hi = t_new
            ev_t, ev_y, ev_count = st.ev_t, st.ev_y, st.ev_count
            g_old_new = st.g_old

        with jax.named_scope("bdf.dense_output"):
            if dw:
                ys_acc = bmap(
                    lambda Dp, acc, i: common.interp_accumulate_windowed(
                        t_eval, lo_eval, t, t_fill_hi,
                        lambda tv: interp_part(Dp, tv), acc, dw,
                        gate=accept),
                    D_new, st.ys_acc)
            else:
                ys_acc = bmap(
                    lambda Dp, acc, i: jnp.where(
                        accept,
                        common.interp_accumulate(
                            t_eval, t, t_fill_hi,
                            lambda tv: interp_part(Dp, tv), acc),
                        acc),
                    D_new, st.ys_acc)

        done = accept & (t_new >= t_bound)
        nsteps = st.nsteps + 1
        status = jnp.where(
            done, STATUS_DONE,
            jnp.where(nsteps >= config.max_steps, STATUS_MAX_STEPS,
                      STATUS_RUNNING)).astype(jnp.int32)
        if events is not None:
            status = jnp.where(has_term, common.STATUS_EVENT,
                               status).astype(jnp.int32)
            t_next = jnp.where(has_term, t_term_safe, t_next)

        new_st = _BDFState(
            t=t_next, h_abs=h_new, order=order_new, D=D_new, J=J, fact=fact,
            lu_valid=lu_valid_new, current_jac=current_jac_new,
            last_accepted=accept,
            n_equal_steps=n_equal_new, status=status, ys_acc=ys_acc,
            nsteps=nsteps, naccepted=st.naccepted + jnp.where(accept, 1, 0),
            nrejected=st.nrejected + jnp.where(reject | case_C, 1, 0),
            nfev=nfev, njev=njev, nlu=nlu,
            order_hist=st.order_hist.at[order].add(
                jnp.where(accept, 1, 0)),
            g_old=g_old_new, ev_t=ev_t, ev_y=ev_y, ev_count=ev_count,
            seg_t=seg_t_new, seg_h=seg_h_new, seg_order=seg_ord_new,
            seg_D=seg_D_new)

        # a fatal underflow freezes the state (failed members are masked
        # out downstream, never aborting a vmapped batch)
        frozen = st._replace(status=i32(STATUS_TOO_SMALL_STEP))
        return jax.tree.map(
            lambda a, b: jnp.where(too_small, a, b), frozen, new_st)

    final = lax.while_loop(cond, body, state)
    if split:
        ys = final.ys_acc[0][:, :, 0]
        sens = final.ys_acc[1].astype(dtype)
    else:
        ys = final.ys_acc[0][:, :, 0]
        sens = final.ys_acc[0][:, :, 1:]
    y_final = jnp.concatenate(
        [Dp[0].astype(dtype) for Dp in final.D], axis=1)
    ev_kw = {}
    if events is not None:
        ev_kw = dict(event_t=final.ev_t, event_y=final.ev_y,
                     event_count=final.ev_count)
    if dense_export:
        ev_kw.update(seg_t=final.seg_t, seg_h=final.seg_h,
                     seg_order=final.seg_order, seg_D=final.seg_D)
    return IntegrateResult(
        ys=ys, sens=sens, status=final.status, nsteps=final.nsteps,
        naccepted=final.naccepted, nrejected=final.nrejected,
        nfev=final.nfev, njev=final.njev, nlu=final.nlu,
        order_hist=final.order_hist, t_final=final.t, y_final=y_final,
        **ev_kw)
