"""Pallas TPU kernel: VMEM-resident BATCHED matrix inverse for Newton solves.

Why this kernel exists (round-2 profile, docs/PERFORMANCE.md): under
``vmap``, ``lax.cond(lu_valid, reuse, factor)`` lowers to a select, so the
O(n³) factorization runs on EVERY while-loop iteration of the vmapped BDF
ensemble. The pure-JAX pivoted elimination (linalg/lu.py) is n sequential
``fori_loop`` steps of small dynamic-update-slice / compare-select ops —
measured at 75-85%% of total device time (hlo_stats: 38.5%% DUS + 32.4%%
loop fusion on f32[128,22,22] tiles, VMEM-bound). This kernel runs
Gauss-Jordan with partial pivoting for the WHOLE ensemble inside one
``pallas_call``: the augmented (B, n, 2n) block lives in VMEM/vregs, the n
pivot steps are in-kernel (no per-op dispatch, no HBM roundtrips), and each
step is a wide (B×n×2n) VPU operation.

Pivot selection without data-dependent gathers (Mosaic-friendly): the
pivot row is extracted with a one-hot reduction — ``rowp = Σ_r A[b,r,:] ·
is_p[b,r]`` — where ``is_p`` marks the first row attaining the column
maximum below the diagonal. Zero pivots are replaced by a tiny signed
epsilon (singular ⇒ garbage-but-finite, per the failure-detection
contract, SURVEY.md §5).

The kernel is f32 (Mosaic has no f64); the caller lifts to ~1e-13 with
Newton-Schulz refinement in the input dtype::

    X ← X + X (I − A X)

This replaces LAPACK ``getrf/getrs`` (``scipy/integrate/_ivp/bdf.py:
231-236``) the TPU-native way (SURVEY.md §2b LAPACK row, §7 M7).

``jax.custom_batching.custom_vmap`` collapses any stack of vmap axes into
the kernel's batch dimension, so the stepper's ensemble vmap maps to ONE
kernel with a wide batch — never a sequential grid of single-matrix calls.

Falls back to interpreter mode automatically off-TPU (CPU tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_BLOCK = 128   # matrices per kernel block
# Kernel layout: 'minor' (batch on the 128-lane dim, fully packed — the
# fast path) or 'major' (batch leading). Env-switchable for debugging
# runtime issues that only reproduce inside large fused programs.
_LAYOUT = os.environ.get("TPUSYSBIO_GJ_LAYOUT", "minor")


def _gj_batch_major_kernel(a_ref, out_ref):
    """Batch-major (B, n, n) variant of the Gauss-Jordan kernel."""
    B, n = a_ref.shape[0], a_ref.shape[1]
    dt = a_ref.dtype
    row = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    eye = (lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dt)
    A0 = a_ref[:]
    X0 = jnp.broadcast_to(eye[None], (B, n, n))

    def body(k, carry):
        A, X = carry
        col_k = (lane == k).astype(dt)                          # (1, 1, n)
        colk = jnp.sum(A * col_k, axis=2, keepdims=True)        # (B, n, 1)
        below = row >= k
        abscol = jnp.where(below, jnp.abs(colk), -jnp.ones((), dt))
        mx = jnp.max(abscol, axis=1, keepdims=True)             # (B, 1, 1)
        hit = (abscol == mx) & below
        p_idx = jnp.min(jnp.where(hit, row, jnp.int32(n)), axis=1,
                        keepdims=True)                          # (B, 1, 1)
        is_p = row == p_idx
        is_k = row == k
        fp = is_p.astype(dt)
        fk = is_k.astype(dt)

        def swap_elim(M):
            rowp = jnp.sum(M * fp, axis=1, keepdims=True)       # (B, 1, n)
            rowk = jnp.sum(M * fk, axis=1, keepdims=True)
            return jnp.where(is_k, rowp, jnp.where(is_p, rowk, M)), rowp

        A, rowpA = swap_elim(A)
        X, rowpX = swap_elim(X)
        pivot = jnp.sum(rowpA * col_k, axis=2, keepdims=True)   # (B, 1, 1)
        tiny = jnp.asarray(1e-30, dt)
        pivot = jnp.where(jnp.abs(pivot) > tiny, pivot,
                          jnp.where(pivot >= 0, tiny, -tiny))
        normA = rowpA / pivot
        normX = rowpX / pivot
        colk2 = jnp.sum(A * col_k, axis=2, keepdims=True)
        factor = jnp.where(is_k, jnp.zeros((), dt), colk2)
        A = jnp.where(is_k, normA, A - factor * normA)
        X = jnp.where(is_k, normX, X - factor * normX)
        return A, X

    _, X = lax.fori_loop(jnp.int32(0), jnp.int32(n), body, (A0, X0))
    out_ref[:] = X


def _gj_batched_kernel(a_ref, out_ref):
    """Gauss-Jordan with partial pivoting, batched, VMEM-resident.

    Layout is BATCH-MINOR: buffers are (n, n, B) so the batch rides the
    128-wide lane dimension fully packed (profiling showed the previous
    batch-major (B, n, n) form wasted 1 - n/128 of every vector op on
    lane padding). Two buffers (A, X=I) are updated in tandem — X becomes
    A⁻¹. Mosaic has no dynamic_slice on values, so every "pick row/column
    k" is a one-hot mask + reduction over the row/column axes.
    """
    n, B = a_ref.shape[0], a_ref.shape[2]
    dt = a_ref.dtype
    row = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    A0 = a_ref[:]
    X0 = jnp.broadcast_to((row == col).astype(dt), (n, n, B))

    def body(k, carry):
        A, X = carry
        col_k = (col == k).astype(dt)                           # (1, n, 1)
        colk = jnp.sum(A * col_k, axis=1, keepdims=True)        # (n, 1, B)
        below = row >= k
        abscol = jnp.where(below, jnp.abs(colk), -jnp.ones((), dt))
        mx = jnp.max(abscol, axis=0, keepdims=True)             # (1, 1, B)
        hit = (abscol == mx) & below
        # first row attaining the max (min-index tie-break; Mosaic has no
        # cumsum)
        p_idx = jnp.min(jnp.where(hit, row, jnp.int32(n)), axis=0,
                        keepdims=True)                          # (1, 1, B)
        is_p = row == p_idx                                     # (n, 1, B)
        is_k = row == k                                         # (n, 1, 1)
        fp = is_p.astype(dt)
        fk = is_k.astype(dt)

        def swap_elim(M):
            rowp = jnp.sum(M * fp, axis=0, keepdims=True)       # (1, n, B)
            rowk = jnp.sum(M * fk, axis=0, keepdims=True)
            return jnp.where(is_k, rowp, jnp.where(is_p, rowk, M)), rowp

        A, rowpA = swap_elim(A)
        X, rowpX = swap_elim(X)
        pivot = jnp.sum(rowpA * col_k, axis=1, keepdims=True)   # (1, 1, B)
        tiny = jnp.asarray(1e-30, dt)
        pivot = jnp.where(jnp.abs(pivot) > tiny, pivot,
                          jnp.where(pivot >= 0, tiny, -tiny))
        normA = rowpA / pivot
        normX = rowpX / pivot
        colk2 = jnp.sum(A * col_k, axis=1, keepdims=True)       # (n, 1, B)
        factor = jnp.where(is_k, jnp.zeros((), dt), colk2)
        A = jnp.where(is_k, normA, A - factor * normA)
        X = jnp.where(is_k, normX, X - factor * normX)
        return A, X

    # int32 bounds: under x64 a Python-int bound makes the induction var
    # int64, whose conversions Mosaic cannot lower (infinite recursion in
    # _convert_helper)
    _, X = lax.fori_loop(jnp.int32(0), jnp.int32(n), body, (A0, X0))
    out_ref[:] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gj_inverse_f32(a: jax.Array, interpret: bool = False) -> jax.Array:
    """f32 batched inverse of ``a`` (B, n, n) via one pallas_call.

    The kernel runs batch-minor (n, n, B) blocks; the transposes in/out
    are cheap XLA copies next to the in-kernel work they unlock."""
    B, n = a.shape[0], a.shape[-1]
    # The batch block stays 128 wide — Mosaic requires the lane (last)
    # dim of a block to be 128-divisible or the whole array dim. At
    # n > 32 a MULTI-block grid double-buffers the (n, n, 128) staging
    # and overflows scoped VMEM (verified on hardware: (64, 64, 512)
    # with grid=4 OOMs by 0.6 MB — the EGFR b512 screening shape via
    # block-Schur's n=64 sub-blocks — while the grid=1 case compiles and
    # runs). Large batches at large n therefore run as a lax.map over
    # single-grid 128-wide calls (one compiled kernel, reused).
    block = _MAX_BLOCK
    if B % block:
        pad = block - B % block
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype)[None],
                                 (pad, n, n))], axis=0)
    Bp = a.shape[0]

    # index_map constants must be int32 AND created inside the map fn
    # (no captured tracers): under x64 a Python-int block index becomes
    # i64, which Mosaic cannot return from the map function
    def _imap_major(i):
        return (i, jnp.int32(0), jnp.int32(0))

    def _imap_minor(i):
        return (jnp.int32(0), jnp.int32(0), i)

    if _LAYOUT == "major":
        def call_major(a_part, n_blocks):
            return pl.pallas_call(
                _gj_batch_major_kernel,
                out_shape=jax.ShapeDtypeStruct(a_part.shape, a.dtype),
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec((block, n, n), _imap_major,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((block, n, n), _imap_major,
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(a_part)

        if n > 32 and Bp > block:
            # same scoped-VMEM limit as the minor layout (see below)
            out = lax.map(lambda ab: call_major(ab, 1),
                          a.reshape(Bp // block, block, n, n))
            out = out.reshape(Bp, n, n)
        else:
            out = call_major(a, Bp // block)
        return out[:B]

    at = jnp.transpose(a, (1, 2, 0))  # (n, n, Bp) batch-minor

    def call(at_part, n_blocks):
        return pl.pallas_call(
            _gj_batched_kernel,
            out_shape=jax.ShapeDtypeStruct(at_part.shape, a.dtype),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((n, n, block), _imap_minor,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, n, block), _imap_minor,
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(at_part)

    if n > 32 and Bp > block:
        # single-grid calls sequenced by lax.map (see block comment)
        chunks = jnp.moveaxis(at.reshape(n, n, Bp // block, block), 2, 0)
        out = lax.map(lambda ab: call(ab, 1), chunks)
        out = jnp.moveaxis(out, 0, 2).reshape(n, n, Bp)
    else:
        out = call(at, Bp // block)
    return jnp.transpose(out, (2, 0, 1))[:B]


def _inverse_impl(a: jax.Array, refine_steps: int,
                  interpret: bool | None) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = a.shape[-1]
    lead = a.shape[:-2]
    B = 1
    for d in lead:
        B *= d
    ab = a.reshape((B, n, n))
    x = _gj_inverse_f32(ab.astype(jnp.float32),
                        interpret=interpret).astype(a.dtype)
    if refine_steps:
        eye = jnp.eye(n, dtype=a.dtype)

        def refine(_, x):
            return x + x @ (eye - ab @ x)

        x = lax.fori_loop(0, refine_steps, refine, x)
    return x.reshape(a.shape)


def _make_inverse(refine_steps: int):
    @jax.custom_batching.custom_vmap
    def inv(a):
        return _inverse_impl(a, refine_steps, None)

    @inv.def_vmap
    def _inv_vmap(axis_size, in_batched, a):
        # Re-enter the custom_vmap function (NOT the impl): under NESTED
        # vmaps (fit: vmap over starts ∘ vmap over experiments) each vmap
        # level must keep collapsing into the kernel batch. Calling the
        # impl here froze the innermost (size-1 experiment) batch and let
        # the outer starts-vmap fall back to default pallas batching —
        # profiled as a kernel input of [512, 22, 22, 128] with 127 of
        # 128 matrices identity padding per start (128x wasted work).
        del axis_size, in_batched
        return inv(a), True

    return inv


# refine-step variants (custom_vmap functions take array args only)
_INV_F64 = _make_inverse(2)   # f32 kernel + 2 Newton-Schulz -> ~1e-13
_INV_F32 = _make_inverse(1)   # f32 kernel + 1 f32 polish


def _make_schur():
    @jax.custom_batching.custom_vmap
    def inv(a):
        n = a.shape[-1]
        lead = a.shape[:-2]
        B = 1
        for d in lead:
            B *= d
        ab = a.reshape((B, n, n))
        x = _schur_inverse(ab.astype(jnp.float32)).astype(a.dtype)
        return _refine(ab, x).reshape(a.shape)

    @inv.def_vmap
    def _inv_vmap(axis_size, in_batched, a):
        # re-enter the custom_vmap fn so nested vmaps keep collapsing
        # into the kernel batch (see _make_inverse._inv_vmap)
        del axis_size, in_batched
        return inv(a), True

    return inv


_SCHUR_INV = _make_schur()

# In-kernel size limit: the kernel keeps ~4 f32 (n, n, block) buffers
# resident in VMEM; above n≈64 no useful block fits (n=97 fails to
# compile on hardware while n<=64 works). Larger matrices take the
# f32-LU + Newton-Schulz-refinement path below — same numerics contract.
MAX_KERNEL_N = 64


def _refine(a: jax.Array, x: jax.Array) -> jax.Array:
    """Newton–Schulz refinement in the caller's dtype (2 right steps for
    f64, 1 for f32). Right-refinement drives ``AX - I`` quadratically but
    leaves ``XA - I`` κ-amplified; a final LEFT step (f64 only) balances
    both residuals to ~1e-13 at n≈100/κ≈4e3."""
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    steps = 2 if a.dtype == jnp.float64 else 1
    for _ in range(steps):
        x = x + x @ (eye - a @ x)
    if a.dtype == jnp.float64:
        x = x + (eye - x @ a) @ x
    return x


def _large_n_inverse(a: jax.Array) -> jax.Array:
    """n > MAX_KERNEL_N fallback: f32 pure-JAX LU inverse + refinement
    (robust for any conditioning the f32 factorization survives)."""
    from tpusysbio.linalg import lu as _lu

    x = _lu.lu_inverse(a.astype(jnp.float32)).astype(a.dtype)
    return _refine(a, x)


def _schur_inverse(a: jax.Array) -> jax.Array:
    """Batched inverse for MAX_KERNEL_N < n <= 2*MAX_KERNEL_N via one level
    of block-Schur elimination (EGFR-class n≈100 states).

    Splits ``A = [[A11, A12], [A21, A22]]`` with an in-VMEM-budget leading
    block, inverts the two small blocks with the Pallas kernel, and
    assembles the inverse with six batched MXU matmuls::

        X11 = A11⁻¹;  S = A22 − A21 X11 A12;  XS = S⁻¹
        B22 = XS             B12 = −X11 A12 XS
        B21 = −XS A21 X11    B11 = X11 − B12 A21 X11

    No pivoting crosses the block boundary — fine for the diagonally
    dominant Newton matrices ``I − c·J`` this path serves (and the f64
    Newton–Schulz refinement in the caller recovers the last digits).
    A near-singular LEADING BLOCK (possible even when the full matrix is
    well-conditioned) would yield a FINITE-but-wrong inverse that
    refinement amplifies rather than fixes, so members whose residual
    ``‖I − A·X‖∞`` exceeds the refinement convergence bound are poisoned
    with NaN — downstream failure detection (Newton rejection → smaller
    step → a more diagonally dominant ``I − c·J``) handles them, and
    direct callers see an unmistakable failure instead of garbage.
    ``a`` is (B, n, n); f32."""
    n = a.shape[-1]
    n1 = MAX_KERNEL_N
    a11, a12 = a[:, :n1, :n1], a[:, :n1, n1:]
    a21, a22 = a[:, n1:, :n1], a[:, n1:, n1:]
    x11 = _gj_inverse_f32(a11, interpret=jax.default_backend() != "tpu")
    x11_a12 = x11 @ a12
    s = a22 - a21 @ x11_a12
    xs = _gj_inverse_f32(s, interpret=jax.default_backend() != "tpu")
    b12 = -(x11_a12 @ xs)
    a21_x11 = a21 @ x11
    b21 = -(xs @ a21_x11)
    b11 = x11 - b12 @ a21_x11
    top = jnp.concatenate([b11, b12], axis=-1)
    bot = jnp.concatenate([b21, xs], axis=-1)
    x = jnp.concatenate([top, bot], axis=-2)
    # residual guard (see docstring): one extra batched f32 matmul vs the
    # six above. Newton-Schulz converges iff the OPERATOR norm of I − AX
    # is < 1, so the guard uses the induced ∞-norm (max row sum) — the
    # element-wise max can under-read it by up to n× at n≈128. 0.5 leaves
    # margin while staying far above the eps32·κ·n of any healthy member.
    eye = jnp.eye(n, dtype=x.dtype)
    resid = jnp.max(jnp.sum(jnp.abs(eye - a @ x), axis=-1), axis=-1)
    return jnp.where((resid < 0.5)[:, None, None], x, jnp.nan)


def inverse(a: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Inverse of ``a`` (..., n, n); f32 Pallas kernel + refinement in the
    input dtype (2 Newton-Schulz steps for f64, 1 for f32). Any stack of
    ``vmap`` axes collapses into the kernel batch via ``custom_vmap``.
    For n > ``MAX_KERNEL_N`` (VMEM limit) the same result comes from the
    f32-LU + refinement fallback, so every caller gets a working inverse
    at any size.

    ``interpret`` is resolved inside the impl (True off-TPU)."""
    del interpret  # resolved at trace time inside the impl
    n = a.shape[-1]
    if n > 2 * MAX_KERNEL_N:
        return _large_n_inverse(a)
    if n > MAX_KERNEL_N:
        # one level of block-Schur elimination: two in-budget kernel
        # calls + six batched MXU matmuls (EGFR-class n≈100)
        return _SCHUR_INV(a)
    if a.dtype == jnp.float32:
        return _INV_F32(a)
    return _INV_F64(a)


# ---------------------------------------------------------------------------
# Fused solve + double-float iterative refinement kernel
#
# The lazy factorization (factor_for_solve) moved the precision lifting from
# the matrix to the solve; profiling the tight path shows the remaining cost
# is XLA's PRECISION-EMULATION overhead on tiny arrays: the f64 residual
# matvec lowers to emulated-f64 select/DUS chains, and each f32 `x32 @ b` at
# highest precision becomes a 6-pass bf16 MXU algorithm with data-formatting
# copies (hlo_stats: compare-select + dynamic-update-slice on
# [*,B,n,n]-shaped buffers ≈ 60% of tight-step device time). This kernel
# runs the whole sequence on the VPU inside ONE pallas_call, representing
# f64 quantities as double-float (hi, lo) f32 pairs with error-free
# transforms (Dekker TwoProd / Knuth TwoSum, Ogita-Rump-Oishi compensated
# pairwise dot) — VPU f32 arithmetic is exact, so no emulation passes exist:
#
#     y  = X b                      (f32 apply)
#     repeat `steps`:  r = b − A y  (double-float, compensated)
#                      y += X r     (f32 correction, double-float update)
#
# Per-step error contracts by ~eps32·κ(A) exactly as the XLA path, but a
# step costs ~10 f32 VPU passes over (n,n,B) VMEM blocks instead of
# dozens of dispatched emulation ops. A/B on MAPK-22 tight (docs/
# PERFORMANCE.md round-3): XLA 2-step refinement 165.9 int/s, no
# refinement 305.4 — this kernel closes most of that gap at full
# refinement accuracy.
# ---------------------------------------------------------------------------

_REFINE_MAX_N = 64    # npad² VMEM budget; larger n falls back to XLA refine
_REFINE_STEPS = 3


def _refine_block(npad: int) -> int:
    """Batch block per kernel invocation: 3 (npad, npad, block) f32 inputs
    + 2 (npad, npad, block) intermediates must sit in VMEM; shrink the
    block at npad=64 (Radau's 2n embedding of MAPK-22-class models)."""
    return 64 if npad > 32 else _MAX_BLOCK


def _two_sum(a, b):
    """Knuth error-free addition: a + b = s + e exactly."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _split_hi(a):
    """Upper 12 mantissa bits of f32 ``a`` by bit masking (sign/exponent
    kept, low 12 mantissa bits zeroed). Unlike the Veltkamp 2^12+1
    multiply split, this cannot be broken by compiler FMA contraction —
    measured: XLA-CPU fuses ``a*c - (a*c - a)`` into FMAs that destroy
    the split (jit matvec error 1.2e-7 vs 1.3e-14 eager)."""
    ai = lax.bitcast_convert_type(a, jnp.int32)
    return lax.bitcast_convert_type(ai & jnp.int32(-4096), jnp.float32)


def _two_prod(a, b):
    """Error-free product: a·b = p + e to ~eps² relative accuracy.

    COMPILER-PROOF BY CONSTRUCTION: the classic Dekker form subtracts the
    rounded product ``p = fl(a·b)`` from exact partials — LLVM/Mosaic FMA
    contraction rewrites ``ah·bh − p`` into ``fma(ah, bh, −a·b_exact)``,
    deleting exactly the rounding error the transform exists to capture
    (measured: jit matvec error 1.2e-7 vs 1.3e-14 eager; HLO unchanged, so
    the contraction happens at codegen). Instead ``p`` is assembled from
    the four EXACT partial products (12×12 mantissa bits ≤ 24) with
    TwoSum: every multiply that reaches an add is exactly representable,
    so ``fma(x, y, z) == round(x·y + z) == round(fl(x·y) + z)`` and any
    contraction the backend applies is value-identical."""
    ah = _split_hi(a)
    al = a - ah
    bh = _split_hi(b)
    bl = b - bh
    s1, t1 = _two_sum(ah * bl, al * bh)
    p, t2 = _two_sum(ah * bh, s1)
    e = t1 + t2 + al * bl
    return p, e


def _make_refine_kernel(npad: int, steps: int):
    def kernel(x_ref, ahi_ref, alo_ref, bhi_ref, blo_ref,
               yhi_ref, ylo_ref):
        # layouts (batch-minor): x/ahi/alo (npad, npad, B) zero-padded;
        # bhi/blo (npad, 1, B). Vectors flip between axis-0 (npad, 1, B)
        # and axis-1 (1, npad, B) orientation via exact eye-mask reduces.
        B = x_ref.shape[2]
        dt = x_ref.dtype
        eye = (lax.broadcasted_iota(jnp.int32, (npad, npad, 1), 0)
               == lax.broadcasted_iota(jnp.int32, (npad, npad, 1), 1)
               ).astype(dt)
        X = x_ref[:]
        Ahi = ahi_ref[:]
        Alo = alo_ref[:]
        bhi0 = bhi_ref[:]
        blo0 = blo_ref[:]

        def flip01(v):          # (npad, 1, B) -> (1, npad, B), exact
            return jnp.sum(v * eye, axis=0, keepdims=True)

        def pairwise_df(p, e):
            """Compensated reduction over axis 1 (length npad, pow2):
            Σ(p + e) as a double-float (npad, 1, B) pair."""
            k = npad
            while k > 1:
                k //= 2
                s, err = _two_sum(p[:, :k, :], p[:, k:2 * k, :])
                e = e[:, :k, :] + e[:, k:2 * k, :] + err
                p = s
            return p, e

        bhi_r = flip01(bhi0)    # (1, npad, B)
        blo_r = flip01(blo0)
        # y0 = X b  (f32 apply, double-float carried)
        yhi = jnp.sum(X * bhi_r, axis=1, keepdims=True)   # (npad, 1, B)
        ylo = jnp.zeros_like(yhi)
        for _ in range(steps):
            yhi_r = flip01(yhi)
            ylo_r = flip01(ylo)
            # A y in double-float: exact products + compensated reduce
            p, e = _two_prod(Ahi, yhi_r)
            e = e + Ahi * ylo_r + Alo * yhi_r
            shi, slo = pairwise_df(p, e)                  # (npad, 1, B)
            # r = b - A y  (double-float)
            rhi, rerr = _two_sum(bhi0, -shi)
            r = rhi + (rerr + blo0 - slo)                 # f32 residual
            # y += X r
            dy = jnp.sum(X * flip01(r), axis=1, keepdims=True)
            yhi, err = _two_sum(yhi, dy)
            ylo = ylo + err
        s, e = _two_sum(yhi, ylo)
        yhi_ref[:] = s
        ylo_ref[:] = e

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _refine_solve_f32pairs(x32, ahi, alo, bhi, blo, interpret=False):
    """Batched fused solve+refine: inputs (B, n, n) / (B, n); outputs the
    double-float solution (yhi, ylo) as two (B, n) f32 arrays."""
    B, n = x32.shape[0], x32.shape[-1]
    npad = 1
    while npad < n:
        npad *= 2
    block = _refine_block(npad)
    pad_b = (-B) % block
    Bp = B + pad_b

    def pad_mat(m):
        out = jnp.zeros((Bp, npad, npad), m.dtype)
        return out.at[:B, :n, :n].set(m)

    def pad_vec(v):
        out = jnp.zeros((Bp, npad), v.dtype)
        return out.at[:B, :n].set(v)

    xp = jnp.transpose(pad_mat(x32), (1, 2, 0))
    ahip = jnp.transpose(pad_mat(ahi), (1, 2, 0))
    alop = jnp.transpose(pad_mat(alo), (1, 2, 0))
    bhip = jnp.transpose(pad_vec(bhi), (1, 0))[:, None, :]
    blop = jnp.transpose(pad_vec(blo), (1, 0))[:, None, :]

    def _imap_m(i):
        return (jnp.int32(0), jnp.int32(0), i)

    out_sh = jax.ShapeDtypeStruct((npad, 1, Bp), jnp.float32)
    yhi, ylo = pl.pallas_call(
        _make_refine_kernel(npad, _REFINE_STEPS),
        out_shape=(out_sh, out_sh),
        grid=(Bp // block,),
        in_specs=[pl.BlockSpec((npad, npad, block), _imap_m,
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((npad, 1, block), _imap_m,
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((npad, 1, block), _imap_m,
                                memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(xp, ahip, alop, bhip, blop)
    yhi = jnp.transpose(yhi[:, 0, :], (1, 0))[:B, :n]
    ylo = jnp.transpose(ylo[:, 0, :], (1, 0))[:B, :n]
    return yhi, ylo


@jax.custom_batching.custom_vmap
def _refine_solve(x32, a, b):
    """Double-float fused solve: ``a`` (..., n, n) f64, ``x32`` its f32
    inverse, ``b`` (..., n) f64 -> (..., n) f64 solution of ``a y = b``."""
    lead = a.shape[:-2]
    n = a.shape[-1]
    B = 1
    for d in lead:
        B *= d
    ab = a.reshape((B, n, n))
    ahi = ab.astype(jnp.float32)
    alo = (ab - ahi.astype(ab.dtype)).astype(jnp.float32)
    bb = b.reshape((B, n))
    bhi = bb.astype(jnp.float32)
    blo = (bb - bhi.astype(bb.dtype)).astype(jnp.float32)
    yhi, ylo = _refine_solve_f32pairs(
        x32.reshape((B, n, n)), ahi, alo, bhi, blo,
        interpret=jax.default_backend() != "tpu")
    y = yhi.astype(b.dtype) + ylo.astype(b.dtype)
    return y.reshape(b.shape)


@_refine_solve.def_vmap
def _refine_solve_vmap(axis_size, in_batched, x32, a, b):
    # Re-enter so nested vmaps collapse into the kernel batch. Unbatched
    # operands (e.g. a shared factorization against a batched RHS,
    # in_axes=(None, None, 0)) are materialized along the new axis first —
    # custom_vmap rules receive operands as-is, and the reshape-based
    # collapse below the re-entry needs every operand to carry the axis.
    ops = []
    for batched, op in zip(in_batched, (x32, a, b)):
        if not batched:
            op = jnp.broadcast_to(op[None], (axis_size,) + op.shape)
        ops.append(op)
    return _refine_solve(*ops), True


def factor_for_solve(a: jax.Array):
    """Newton-solve factorization with LAZY precision lifting.

    ``inverse(a_f64)`` refines the whole f32 kernel inverse up to ~1e-13
    with Newton-Schulz MATRIX steps — six emulated-f64 (n,n)@(n,n)
    matmuls. Inside a vmapped BDF/Radau while_loop the ``lax.cond``
    guarding factorization reuse lowers to a select, so that O(n³)
    emulated-f64 work ran on EVERY step attempt of the whole ensemble and
    dominated the tight-path step time (docs/PERFORMANCE.md round-3 tight
    analysis). This factorization instead keeps only the f32 inverse plus
    the original matrix; precision is recovered per SOLVE with O(n²)
    iterative refinement (``solve_refined``) — the classic
    LAPACK ``gesvx``-style mixed-precision scheme (SURVEY.md §7 hard
    part 3), placed where the TPU's f64 emulation cost is smallest.
    """
    return (inverse(a.astype(jnp.float32)), a)


def solve_refined(fact, b: jax.Array, steps: int = 2) -> jax.Array:
    """Solve ``A x = b`` from ``factor_for_solve(A)``.

    f32 RHS (sensitivity columns, screening mode): one f32 matmul.
    f64 RHS: f32 inverse application + ``steps`` rounds of iterative
    refinement with the residual formed in f64 — per-step error contracts
    by ~eps32·κ(A), so two rounds reach ~(eps32·κ)³ + eps64·κ, ample for
    the Newton corrections (whose fixed point ``residual = 0`` is exact
    regardless of solve precision).
    """
    x32, a = fact
    f32 = jnp.float32
    if b.dtype == f32 or a.dtype == f32:
        return (x32 @ b.astype(f32)).astype(b.dtype)
    n = a.shape[-1]
    if (steps <= _REFINE_STEPS and n <= _REFINE_MAX_N
            and b.ndim == a.ndim - 1 + 1 and b.shape[-1] == 1):
        # single f64 column (the BDF/Radau state solve): fused VPU kernel.
        # The kernel performs _REFINE_STEPS (>= the requested ``steps``)
        # double-float rounds at ~zero marginal cost, so ``steps`` acts as
        # a MINIMUM here; a request for MORE rounds than the kernel bakes
        # in falls through to the XLA loop below and is honored exactly.
        return _refine_solve(x32, a, b[..., 0])[..., None]
    y = (x32 @ b.astype(f32)).astype(a.dtype)
    for _ in range(steps):
        r = b - a @ y
        y = y + (x32 @ r.astype(f32)).astype(a.dtype)
    return y
