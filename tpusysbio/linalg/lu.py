"""Pivoted LU factorization and triangular solves in pure JAX ops.

Why not ``jnp.linalg``: on the target TPU the XLA LuDecomposition expander
supports only f32/c64 — f64 (needed for stiff-Newton accuracy, SURVEY.md §7
hard part 3) fails at compile time. This module implements right-looking
Gaussian elimination with partial pivoting using ``lax.fori_loop`` over pivot
columns and fully masked (branchless) row updates, which

- jits and runs on TPU in emulated f64 (verified: max|Ax-b| ~ 1e-14 at n=8,
  SURVEY.md §7 environment notes),
- vmaps cleanly over a multi-start ensemble axis (no data-dependent shapes),
- keeps the per-step work identical across batch members (lockstep-friendly).

Shapes: factorization is O(n^3) with n sequential pivot steps; solves are
O(n^2) with n sequential steps. For ensemble throughput prefer
``lu_inverse`` (one factorization + n-column solve, after which every Newton
solve is a single (n,n)x(n,k) matmul on the MXU) — see linalg/newton.py.

Spec parity target: ``scipy.linalg.lu_factor`` / ``lu_solve`` as used by the
BDF core at ``scipy/integrate/_ivp/bdf.py:231-236``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lu_factor(a: jax.Array):
    """LU with partial pivoting: returns ``(lu, piv)``.

    ``lu`` stores U on and above the diagonal and the unit-lower-triangular
    multipliers strictly below it. ``piv`` is the LAPACK-style pivot vector:
    at step k, rows k and piv[k] were swapped.

    A zero pivot is replaced by a tiny signed epsilon instead of producing
    inf/nan, so a singular Newton matrix yields a garbage-but-finite solve
    that the step controller rejects, rather than poisoning a vmapped batch
    (SURVEY.md §5 failure-detection contract).
    """
    n = a.shape[-1]
    dtype = a.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    idx = jnp.arange(n)

    def body(k, carry):
        lu, piv = carry
        col = jnp.abs(lu[:, k])
        col = jnp.where(idx >= k, col, -jnp.inf)
        p = jnp.argmax(col).astype(jnp.int32)
        piv = piv.at[k].set(p)
        # swap rows k <-> p (p == k is a no-op)
        row_k = lu[k]
        row_p = lu[p]
        lu = lu.at[k].set(row_p).at[p].set(row_k)
        pivot = lu[k, k]
        pivot = jnp.where(jnp.abs(pivot) > tiny, pivot,
                          jnp.where(pivot >= 0, tiny, -tiny))
        lu = lu.at[k, k].set(pivot)  # keep the guarded pivot for lu_solve
        below = idx > k
        factor = jnp.where(below, lu[:, k] / pivot, jnp.zeros((), dtype))
        # rank-1 elimination of rows below k, restricted to the active
        # submatrix columns j >= k (columns < k hold stored L multipliers)
        row_k_active = jnp.where(idx >= k, lu[k], jnp.zeros((), dtype))
        lu = lu - factor[:, None] * row_k_active[None, :]
        # store multipliers in the eliminated column
        lu = lu.at[:, k].set(jnp.where(below, factor, lu[:, k]))
        return lu, piv

    lu, piv = lax.fori_loop(0, n, body, (a, jnp.zeros((n,), jnp.int32)))
    return lu, piv


def _apply_pivots(piv: jax.Array, b: jax.Array) -> jax.Array:
    n = piv.shape[0]

    def body(k, b):
        p = piv[k]
        bk = b[k]
        bp = b[p]
        return b.at[k].set(bp).at[p].set(bk)

    return lax.fori_loop(0, n, body, b)


def lu_solve(factors, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` given ``factors = lu_factor(A)``.

    ``b`` may be a vector ``(n,)`` or a matrix of right-hand sides ``(n, k)``
    — the matrix form is how sensitivity columns share the state LU
    (staggered corrector, SURVEY.md §3.3).
    """
    lu, piv = factors
    n = lu.shape[-1]
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    b = _apply_pivots(piv, b)
    idx = jnp.arange(n)
    zero = jnp.zeros((), lu.dtype)

    def fwd(k, y):
        # y[k] <- b[k] - L[k, :k] @ y[:k]   (unit diagonal)
        lrow = jnp.where(idx < k, lu[k], zero)
        return y.at[k].set(y[k] - lrow @ y)

    y = lax.fori_loop(0, n, fwd, b)

    def bwd(i, x):
        k = n - 1 - i
        urow = jnp.where(idx > k, lu[k], zero)
        return x.at[k].set((x[k] - urow @ x) / lu[k, k])

    x = lax.fori_loop(0, n, bwd, y)
    return x[:, 0] if vec else x


def lu_inverse(a: jax.Array) -> jax.Array:
    """Explicit inverse via pivoted LU (one factor + n-column solve).

    Used by the ``'inv'`` Newton mode: amortize O(n^3) once per Jacobian
    refresh, then every Newton/sensitivity solve is a single matmul — the
    MXU-friendly lockstep shape for vmapped ensembles (SURVEY.md §2b LAPACK
    row). f64 accuracy is adequate for Newton corrections at these sizes.
    """
    n = a.shape[-1]
    return lu_solve(lu_factor(a), jnp.eye(n, dtype=a.dtype))


def solve(a: jax.Array, b: jax.Array) -> jax.Array:
    """Convenience ``A x = b`` (factor + solve). TPU-f64-safe."""
    return lu_solve(lu_factor(a), b)
