"""Banded LU factorization and solves (LAPACK ``gbtrf/gbtrs`` role,
SURVEY.md §2b LAPACK row "dense/banded").

Chain-structured pathway models (linear reaction cascades, signaling
relays, discretized transport) have Jacobians with bandwidth ``(kl, ku)``
≪ n, so the Newton matrices ``I − c·J`` are banded too: factorizing them
densely is O(n³) where O(n·(kl+ku)²) suffices. This module implements:

- ``band_from_dense(A, kl, ku)`` — LAPACK-style diagonal-packed storage
  ``B[ku + i - j, j] = A[i, j]`` (shape (kl+ku+1, n)),
- ``banded_factor`` — LU WITHOUT pivoting (the Newton matrices this
  serves are strongly diagonally dominant for the step sizes BDF
  accepts; callers needing pivoting use the dense paths) as one
  ``lax.scan`` over the n pivot columns with O(kl·(kl+ku)) masked work
  per step,
- ``banded_solve`` — forward/back substitution as two scans.

All functions vmap over leading batch axes (pure ``lax`` ops, no Python
control flow on values). The sequential O(n) scan is the right shape for
CPU and for LARGE-n chain models where dense O(n³) is prohibitive; for
n ≤ 128 dense-kernel sizes the batched Pallas Gauss–Jordan
(linalg/pallas_lu.py) usually wins on TPU — measured guidance in
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def band_from_dense(A: jax.Array, kl: int, ku: int) -> jax.Array:
    """Pack the (kl+ku+1, n) diagonal-storage band of dense ``A`` (n, n).

    Row ``ku + d`` of the result holds diagonal ``d`` (d = i - j;
    d = -ku..kl), i.e. ``B[ku + i - j, j] = A[i, j]``; entries outside
    the matrix are zero."""
    n = A.shape[-1]
    rows = []
    for d in range(-ku, kl + 1):
        diag = jnp.diagonal(A, offset=-d, axis1=-2, axis2=-1)
        # diagonal d has n - |d| entries; align at column index j where
        # the element A[j + d, j] exists: j in [max(0, -d), n - max(0, d))
        pad_left = max(0, -d)
        pad_right = n - diag.shape[-1] - pad_left
        rows.append(jnp.pad(diag, [(0, 0)] * (diag.ndim - 1)
                            + [(pad_left, pad_right)]))
    return jnp.stack(rows, axis=-2)


def band_to_dense(B: jax.Array, kl: int, ku: int) -> jax.Array:
    """Inverse of ``band_from_dense`` (testing utility)."""
    n = B.shape[-1]
    A = jnp.zeros(B.shape[:-2] + (n, n), B.dtype)
    for d in range(-ku, kl + 1):
        row = B[..., ku + d, :]
        m = n - abs(d)
        if d >= 0:
            vals = row[..., :m] if d > 0 else row
            A += jnp.zeros_like(A).at[..., jnp.arange(d, n),
                                      jnp.arange(0, n - d)].set(
                vals[..., :n - d])
        else:
            vals = row[..., -d:]
            A += jnp.zeros_like(A).at[..., jnp.arange(0, n + d),
                                      jnp.arange(-d, n)].set(
                vals[..., :n + d])
    return A


def banded_factor(B: jax.Array, kl: int, ku: int) -> jax.Array:
    """LU of a banded matrix in diagonal-packed storage, no pivoting.

    Returns packed ``LU``: rows 0..ku-1+... hold U's diagonals (in the
    same layout as the input), rows ku+1..ku+kl hold L's multipliers.
    One ``lax.scan`` over the n pivot columns; each step eliminates the
    kl subdiagonal entries of the pivot column and updates the O(kl·ku)
    active window — total O(n·kl·(kl+ku)).
    """
    n = B.shape[-1]
    w = kl + ku + 1
    dt = B.dtype
    tiny = jnp.asarray(1e-300 if dt == jnp.float64 else 1e-30, dt)

    # work in "column-aligned" dense-window form: W[r, j] = B row r col j.
    def step(W, j):
        # pivot = U[j, j] = W[ku, j]
        piv = W[ku, j]
        piv = jnp.where(jnp.abs(piv) > tiny, piv,
                        jnp.where(piv >= 0, tiny, -tiny))
        if kl == 0:
            return W.at[ku, j].set(piv), None
        # multipliers l_i = A[j+i, j] / piv for i = 1..kl
        sub = lax.dynamic_slice(W, (ku + 1, j), (kl, 1))[:, 0]
        mult = sub / piv
        # row update: for each i = 1..kl, subtract mult_i * U[j, j+d]
        # from A[j+i, j+d] for d = 1..ku. In packed storage:
        # A[j+i, j+d] lives at W[ku + i - d, j + d];
        # U[j, j+d] lives at W[ku - d, j + d].
        for i in range(1, kl + 1):
            for d in range(1, ku + 1):
                r_t, r_u = ku + i - d, ku - d
                col = j + d
                upd = W[r_t, col] - mult[i - 1] * W[r_u, col]
                ok = col < n
                W = W.at[r_t, col].set(jnp.where(ok, upd, W[r_t, col]))
        # store multipliers in place of the eliminated entries
        W = lax.dynamic_update_slice(W, mult[:, None], (ku + 1, j))
        W = W.at[ku, j].set(piv)
        return W, None

    LU, _ = lax.scan(step, B, jnp.arange(n))
    return LU


def banded_solve(LU: jax.Array, b: jax.Array, kl: int,
                 ku: int) -> jax.Array:
    """Solve ``A x = b`` from ``banded_factor`` output. ``b`` is (n,) or
    (n, m)."""
    n = LU.shape[-1]
    vec = b.ndim == 1
    bb = b[:, None] if vec else b

    # forward: L y = b (unit diagonal; multipliers in rows ku+1..)
    def fwd(carry, j):
        y = carry
        yj = y[j]
        # subtract yj * l_i from rows j+1..j+kl
        for i in range(1, kl + 1):
            r = j + i
            ok = r < n
            li = LU[ku + i, j]
            y = y.at[jnp.minimum(r, n - 1)].add(
                jnp.where(ok, -li * yj, 0.0))
        return y, None

    y, _ = lax.scan(fwd, bb, jnp.arange(n))

    # back: U x = y; U[j, j+d] at LU[ku - d, j + d]
    def bwd(carry, jrev):
        x = carry
        j = n - 1 - jrev
        acc = x[j]
        for d in range(1, ku + 1):
            col = j + d
            ok = col < n
            u = LU[ku - d, jnp.minimum(col, n - 1)]
            acc = acc - jnp.where(ok, u * x[jnp.minimum(col, n - 1)], 0.0)
        x = x.at[j].set(acc / LU[ku, j])
        return x, None

    x, _ = lax.scan(bwd, y, jnp.arange(n))
    return x[:, 0] if vec else x
