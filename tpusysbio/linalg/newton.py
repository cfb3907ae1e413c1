"""Newton linear-solver strategies for the stiff steppers.

Abstracts "factor ``I - c*J`` once, solve many RHS against it" so the BDF and
Rosenbrock steppers are agnostic to the backing kernel:

- ``'lu'``    — pivoted LU + triangular solves (lu.py); reference-parity path.
- ``'inv'``   — explicit inverse; each solve is one (n,n)@(n,k) matmul.
                Best vmapped-ensemble throughput on the MXU; default.
- ``'pallas'``— VMEM-resident batched factor+solve Pallas kernel
                (linalg/pallas_lu.py), enabled per-config after profiling
                (SURVEY.md §7 M7).

Both strategies expose the same pytree "factorization" so the stepper state
stays shape-stable under ``lax.while_loop`` and ``vmap``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tpusysbio.linalg import lu as _lu


def make_linear_solver(kind: str,
                       bandwidth=None) -> Tuple[Callable, Callable]:
    """Return ``(factor, solve)``.

    ``factor(A) -> fact`` where ``A`` is (n, n);
    ``solve(fact, B) -> X`` where ``B`` is (n,) or (n, k).
    The factorization pytree has a fixed structure/shape for a given n, so it
    can live inside ``lax.while_loop`` carry state.

    ``bandwidth=(kl, ku)`` is required for ``kind='banded'`` (the LAPACK
    gbtrf/gbtrs role for chain-structured pathway Jacobians).
    """
    if kind == "lu":

        def factor(a):
            return _lu.lu_factor(a)

        def solve(fact, b):
            return _lu.lu_solve(fact, b)

        return factor, solve

    if kind == "inv":

        def factor(a):
            return _lu.lu_inverse(a)

        def solve(ainv, b):
            return ainv @ b

        return factor, solve

    if kind == "inv32":
        # Mixed precision (SURVEY.md §7 hard part 3): factor in fast f32,
        # lift to ~f64 with two Newton-Schulz refinement steps whose
        # matmuls run in (emulated) f64. Each Newton solve stays one
        # f64 matmul; the O(n^3) elimination leaves the slow emulated path.
        def factor(a):
            x = _lu.lu_inverse(a.astype(jnp.float32)).astype(a.dtype)
            eye = jnp.eye(a.shape[-1], dtype=a.dtype)
            x = x + x @ (eye - a @ x)
            x = x + x @ (eye - a @ x)
            return x

        def solve(ainv, b):
            return ainv @ b

        return factor, solve

    if kind == "pallas":
        # Imported lazily: the Pallas kernel is only compiled when requested.
        from tpusysbio.linalg import pallas_lu

        def factor(a):
            # f32 (screening): plain f32 kernel inverse; solve is one
            # matmul. f64 (tight): LAZY factorization — keep the f32
            # inverse + A, lift precision per solve with O(n²) iterative
            # refinement instead of O(n³) emulated-f64 matrix refinement
            # (which a vmapped while_loop would re-run every iteration).
            # n > pallas_lu.MAX_KERNEL_N dispatches internally (block-
            # Schur ≤128, f32-LU beyond), e.g. EGFR n=97.
            if a.dtype == jnp.float32:
                return pallas_lu.inverse(a)
            return pallas_lu.factor_for_solve(a)

        def solve(fact, b):
            if isinstance(fact, tuple):
                return pallas_lu.solve_refined(fact, b)
            return fact @ b

        return factor, solve

    if kind == "banded":
        from tpusysbio.linalg import banded as _banded

        if bandwidth is None:
            raise ValueError("kind='banded' requires bandwidth=(kl, ku)")
        kl, ku = bandwidth

        def factor(a):
            return _banded.banded_factor(
                _banded.band_from_dense(a, kl, ku), kl, ku)

        def solve(fact, b):
            return _banded.banded_solve(fact, b, kl, ku)

        return factor, solve

    raise ValueError(f"unknown linear solver kind {kind!r}")
