"""LU factor/solve unit tests — the Newton kernel every stepper relies on.

Oracle: numpy.linalg (LAPACK). The pure-JAX LU must hit machine precision
and keep it under vmap (ensemble batching) — SURVEY.md §2b LAPACK row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.linalg import lu_factor, lu_solve, lu_inverse, solve
from tpusysbio.linalg import make_linear_solver


@pytest.mark.parametrize("n", [2, 3, 8, 22, 64])
def test_lu_solve_matches_lapack(n):
    rng = np.random.default_rng(n)
    a = rng.normal(size=(n, n))
    b = rng.normal(size=(n,))
    x = np.asarray(lu_solve(lu_factor(jnp.asarray(a)), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-11,
                               atol=1e-11)


def test_lu_solve_matrix_rhs():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(10, 10))
    b = rng.normal(size=(10, 7))
    x = np.asarray(lu_solve(lu_factor(jnp.asarray(a)), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-10,
                               atol=1e-11)


def test_lu_needs_pivoting():
    # zero on the leading diagonal forces a row swap
    a = np.array([[0.0, 2.0], [3.0, 1.0]])
    b = np.array([4.0, 5.0])
    x = np.asarray(solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-12)


def test_lu_inverse():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(16, 16))
    inv = np.asarray(lu_inverse(jnp.asarray(a)))
    np.testing.assert_allclose(inv @ a, np.eye(16), atol=1e-10)


def test_vmapped_batch():
    """Ensemble axis: one factorization per batch member, all in lockstep."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(32, 12, 12))
    b = rng.normal(size=(32, 12))
    x = np.asarray(jax.vmap(solve)(jnp.asarray(a), jnp.asarray(b)))
    ref = np.stack([np.linalg.solve(ai, bi) for ai, bi in zip(a, b)])
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)


def test_singular_matrix_stays_finite():
    """Failure-detection contract: singular input -> finite garbage, not NaN
    (a poisoned batch member must be maskable — SURVEY.md §5)."""
    a = jnp.zeros((4, 4), dtype=jnp.float64)
    x = lu_solve(lu_factor(a), jnp.ones((4,), jnp.float64))
    assert bool(jnp.all(jnp.isfinite(x)))


@pytest.mark.parametrize("kind", ["lu", "inv"])
def test_linear_solver_strategies(kind):
    factor, solve_fn = make_linear_solver(kind)
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(9, 9)))
    b = jnp.asarray(rng.normal(size=(9, 3)))
    x = np.asarray(solve_fn(factor(a), b))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-9,
                               atol=1e-10)
