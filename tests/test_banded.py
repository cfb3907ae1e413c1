"""Banded LU tests (LAPACK gbtrf/gbtrs role — SURVEY.md §2b LAPACK row
"dense/banded"): correctness vs dense solves on diagonally dominant
banded systems (the Newton-matrix shape of chain-structured pathways),
multi-RHS, vmapped batches, and packing round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.linalg import banded


def _random_banded(n, kl, ku, seed=0, dom=4.0):
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n))
    for d in range(-ku, kl + 1):
        m = n - abs(d)
        vals = rng.normal(size=m)
        if d >= 0:
            A[np.arange(d, n), np.arange(0, n - d)] = vals
        else:
            A[np.arange(0, n + d), np.arange(-d, n)] = vals
    A += dom * np.eye(n)  # diagonal dominance (I - c*J Newton shape)
    return jnp.asarray(A)


@pytest.mark.parametrize("n,kl,ku", [(12, 1, 1), (30, 2, 3), (97, 3, 3),
                                     (16, 0, 2), (16, 2, 0)])
def test_banded_solve_matches_dense(n, kl, ku):
    A = _random_banded(n, kl, ku, seed=n + kl)
    B = banded.band_from_dense(A, kl, ku)
    np.testing.assert_allclose(
        np.asarray(banded.band_to_dense(B, kl, ku)), np.asarray(A),
        atol=1e-14)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(n,)))
    LU = banded.banded_factor(B, kl, ku)
    x = banded.banded_solve(LU, b, kl, ku)
    ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-10, atol=1e-12)


def test_banded_multi_rhs_and_vmap():
    n, kl, ku = 40, 2, 2
    rng = np.random.default_rng(7)
    As = jnp.stack([_random_banded(n, kl, ku, seed=s) for s in range(4)])
    Bs = jax.vmap(lambda A: banded.band_from_dense(A, kl, ku))(As)
    rhs = jnp.asarray(rng.normal(size=(4, n, 3)))

    def solve_one(Bb, bb):
        LU = banded.banded_factor(Bb, kl, ku)
        return banded.banded_solve(LU, bb, kl, ku)

    xs = jax.jit(jax.vmap(solve_one))(Bs, rhs)
    for i in range(4):
        ref = np.linalg.solve(np.asarray(As[i]), np.asarray(rhs[i]))
        np.testing.assert_allclose(np.asarray(xs[i]), ref, rtol=1e-9,
                                   atol=1e-11)


def test_banded_work_is_linear_in_n():
    """The point of banded over dense: a chain Jacobian at n=200, kl=ku=1
    solves correctly — dense O(n³) replaced by O(n·b²)."""
    n = 200
    A = _random_banded(n, 1, 1, seed=3)
    B = banded.band_from_dense(A, 1, 1)
    b = jnp.asarray(np.random.default_rng(2).normal(size=(n,)))
    x = banded.banded_solve(banded.banded_factor(B, 1, 1), b, 1, 1)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                               rtol=1e-9, atol=1e-10)


def test_bdf_with_banded_newton_matches_dense():
    """linear_solver='banded' end to end: a chain-relay pathway (kl=ku=1
    Jacobian) integrated by BDF with banded Newton solves matches the
    dense-inverse path."""
    from tpusysbio.config import SolverConfig
    from tpusysbio.solvers import bdf_solve

    n = 24
    k = 2.0

    def rhs(t, y):
        # linear relay chain with a nonlinear sink on the last species
        inflow = jnp.concatenate([jnp.asarray([0.0], y.dtype), y[:-1]])
        out = k * (inflow - y)
        return out.at[-1].add(-0.5 * y[-1] ** 2)

    y0 = jnp.zeros((n,)).at[0].set(1.0)
    t_eval = jnp.linspace(0.0, 5.0, 6)
    dense = jax.jit(lambda: bdf_solve(
        rhs, (0.0, 5.0), y0, t_eval,
        config=SolverConfig(rtol=1e-6, atol=1e-9, linear_solver="inv")))()
    band = jax.jit(lambda: bdf_solve(
        rhs, (0.0, 5.0), y0, t_eval,
        config=SolverConfig(rtol=1e-6, atol=1e-9, linear_solver="banded",
                            jac_bandwidth=(1, 1))))()
    assert int(dense.status) == 1 and int(band.status) == 1
    np.testing.assert_allclose(np.asarray(band.ys), np.asarray(dense.ys),
                               rtol=1e-6, atol=1e-9)
    # same step counts: the banded factorization is numerically the same
    # LU (no pivoting needed for the diagonally dominant I - c*J)
    assert abs(int(band.nsteps) - int(dense.nsteps)) <= 2
