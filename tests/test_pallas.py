"""Pallas batched-inverse kernel tests (interpret mode on CPU; the same
kernel compiles via Mosaic on TPU). SURVEY.md §7 M7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.linalg import pallas_lu


@pytest.mark.parametrize("n", [4, 22, 97])
def test_inverse_accuracy(n):
    rng = np.random.default_rng(n)
    a = jnp.asarray(rng.normal(size=(n, n)))
    x = pallas_lu.inverse(a)
    assert float(jnp.max(jnp.abs(x @ a - jnp.eye(n)))) < 1e-11


def test_inverse_batched_vmap():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(6, 8, 8)))
    xs = jax.vmap(pallas_lu.inverse)(a)
    err = jnp.max(jnp.abs(jnp.einsum("bij,bjk->bik", xs, a) - jnp.eye(8)))
    assert float(err) < 1e-11


def test_inverse_needs_pivoting():
    a = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    x = pallas_lu.inverse(a)
    np.testing.assert_allclose(np.asarray(x), [[0.0, 1.0], [1.0, 0.0]],
                               atol=1e-12)


def test_schur_inverse_newton_matrix_batched_vmap():
    """The n=97 (EGFR-class) path: block-Schur via two kernel calls +
    MXU matmuls, on Newton-shaped matrices I - c*J, under vmap."""
    rng = np.random.default_rng(1)
    n, B = 97, 4
    J = rng.normal(scale=1.0, size=(B, n, n))
    a = jnp.asarray(np.eye(n)[None] - 0.05 * J)
    xs = jax.vmap(pallas_lu.inverse)(a)
    err = jnp.max(jnp.abs(jnp.einsum("bij,bjk->bik", xs, a) - jnp.eye(n)))
    assert float(err) < 1e-11


def test_large_n_lu_fallback():
    """n > 2*MAX_KERNEL_N uses the f32-LU + refinement fallback."""
    rng = np.random.default_rng(2)
    n = 2 * pallas_lu.MAX_KERNEL_N + 5
    a = jnp.asarray(np.eye(n) - 0.05 * rng.normal(size=(n, n)))
    x = pallas_lu.inverse(a)
    assert float(jnp.max(jnp.abs(x @ a - jnp.eye(n)))) < 1e-11
