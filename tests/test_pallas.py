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


def test_inverse_large_batch_large_n_chunked():
    """n > 32 with a multi-128 batch takes the lax.map single-grid path
    (the multi-block grid OOMs scoped VMEM on hardware at this shape —
    the EGFR b512 screening regression); includes a non-multiple batch
    so the pad+chunk composition is exercised."""
    rng = np.random.default_rng(1)
    n, B = 64, 300
    # spectral radius of N(0,1)/sqrt(n) is ~1, so +4I keeps every member
    # comfortably nonsingular (plain N(0,1) has radius ~sqrt(n)=8)
    a = jnp.asarray(
        rng.normal(size=(B, n, n)) / np.sqrt(n) + 4.0 * np.eye(n),
        jnp.float32)
    xs = jax.vmap(pallas_lu.inverse)(a)
    err = jnp.max(jnp.abs(
        jnp.einsum("bij,bjk->bik", xs, a) - jnp.eye(n, dtype=jnp.float32)))
    assert float(err) < 5e-5


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


def test_error_free_transforms_survive_jit():
    """TwoSum/TwoProd must stay error-free UNDER JIT: LLVM/Mosaic FMA
    contraction silently rewrote the Dekker-split form ``ah*bh - fl(a*b)``
    into ``fma(ah, bh, -a*b_exact)``, deleting the rounding error the
    transform captures (jit matvec error 1.2e-7 vs 1.3e-14 eager). The
    rewritten _two_prod builds the product from four exact partials, so
    any contraction is value-identical; this guards the property."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096), jnp.float32)

    def df_dot(a, b):
        # worst case for contraction: products feeding a TwoSum chain
        p, e = pallas_lu._two_prod(a, b)
        k = a.shape[0]
        while k > 1:
            k //= 2
            s, err = pallas_lu._two_sum(p[:k], p[k:2 * k])
            e = e[:k] + e[k:2 * k] + err
            p = s
        return p[0], e[0]

    hi, lo = jax.jit(df_dot)(a, b)
    exact = float(np.sum(np.float64(np.asarray(a)) * np.float64(np.asarray(b))))
    got = float(hi) + float(lo)
    assert abs(got - exact) < 1e-10 * max(1.0, abs(exact))


@pytest.mark.parametrize("n", [5, 22, 30])
def test_fused_refine_solve_accuracy(n):
    """The fused double-float solve+refine kernel reaches ~1e-11 relative
    accuracy on Newton-shaped f64 systems (vs jnp f64 reference), for any
    n within the kernel budget, including non-power-of-two sizes."""
    rng = np.random.default_rng(n)
    B = 48
    a = jnp.asarray(np.eye(n)[None] - 0.08 * rng.standard_normal((B, n, n)))
    b = jnp.asarray(rng.standard_normal((B, n, 1)))
    fact = pallas_lu.factor_for_solve(a)
    y = pallas_lu.solve_refined(fact, b)
    y_ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    rel = np.max(np.abs(np.asarray(y) - y_ref) / (np.abs(y_ref) + 1e-30))
    assert rel < 1e-9
    assert y.dtype == b.dtype


def test_fused_refine_solve_nested_vmap():
    """Nested vmaps collapse into one kernel batch (custom_vmap), and the
    fused path matches the unbatched result."""
    rng = np.random.default_rng(0)
    n = 12
    a = jnp.asarray(np.eye(n) - 0.08 * rng.standard_normal((3, 4, n, n)))
    b = jnp.asarray(rng.standard_normal((3, 4, n, 1)))

    def solve_one(a, b):
        return pallas_lu.solve_refined(pallas_lu.factor_for_solve(a), b)

    y = jax.vmap(jax.vmap(solve_one))(a, b)
    y_ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=0, atol=1e-10)


def test_fused_refine_solve_unbatched_operands_broadcast():
    """A vmap with SHARED factorization against a batched RHS
    (in_axes=(None, None, 0)) must broadcast the unbatched operands along
    the new axis inside the custom_vmap rule (ADVICE r3: it previously
    re-entered with the operands as-is and failed in the reshape)."""
    rng = np.random.default_rng(1)
    n = 10
    a = jnp.asarray(np.eye(n) - 0.08 * rng.standard_normal((n, n)))
    b = jnp.asarray(rng.standard_normal((6, n, 1)))
    fact = pallas_lu.factor_for_solve(a)

    y = jax.vmap(lambda bb: pallas_lu.solve_refined(fact, bb))(b)
    y_ref = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=0, atol=1e-10)
    # and the mirror case: batched matrix, shared RHS
    a_b = jnp.asarray(np.eye(n)[None]
                      - 0.08 * rng.standard_normal((5, n, n)))
    b_s = jnp.asarray(rng.standard_normal((n, 1)))

    def solve_one(aa):
        return pallas_lu.solve_refined(pallas_lu.factor_for_solve(aa), b_s)

    y2 = jax.vmap(solve_one)(a_b)
    y2_ref = np.linalg.solve(np.asarray(a_b), np.asarray(b_s)[None])
    np.testing.assert_allclose(np.asarray(y2), y2_ref, rtol=0, atol=1e-10)
