"""Pallas TPU kernel: VMEM-resident batched matrix inverse for Newton solves.

Strategy (SURVEY.md §7 M7 + hard part 3): the TPU has no native f64 vector
unit, so the kernel runs Gauss–Jordan with partial pivoting in f32 entirely
in VMEM (one (N, 2N) augmented buffer, N sequential rank-1 updates on the
VPU, zero HBM roundtrips), then the caller applies one-two Newton–Schulz
refinement steps in (emulated) f64 outside the kernel::

    X ← X + X (I − A X)

which lifts the f32 inverse (~1e-7) to ~1e-13 — accurate enough for BDF
Newton *corrections* at rtol=1e-6 while keeping the O(n³) inner work in
fast f32. This replaces LAPACK ``getrf/getrs``
(``scipy/integrate/_ivp/bdf.py:231-236``) the TPU-native way.

Matrices are zero-padded into an identity block of size ``PAD`` (multiple
of 128 lanes; block-diagonal ⇒ the top-left block of the padded inverse is
the answer). ``vmap`` over a batch maps to a Pallas grid dimension.

Falls back to interpreter mode automatically on CPU (tests), compiled
Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_size(n: int) -> int:
    return max(_LANE, ((n + _LANE - 1) // _LANE) * _LANE)


def _gj_kernel(a_ref, out_ref, aug):
    """Gauss-Jordan with partial pivoting on [A | I] in VMEM scratch."""
    N = a_ref.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1))
    aug[:, :N] = a_ref[:]
    aug[:, N:] = eye.astype(a_ref.dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    def body(k, _):
        A = aug[:]
        colk = lax.dynamic_slice(A, (0, k), (N, 1))[:, 0]
        # pivot among rows >= k
        abscol = jnp.where(row_ids[:, 0] >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(abscol).astype(jnp.int32)
        rowk = lax.dynamic_slice_in_dim(A, k, 1, axis=0)   # (1, 2N)
        rowp = lax.dynamic_slice_in_dim(A, p, 1, axis=0)
        is_k = row_ids == k
        is_p = row_ids == p
        A2 = jnp.where(is_k, rowp, jnp.where(is_p, rowk, A))
        pivot = lax.dynamic_slice(rowp, (0, k), (1, 1))[0, 0]
        tiny = jnp.asarray(1e-30, A.dtype)
        pivot = jnp.where(jnp.abs(pivot) > tiny, pivot,
                          jnp.where(pivot >= 0, tiny, -tiny))
        norm_row = rowp / pivot           # (1, 2N)
        col2 = lax.dynamic_slice(A2, (0, k), (N, 1))  # (N, 1)
        factor = jnp.where(is_k, 0.0, col2)
        A3 = A2 - factor * norm_row
        aug[:] = jnp.where(is_k, norm_row, A3)
        return 0

    lax.fori_loop(0, N, body, 0)
    out_ref[:] = aug[:, N:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gj_inverse_padded(a_pad: jax.Array, interpret: bool = False):
    N = a_pad.shape[-1]
    return pl.pallas_call(
        _gj_kernel,
        out_shape=jax.ShapeDtypeStruct(a_pad.shape, a_pad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, 2 * N), a_pad.dtype)],
        interpret=interpret,
    )(a_pad)


def inverse(a: jax.Array, refine_steps: int = 2,
            interpret: bool | None = None) -> jax.Array:
    """Inverse of (n, n) ``a``; f32 Pallas kernel + f64 refinement.

    Output dtype matches the input. Under ``vmap`` the kernel batches over
    a grid. ``interpret`` defaults to True off-TPU (tests on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = a.shape[-1]
    N = _pad_size(n)
    eyeN = jnp.eye(N, dtype=jnp.float32)
    a32 = a.astype(jnp.float32)
    a_pad = eyeN.at[:n, :n].set(a32)
    x_pad = _gj_inverse_padded(a_pad, interpret=interpret)
    x = x_pad[:n, :n].astype(a.dtype)
    if refine_steps:
        eye = jnp.eye(n, dtype=a.dtype)

        def refine(_, x):
            return x + x @ (eye - a @ x)

        x = lax.fori_loop(0, refine_steps, refine, x)
    return x
