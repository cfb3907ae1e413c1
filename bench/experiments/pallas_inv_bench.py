"""Micro-benchmark: batched Pallas Gauss-Jordan inverse vs pure-JAX LU
inverse on the Newton-matrix workload shape (B=128, n=22), then the
end-to-end MAPK-22+sens BDF rows with linear_solver='pallas'.

Usage: python bench/experiments/pallas_inv_bench.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.linalg import lu as _lu  # noqa: E402
from tpusysbio.linalg import pallas_lu  # noqa: E402


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    rng = np.random.default_rng(0)
    B, n = 128, 22
    # Newton-like matrices: I - c J with random J
    J = rng.normal(size=(B, n, n))
    A64 = jnp.asarray(np.eye(n)[None] - 0.01 * J)
    A32 = A64.astype(jnp.float32)

    old64 = jax.jit(jax.vmap(_lu.lu_inverse))
    new64 = jax.jit(jax.vmap(pallas_lu.inverse))
    old32 = jax.jit(jax.vmap(lambda a: _lu.lu_inverse(a)))
    new32 = jax.jit(jax.vmap(lambda a: pallas_lu.inverse(a)))

    for name, fn, A in [("jaxlu f64", old64, A64),
                        ("pallas f64", new64, A64),
                        ("jaxlu f32", old32, A32),
                        ("pallas f32", new32, A32)]:
        t, X = timeit(fn, A)
        err = float(jnp.max(jnp.abs(
            jnp.einsum("bij,bjk->bik", A, X)
            - jnp.eye(n, dtype=A.dtype))))
        print(json.dumps({"op": name, "best_us": round(t * 1e6, 1),
                          "resid": err}), flush=True)

    # end-to-end: MAPK tight + screen with the pallas factor
    from tpusysbio.config import SolverConfig
    from tpusysbio.model import library
    from bench.experiments.r2_ablate import bench

    mapk = library.mapk_huang_ferrell()
    p = library.mapk_true_params()
    tight = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                         linear_solver="pallas", sens_precision="f32")
    screen = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                          linear_solver="pallas", sens_precision="f32")
    bench("P1 mapk tight pallas b128", mapk, p, 100.0, tight, 128)
    bench("P2 mapk screen pallas b128", mapk, p, 100.0, screen, 128)
    bench("P3 mapk screen pallas b256", mapk, p, 100.0, screen, 256)


if __name__ == "__main__":
    main()
