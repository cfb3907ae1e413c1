"""Isolate the LM body's NON-integration cost: time one jitted vmapped
pass of the LM step algebra (normal equations, 13x13 f64 LU solve, gain
ratio, merges) on fake residual/Jacobian data of the headline fit's
shapes, next to the pallas-refined alternative for the same solve.

Answers whether the 0.71 s/iter vs 0.53 s/eval gap in lm_iter_timing is
the damped-normal-equations solve (fixable by routing through the fused
kernel) or the trial-point integration union (intrinsic).

    python -m bench.experiments.lm_algebra_bench
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.linalg import lu as _lu  # noqa: E402
from tpusysbio.linalg import pallas_lu  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_LAB_BATCH", "128"))
R = int(os.environ.get("TPUSYSBIO_LAB_R", "36"))
G = int(os.environ.get("TPUSYSBIO_LAB_G", "13"))
REPEATS = 5


def main():
    rng = np.random.default_rng(0)
    Jb = jnp.asarray(rng.normal(size=(BATCH, R, G)))
    rb = jnp.asarray(rng.normal(size=(BATCH, R)))
    lam = jnp.full((BATCH,), 1e-3)

    def algebra_lu(J, r, lam):
        A = J.T @ J
        g = J.T @ r
        diag = jnp.clip(jnp.diag(A), 1e-12, None)
        M = A + lam * jnp.diag(diag)
        delta = _lu.lu_solve(_lu.lu_factor(M), -g)
        pred = 0.5 * (delta @ (lam * diag * delta - g))
        return delta, pred

    def algebra_pallas(J, r, lam):
        A = J.T @ J
        g = J.T @ r
        diag = jnp.clip(jnp.diag(A), 1e-12, None)
        M = A + lam * jnp.diag(diag)
        fact = pallas_lu.factor_for_solve(M)
        delta = pallas_lu.solve_refined(fact, (-g)[:, None])[:, 0]
        pred = 0.5 * (delta @ (lam * diag * delta - g))
        return delta, pred

    out = {}
    for name, fn in (("lu_f64", algebra_lu), ("pallas", algebra_pallas)):
        run = jax.jit(jax.vmap(fn))
        t0 = time.perf_counter()
        d, p = run(Jb, rb, lam)
        jax.block_until_ready(d)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(run(Jb, rb, lam)[0])
            times.append(time.perf_counter() - t0)
        out[name] = {"warm_s": round(min(times), 4),
                     "compile_s": round(compile_s, 1),
                     "delta0": float(np.asarray(d)[0, 0])}
        print(json.dumps({name: out[name]}), flush=True)
    if abs(out["lu_f64"]["delta0"] - out["pallas"]["delta0"]) > 1e-8:
        print("WARNING: solve mismatch between paths")


if __name__ == "__main__":
    main()
