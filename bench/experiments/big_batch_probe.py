"""Probe the residual >=1024-member single-execution instability
(docs/PERFORMANCE.md "TPU runtime hazards"): run the screening fit as ONE
un-chunked device execution at b1024 (and b2048 if clean), twice each,
plus a device-health check afterwards. Round 2 observed faults that wedge
the TPU client in exactly this shape; this probe re-tests it after the
round-3 kernel and runner changes.

    python -m bench.experiments.big_batch_probe
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCHES = tuple(int(b) for b in os.environ.get(
    "TPUSYSBIO_PROBE_BATCHES", "1024,2048").split(","))


def main():
    import dataclasses

    from bench.fits_bench import build_problem
    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import make_multistart_runner

    proj_tight, theta_true = build_problem()
    proj = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=192,
                            linear_solver="pallas", mixed_precision=True))
    cfg = FitConfig(max_iter=8, eval_mode="lockstep", ftol=1e-4, xtol=1e-4)
    # iter_chunk=None: the whole 8-iteration fit is ONE device execution
    run = make_multistart_runner(proj.residuals,
                                 proj.residuals_and_jacobian, cfg)

    for b in BATCHES:
        starts = latin_hypercube(jax.random.PRNGKey(0), b,
                                 theta_true - 1.0, theta_true + 1.0)
        t0 = time.perf_counter()
        out = run(starts)
        jax.block_until_ready(out.cost)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(starts)
        jax.block_until_ready(out.cost)
        warm = time.perf_counter() - t0
        # device-health check: a fresh tiny computation must still work
        health = float(jnp.sum(jnp.ones((8, 8))).block_until_ready())
        print(json.dumps({
            "batch": b, "first_s": round(first, 1),
            "warm_s": round(warm, 2),
            "best_cost": float(np.asarray(out.cost).min()),
            "finite": int(np.isfinite(np.asarray(out.cost)).sum()),
            "client_healthy": health == 64.0,
        }), flush=True)


if __name__ == "__main__":
    main()
