"""Measured multi-device scaling on the fake CPU mesh (VERDICT r4 #4).

The v5e-8 numbers in README/PERFORMANCE are single-chip × 8 — an
*extrapolation* that assumes zero sharding cost. This script replaces
the assumption with a measurement: the headline-shaped screen program
(MAPK-22, pallas solver path, lockstep LM) runs over n ∈ {1, 2, 4, 8}
virtual CPU devices with the SAME total batch. On a host where the
virtual devices serialize onto the physical cores, the ideal sharded
wall-clock equals the unsharded one — anything above it is the cost the
×8 extrapolation ignores (shard_map partitioning, inter-device
collectives, per-device dispatch).

    serialized efficiency(n) = T(1 device) / T(n devices)

≥ 0.9 at n=8 means the extrapolation overstates throughput by < 11%
from sharding overhead (ICI latency on real chips is additional but the
collective volume here is a few scalars per fit — see the JSON's
"collective_note").

Usage (env is set internally; run from the repo root):

    python bench/experiments/mesh_scaling.py [--batch 64] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402
from tpusysbio.fit.multistart import make_multistart_runner  # noqa: E402


def measure(n_devices: int, batch: int, iters: int, repeats: int = 3):
    import dataclasses

    from bench.fits_bench import build_problem

    proj, theta_true = build_problem()
    # interpret-mode pallas is pointlessly slow on CPU; the scaling
    # question (shard_map overhead) is solver-agnostic
    proj = dataclasses.replace(
        proj, config=dataclasses.replace(proj.config, linear_solver="lu",
                                         max_steps=384))
    mesh = (None if n_devices == 1 else
            Mesh(np.array(jax.devices()[:n_devices]), ("starts",)))
    run = make_multistart_runner(
        proj.residuals, proj.residuals_and_jacobian,
        FitConfig(max_iter=iters, eval_mode="lockstep",
                  ftol=1e-10, xtol=1e-10),
        mesh=mesh, with_cov=False)
    starts = latin_hypercube(jax.random.PRNGKey(0), batch,
                             theta_true - 1.0, theta_true + 1.0)
    out = run(starts)                      # compile + warm
    jax.block_until_ready(out.cost)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(starts).cost)
        times.append(time.perf_counter() - t0)
    cost = np.asarray(out.cost)
    return min(times), float(np.nanmin(np.where(np.isfinite(cost),
                                                cost, np.nan)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ns = ap.parse_args(argv)

    rows = []
    t1 = None
    best0 = None
    for n in (1, 2, 4, 8):
        t, best = measure(n, ns.batch, ns.iters)
        if t1 is None:
            t1, best0 = t, best
        rows.append({"n_devices": n, "wall_s": round(t, 3),
                     "serialized_efficiency": round(t1 / t, 3),
                     "best_cost": best})
        print(json.dumps(rows[-1]), flush=True)
        if best0 is not None and abs(best - best0) > 1e-6 * max(1.0, abs(best0)):
            print(json.dumps({"warning": "sharded best cost deviates",
                              "n": n}), flush=True)
    print(json.dumps({
        "metric": "fake-mesh serialized scaling (lockstep LM screen, "
                  f"MAPK-22, b{ns.batch}, {ns.iters} iters)",
        "rows": rows,
        "collective_note": "per-iteration collectives are O(1) scalars "
                           "per member (status/cost reductions happen "
                           "host-side after the run); the starts axis "
                           "is embarrassingly parallel by construction",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
