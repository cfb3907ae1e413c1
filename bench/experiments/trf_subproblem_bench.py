"""TRF subproblem bake-off (VERDICT round-2 #10): damped normal
equations (incumbent) vs the reference's SVD route
(scipy/optimize/_lsq/common.py:57; f32 SVD + f64 refinement) on the
JAK-STAT bounded ensemble fit, vmapped batch, one TPU chip.

Usage: python bench/experiments/trf_subproblem_bench.py   (no PYTHONPATH)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.data import Experiment, ExperimentBatch, Measurement  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.optim import trf_fit  # noqa: E402
from tpusysbio.project import ParameterMap, Project  # noqa: E402

BATCH = 64
MAX_ITER = 25


def build():
    """The JAK-STAT two-dose bounded ensemble (config 4) — exactly the
    example problem (examples/jakstat_ensemble.py build_project)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "jakstat_ensemble", "/root/repo/examples/jakstat_ensemble.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    proj, pmap, theta_true, _ = mod.build_project()
    import dataclasses
    proj = dataclasses.replace(
        proj, config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=512,
                                  linear_solver="inv32",
                                  sens_precision="f32"))
    return proj, theta_true


def main():
    proj, theta_true = build()
    G = theta_true.shape[0]
    lb = theta_true - 2.0
    ub = theta_true + 2.0
    starts = latin_hypercube(jax.random.PRNGKey(1), BATCH,
                             theta_true - 0.8, theta_true + 0.8)
    cfg = FitConfig(max_iter=MAX_ITER)

    results = {}
    for mode in ("normal", "svd"):
        run = jax.jit(jax.vmap(lambda th: trf_fit(
            proj.residuals, proj.residuals_and_jacobian, th, lb, ub, cfg,
            subproblem=mode)))
        t0 = time.perf_counter()
        out = run(starts)
        jax.block_until_ready(out.cost)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(starts)
        jax.block_until_ready(out.cost)
        warm = time.perf_counter() - t0
        cost = np.asarray(out.cost)
        status = np.asarray(out.status)
        results[mode] = {
            "warm_seconds": round(warm, 2),
            "cold_seconds": round(cold, 1),
            "fits_per_min": round(BATCH / warm * 60.0, 1),
            "converged": int((status > 0).sum()),
            "best_cost": float(np.nanmin(np.where(status >= 0, cost,
                                                  np.nan))),
            "median_cost": float(np.nanmedian(cost)),
        }
        print(json.dumps({mode: results[mode]}), flush=True)
    print(json.dumps({"batch": BATCH, "n_theta": G,
                      "backend": jax.default_backend(),
                      "results": results}))


if __name__ == "__main__":
    main()
