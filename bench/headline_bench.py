"""Headline workload (BASELINE.json:5): large multi-start fit of a
~20-state stiff model, two-phase.

Phase 1 screens N Latin-hypercube starts with the mixed-precision f32 hot
loop at rtol=1e-3 (cheap basin triage); phase 2 polishes the top TOP_K at
reference accuracy (f64 state, rtol=1e-6). Prints one JSON line with
per-chip wall time and the v5e-8 extrapolation (the starts axis shards
with zero communication — SURVEY.md §3.4).

    python -m bench.headline_bench            # TPU, defaults N=256
    TPUSYSBIO_HEADLINE_N=1024 python -m bench.headline_bench
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402
from tpusysbio.fit.multistart import multistart_two_phase  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_HEADLINE_N", "256"))
TOP_K = int(os.environ.get("TPUSYSBIO_HEADLINE_TOPK", "16"))
ITER_CHUNK = int(os.environ.get("TPUSYSBIO_HEADLINE_ITER_CHUNK", "4"))


def main():
    from bench.fits_bench import build_problem

    proj_tight, theta_true = build_problem()
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                            linear_solver="inv32", mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 1.0, theta_true + 1.0)
    screen_cfg = FitConfig(max_iter=12, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=20, eval_mode="lockstep")

    t0 = time.perf_counter()
    polish, screen = multistart_two_phase(
        (proj_screen.residuals, proj_screen.residuals_and_jacobian),
        (proj_tight.residuals, proj_tight.residuals_and_jacobian),
        starts, screen_cfg, polish_cfg, top_k=TOP_K,
        iter_chunk=ITER_CHUNK)
    jax.block_until_ready(polish.cost)
    wall = time.perf_counter() - t0

    best = polish.ranked()
    ok_screen = int((np.asarray(screen.status) > 0).sum())
    ok_polish = int((np.asarray(polish.status) > 0).sum())
    print(json.dumps({
        "metric": f"two-phase multi-start ({N} starts -> top {TOP_K} "
                  "polished at rtol=1e-6), MAPK-22, 12 free params",
        "value": round(wall, 1),
        "unit": "seconds/chip (incl. compile on first run)",
        "detail": {
            "n_starts": N, "top_k": TOP_K,
            "screen_converged": ok_screen,
            "polish_converged": ok_polish,
            "best_cost": float(best.cost[0]),
            "starts_per_min_per_chip": round(N / wall * 60.0, 1),
            "v5e8_extrapolated_starts_per_min": round(
                8 * N / wall * 60.0, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
