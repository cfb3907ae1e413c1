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
SOLVER = os.environ.get("TPUSYSBIO_HEADLINE_SOLVER", "inv32")
SCREEN_ITERS = int(os.environ.get("TPUSYSBIO_HEADLINE_SCREEN_ITERS", "8"))
# Screen the N starts in sequential batches of this size (0 = one batch).
# Bounded batches keep each device execution small and sidestep a runtime
# instability observed for single >=1024-member fit executions.
SCREEN_CHUNK = int(os.environ.get("TPUSYSBIO_HEADLINE_SCREEN_CHUNK", "512"))
POLISH_ITERS = int(os.environ.get("TPUSYSBIO_HEADLINE_POLISH_ITERS", "20"))


def main():
    from bench.fits_bench import build_problem

    proj_tight, theta_true = build_problem()
    # max_steps=192: the nominal screening integration needs ~92 steps;
    # a pathological LHS start that cannot finish in 2x that is flagged
    # MAX_STEPS and ranked last. Without the cap, ONE hopeless member
    # drags every LM iteration's lockstep union to the full budget
    # (SURVEY.md §7 hard part 1 — the cap is the mitigation).
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=192,
                            linear_solver=SOLVER, mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 1.0, theta_true + 1.0)
    screen_cfg = FitConfig(max_iter=SCREEN_ITERS, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=POLISH_ITERS, eval_mode="lockstep")

    from tpusysbio.fit.multistart import make_multistart_runner

    # persistent runners: compile once, reuse (production shape)
    screen_run = make_multistart_runner(
        proj_screen.residuals, proj_screen.residuals_and_jacobian,
        screen_cfg, iter_chunk=ITER_CHUNK)
    polish_run = make_multistart_runner(
        proj_tight.residuals, proj_tight.residuals_and_jacobian,
        polish_cfg, iter_chunk=ITER_CHUNK)

    def screen_all(starts):
        if not SCREEN_CHUNK or starts.shape[0] <= SCREEN_CHUNK:
            return screen_run(starts)
        parts = [screen_run(starts[i:i + SCREEN_CHUNK])
                 for i in range(0, starts.shape[0], SCREEN_CHUNK)]
        import jax as _jax
        return _jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def run():
        t0 = time.perf_counter()
        screen = screen_all(starts)
        jax.block_until_ready(screen.cost)
        t1 = time.perf_counter()
        top = screen.ranked().theta[:TOP_K]
        polish = polish_run(jnp.asarray(top))
        jax.block_until_ready(polish.cost)
        t2 = time.perf_counter()
        return (t2 - t0, t1 - t0, t2 - t1), polish, screen

    (cold, _, _), polish, screen = run()   # includes all compiles
    (wall, screen_s, polish_s), polish, screen = run()  # warm

    best = polish.ranked()
    ok_screen = int((np.asarray(screen.status) > 0).sum())
    ok_polish = int((np.asarray(polish.status) > 0).sum())
    print(json.dumps({
        "metric": f"two-phase multi-start ({N} starts -> top {TOP_K} "
                  "polished at rtol=1e-6), MAPK-22, 12 free params",
        "value": round(wall, 1),
        "unit": "seconds/chip (warm)",
        "detail": {
            "n_starts": N, "top_k": TOP_K,
            "cold_seconds_incl_compile": round(cold, 1),
            "screen_seconds": round(screen_s, 1),
            "polish_seconds": round(polish_s, 1),
            "screen_converged": ok_screen,
            "polish_converged": ok_polish,
            "best_cost": float(best.cost[0]),
            "cost_at_truth": float(jax.jit(proj_tight.cost)(theta_true)),
            "starts_per_min_per_chip": round(N / wall * 60.0, 1),
            "v5e8_extrapolated_starts_per_min": round(
                8 * N / wall * 60.0, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
