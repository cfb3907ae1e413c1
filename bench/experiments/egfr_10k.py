"""Config 5 at its literal scale (BASELINE.json:11): a 10k-member
multi-start fit of the ~100-state EGFR network, two-phase, one chip.

Same production shape as the MAPK headline: screen all N starts with the
mixed-precision f32 hot loop at rtol=1e-3 (512-chunks through the
library's checkpointing runner, rank channels only), polish the top K at
reference accuracy. Multiply by chips for pod throughput — the starts
axis shards with zero communication.

    TPUSYSBIO_EGFR10K_N=10000 python -m bench.experiments.egfr_10k
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_EGFR10K_N", "10000"))
TOP_K = int(os.environ.get("TPUSYSBIO_EGFR10K_TOPK", "64"))
# Round-4 measured knobs (each swept in isolation on the chip; see
# docs/PERFORMANCE.md "EGFR 10k round-4 sweep"): unlike the MAPK
# headline, EGFR-97 is COMPUTE-bound, so narrower 512-chunks beat 1024
# (tighter lockstep unions outweigh the extra dispatches: 370.4 -> 325.3
# s), the 192-step screen cap beats 288 (the cap is the union's unit of
# work; best polished cost bit-identical: 325.3 -> 254.0 s), and 5
# screen iterations beat 6 (254.0 -> 218.9 s with the winner basin still
# ranked first and the anchor-style quality gate green).
CHUNK = int(os.environ.get("TPUSYSBIO_EGFR10K_CHUNK", "512"))
ITER_CHUNK = int(os.environ.get("TPUSYSBIO_EGFR10K_ITER_CHUNK", "0"))
SCREEN_ITERS = int(os.environ.get("TPUSYSBIO_EGFR10K_SCREEN_ITERS", "5"))
POLISH_ITERS = int(os.environ.get("TPUSYSBIO_EGFR10K_POLISH_ITERS", "10"))
# Screening step cap: the lockstep union cost per LM iteration is the max
# step count across the chunk, so this cap IS the screen-phase unit of
# work. Members that genuinely need more steps get a penalized cost and
# rank last — exactly what a screening phase wants (the basin winners are
# the well-conditioned members). Round-5 sweep (docs/PERFORMANCE.md
# "EGFR cap sweep"): the union probe measured the θ0 step distribution
# at 111-128 (p5-max), so the cap only pays for LATER-iteration trial
# spikes; 192 → 160 → 144 → 136 gave 218.9 → 193.9 → 183.8 → 178.7 s
# with the polished winner bit-identical (46.0791) and the quality gate
# green at every notch. 136 = the measured keeper (margin over the 128
# max observed at θ0).
MAX_STEPS = int(os.environ.get("TPUSYSBIO_EGFR10K_MAX_STEPS", "136"))
# cost-sorted polish sub-batches (TwoPhaseDriver polish_subbatch): 0 = off
POLISH_SUBBATCH = int(os.environ.get("TPUSYSBIO_EGFR10K_POLISH_SUBBATCH",
                                     "0"))


def main():
    from bench.egfr_bench import build_problem
    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import TwoPhaseDriver

    proj_tight, theta_true = build_problem()
    # screening: nominal EGFR-97 integration at rtol=1e-3 needs ~130
    # steps; 2x cap for the lockstep union
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=MAX_STEPS,
                            linear_solver="pallas", mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 0.5, theta_true + 0.5)
    chunk = CHUNK if CHUNK and N > CHUNK else N

    screen_cfg = FitConfig(max_iter=SCREEN_ITERS, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=POLISH_ITERS, eval_mode="lockstep")
    # the library's production two-phase path: chunked screening with
    # host-resident rank channels (no full-result device re-upload),
    # pipelined chunk dispatch, cost-sorted ranked polish
    driver = TwoPhaseDriver(
        (proj_screen.residuals, proj_screen.residuals_and_jacobian),
        (proj_tight.residuals, proj_tight.residuals_and_jacobian),
        screen_cfg, polish_cfg, TOP_K,
        iter_chunk=ITER_CHUNK or None, polish_iter_chunk=2,
        chunk_size=chunk, screen_channels="rank", run_tag="egfr10k",
        polish_subbatch=POLISH_SUBBATCH or None)

    warmup_s = driver.warmup(theta_true)

    t0 = time.perf_counter()
    polish, screen, info = driver.run(starts)
    wall = time.perf_counter() - t0
    t_screen, t_polish = info["screen_seconds"], info["polish_seconds"]

    best = polish.ranked()
    ct = float(jax.jit(proj_tight.cost)(theta_true))
    print(json.dumps({
        "metric": f"EGFR-97 two-phase multi-start ({N} starts -> top "
                  f"{TOP_K} polished at rtol=1e-6), 12 free params",
        "value": round(wall, 1),
        "unit": "seconds/chip (warm)",
        "detail": {
            "n_starts": N, "top_k": TOP_K, "chunk": chunk,
            "screen_iters": SCREEN_ITERS, "max_steps": MAX_STEPS,
            "n_pad": info["n_pad"],
            "screen_seconds": round(t_screen, 1),
            "polish_seconds": round(t_polish, 1),
            "warmup_seconds_incl_compile": round(warmup_s, 1),
            "screen_converged": int((np.asarray(screen.status) > 0).sum()),
            "best_cost": float(best.cost[0]),
            "cost_at_truth": ct,
            "quality_ok": bool(best.cost[0] <= ct),
            "starts_per_min_per_chip": round(N / wall * 60.0, 1),
            "v5e8_extrapolated_seconds": round(t_screen / 8 + t_polish, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
