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
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_EGFR10K_N", "10000"))
TOP_K = int(os.environ.get("TPUSYSBIO_EGFR10K_TOPK", "64"))
# Round-4 defaults ported from the MAPK headline's measured knob wins
# (docs/PERFORMANCE.md "Screen chunking re-tuned"): 1024-chunks with the
# screen fit as ONE un-chunked execution per chunk (ITER_CHUNK=0) beat
# 512-chunks with 3-iter calls — per-call dispatch overhead on the
# remote runtime, not device rate, was the difference. run_chunked now
# also pipelines chunk dispatch against result transfer/checkpointing.
CHUNK = int(os.environ.get("TPUSYSBIO_EGFR10K_CHUNK", "1024"))
ITER_CHUNK = int(os.environ.get("TPUSYSBIO_EGFR10K_ITER_CHUNK", "0"))
SCREEN_ITERS = int(os.environ.get("TPUSYSBIO_EGFR10K_SCREEN_ITERS", "6"))
POLISH_ITERS = int(os.environ.get("TPUSYSBIO_EGFR10K_POLISH_ITERS", "10"))


def main():
    from bench.egfr_bench import build_problem
    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import (make_multistart_runner,
                                          run_chunked)

    proj_tight, theta_true = build_problem()
    # screening: nominal EGFR-97 integration at rtol=1e-3 needs ~130
    # steps; 2x cap for the lockstep union
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=288,
                            linear_solver="pallas", mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 0.5, theta_true + 0.5)
    chunk = CHUNK if CHUNK and N > CHUNK else N
    n_pad = (-N) % chunk
    if n_pad:
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[:1],
                                      (n_pad, starts.shape[1]))])

    screen_cfg = FitConfig(max_iter=SCREEN_ITERS, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=POLISH_ITERS, eval_mode="lockstep")
    screen_run = make_multistart_runner(
        proj_screen.residuals, proj_screen.residuals_and_jacobian,
        screen_cfg, iter_chunk=ITER_CHUNK or None, with_cov=False)
    polish_run = make_multistart_runner(
        proj_tight.residuals, proj_tight.residuals_and_jacobian,
        polish_cfg, iter_chunk=2)

    # warm-up compiles on representative shapes
    t0 = time.perf_counter()
    jax.block_until_ready(screen_run(starts[:chunk]).cost)
    jax.block_until_ready(polish_run(jnp.broadcast_to(
        theta_true, (TOP_K, theta_true.shape[0]))).cost)
    warmup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    screen, _ = run_chunked(screen_run, starts, chunk,
                            trace_len=screen_cfg.max_iter,
                            channels="rank")
    if n_pad:
        screen = jax.tree.map(lambda a: a[:N], screen)
    jax.block_until_ready(screen.cost)
    t1 = time.perf_counter()
    top = screen.ranked().theta[:TOP_K]
    polish = polish_run(jnp.asarray(top))
    jax.block_until_ready(polish.cost)
    t2 = time.perf_counter()

    best = polish.ranked()
    ct = float(jax.jit(proj_tight.cost)(theta_true))
    print(json.dumps({
        "metric": f"EGFR-97 two-phase multi-start ({N} starts -> top "
                  f"{TOP_K} polished at rtol=1e-6), 12 free params",
        "value": round(t2 - t0, 1),
        "unit": "seconds/chip (warm)",
        "detail": {
            "n_starts": N, "top_k": TOP_K, "chunk": chunk,
            "screen_seconds": round(t1 - t0, 1),
            "polish_seconds": round(t2 - t1, 1),
            "warmup_seconds_incl_compile": round(warmup_s, 1),
            "screen_converged": int((np.asarray(screen.status) > 0).sum()),
            "best_cost": float(best.cost[0]),
            "cost_at_truth": ct,
            "quality_ok": bool(best.cost[0] <= ct),
            "starts_per_min_per_chip": round(N / (t2 - t0) * 60.0, 1),
            "v5e8_extrapolated_seconds": round((t1 - t0) / 8 + (t2 - t1),
                                               1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
