"""Headline workload (BASELINE.json:5): large multi-start fit of a
~20-state stiff model, two-phase.

Phase 1 screens N Latin-hypercube starts with the mixed-precision f32 hot
loop at rtol=1e-3 (cheap basin triage); phase 2 polishes the top TOP_K at
reference accuracy (f64 state, rtol=1e-6). Prints one JSON line with
per-chip wall time and the v5e-8 extrapolation (the starts axis shards
with zero communication — SURVEY.md §3.4).

    python -m bench.headline_bench            # TPU, defaults N=256
    TPUSYSBIO_HEADLINE_N=10000 TPUSYSBIO_HEADLINE_CKPT=/tmp/h.npz \
        python -m bench.headline_supervisor   # unattended 10k with
                                              # auto-restart on faults

Crash robustness: with TPUSYSBIO_HEADLINE_CKPT set, every completed
screening chunk is persisted; a restarted process (the supervisor's
answer to the residual >=1024-member client-wedge instability,
docs/PERFORMANCE.md "TPU runtime hazards") resumes after the last
completed chunk instead of rescreening.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_HEADLINE_N", "256"))
TOP_K = int(os.environ.get("TPUSYSBIO_HEADLINE_TOPK", "16"))
# Iteration chunking bounds single-execution time. The SCREEN fit is an
# un-chunked single execution by default (a b1024 8-iter screen runs
# ~5 s — measured FASTER than two chunked calls, the per-call dispatch
# overhead on the remote runtime being the difference); the POLISH keeps
# bounded ~8 s calls (20 tight iters in one execution would approach the
# runtime's observed per-call comfort zone).
ITER_CHUNK = int(os.environ.get("TPUSYSBIO_HEADLINE_ITER_CHUNK", "0"))
POLISH_ITER_CHUNK = int(os.environ.get(
    "TPUSYSBIO_HEADLINE_POLISH_ITER_CHUNK", "4"))
SOLVER = os.environ.get("TPUSYSBIO_HEADLINE_SOLVER", "pallas")
SCREEN_ITERS = int(os.environ.get("TPUSYSBIO_HEADLINE_SCREEN_ITERS", "8"))
# Screen the N starts in sequential batches of this size (0 = one batch).
# Bounded batches keep per-call time and checkpoint granularity sane;
# 1024 measured fastest (fewer chunk boundaries; the round-2-era
# >=1024-member instability no longer reproduces — big_batch_probe).
SCREEN_CHUNK = int(os.environ.get("TPUSYSBIO_HEADLINE_SCREEN_CHUNK",
                                  "1024"))
POLISH_ITERS = int(os.environ.get("TPUSYSBIO_HEADLINE_POLISH_ITERS", "20"))
# Polish the ranked top_k in cost-sorted sub-batches of this size
# (0 = one batch). Consecutive ranked slices share similar screened
# costs, so each sub-batch's lockstep union is tighter than the full
# batch's (docs/PERFORMANCE.md roadmap #1).
POLISH_SUBBATCH = int(os.environ.get(
    "TPUSYSBIO_HEADLINE_POLISH_SUBBATCH", "0"))
# Screening-chunk checkpoint file ('' = off). See module docstring.
CKPT = os.environ.get("TPUSYSBIO_HEADLINE_CKPT", "")

# The MINPACK-converged cost for THIS exact problem + seed-0 data
# (12-free-param MAPK-22, sigma=2% data noise): scipy.optimize.leastsq
# with the same analytic sensitivities stops at 10.133 (measured round 2,
# docs/PERFORMANCE.md "LM termination semantics"; reproduce with
# bench/experiments/minpack_anchor.py). A large-N run that cannot polish
# to at least this cost has regressed in optimization quality — assert,
# don't narrate (our LM typically descends BELOW it; lower is fine).
MINPACK_ANCHOR_COST = 10.133
ANCHOR_MIN_N = 1024


def main():
    from bench.fits_bench import build_problem
    from tpusysbio.fit.multistart import TwoPhaseDriver

    proj_tight, theta_true = build_problem()
    # Screen step cap: the nominal screening integration needs ~92 steps;
    # a pathological LHS start that cannot finish in MAX_STEPS is flagged
    # and ranked last. Without a cap, ONE hopeless member drags every LM
    # iteration's lockstep union to the full budget (SURVEY.md §7 hard
    # part 1 — the cap is the mitigation, and per the round-5 EGFR cap
    # sweep it is also the unit of later-iteration union waste).
    max_steps = int(os.environ.get("TPUSYSBIO_HEADLINE_MAX_STEPS", "192"))
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=max_steps,
                            linear_solver=SOLVER, mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 1.0, theta_true + 1.0)
    chunk = SCREEN_CHUNK if SCREEN_CHUNK and N > SCREEN_CHUNK else N
    screen_cfg = FitConfig(max_iter=SCREEN_ITERS, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=POLISH_ITERS, eval_mode="lockstep")

    # the library's production two-phase path (fit.multistart
    # TwoPhaseDriver): persistent per-phase runners, same-shape padded
    # screen chunks, atomic per-chunk checkpointing with validated resume
    driver = TwoPhaseDriver(
        (proj_screen.residuals, proj_screen.residuals_and_jacobian),
        (proj_tight.residuals, proj_tight.residuals_and_jacobian),
        screen_cfg, polish_cfg, TOP_K,
        iter_chunk=ITER_CHUNK or None,
        polish_iter_chunk=POLISH_ITER_CHUNK,
        chunk_size=chunk, screen_channels="rank",
        run_tag="headline_mapk22",
        polish_subbatch=POLISH_SUBBATCH or None)

    # ``resume=False`` ignores (and overwrites) any existing checkpoint —
    # the measured pass must do the full work unless this process is a
    # crash-restart (TPUSYSBIO_HEADLINE_RESUME=1, set by the supervisor).
    resume = os.environ.get("TPUSYSBIO_HEADLINE_RESUME") == "1"

    warmup_s = driver.warmup(theta_true)

    # ---- measured pass ------------------------------------------------
    t0 = time.perf_counter()
    polish, screen, info = driver.run(starts, checkpoint_path=CKPT or None,
                                      resume=resume)
    wall = time.perf_counter() - t0
    screen_s, polish_s = info["screen_seconds"], info["polish_seconds"]
    chunks_skipped, n_pad = info["chunks_resumed"], info["n_pad"]
    n_chunks = (N + n_pad) // chunk

    best = polish.ranked()
    best_cost = float(best.cost[0])
    # convergence-profile diagnostic: at which LM iteration did the WINNER
    # reach (within 1e-9 relative) its final cost? If this is well below
    # POLISH_ITERS, the polish budget can shrink (the round-3/4 polish leg
    # is iteration-capped, not convergence-capped — polish_converged ~ 0)
    winner_conv_iter = None
    if polish.cost_trace is not None:
        tr = np.asarray(best.cost_trace[0])
        close = np.flatnonzero(tr <= best_cost * (1 + 1e-9))
        winner_conv_iter = int(close[0]) + 1 if close.size else None
    # the polish batch is the RANKED screen top_k in order, so the
    # winner's row index IS its screen rank — the datum that says how
    # small TOP_K could be without losing the winning basin
    pcost = np.asarray(polish.cost)
    pbad = (np.asarray(polish.status) < 0) | ~np.isfinite(pcost)
    winner_screen_rank = int(np.argmin(np.where(pbad, np.inf, pcost)))
    ok_screen = int((np.asarray(screen.status) > 0).sum())
    ok_polish = int((np.asarray(polish.status) > 0).sum())
    anchored = None
    if N >= ANCHOR_MIN_N and not chunks_skipped:
        anchored = best_cost <= 1.001 * MINPACK_ANCHOR_COST
    # a crash-resumed pass screened only the remaining chunks: rates must
    # reflect the starts actually processed THIS run, not all N — and the
    # headline 'value' is only a full-run wall time when nothing resumed
    screened_now = (n_chunks - chunks_skipped) * chunk
    rate_starts = min(N, screened_now) if chunks_skipped else N
    print(json.dumps({
        "metric": f"two-phase multi-start ({N} starts -> top {TOP_K} "
                  "polished at rtol=1e-6), MAPK-22, 12 free params",
        "value": round(wall, 1),
        "unit": "seconds/chip (warm)",
        "detail": {
            "n_starts": N, "top_k": TOP_K, "n_pad": n_pad,
            "max_steps": max_steps,
            "n_chunks": n_chunks, "chunks_resumed": chunks_skipped,
            "warmup_seconds_incl_compile": round(warmup_s, 1),
            "screen_seconds": round(screen_s, 1),
            "polish_seconds": round(polish_s, 1),
            "screen_converged": ok_screen,
            "polish_converged": ok_polish,
            "winner_converged_at_iter": winner_conv_iter,
            "winner_screen_rank": winner_screen_rank,
            "polish_subbatch": POLISH_SUBBATCH or None,
            "best_cost": best_cost,
            "minpack_anchor_cost": MINPACK_ANCHOR_COST,
            "anchor_ok": anchored,
            "cost_at_truth": float(jax.jit(proj_tight.cost)(theta_true)),
            "partial_resume": bool(chunks_skipped),
            "starts_per_min_per_chip": round(
                rate_starts / wall * 60.0, 1),
            "v5e8_extrapolated_starts_per_min": round(
                8 * rate_starts / wall * 60.0, 1),
            "backend": jax.default_backend(),
        },
    }))
    if anchored is False:
        raise SystemExit(
            f"optimization-quality regression: best polished cost "
            f"{best_cost} > MINPACK anchor {MINPACK_ANCHOR_COST}")


if __name__ == "__main__":
    main()
