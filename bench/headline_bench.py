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
import jax.numpy as jnp  # noqa: E402

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
    from tpusysbio.fit.multistart import (make_multistart_runner,
                                          run_chunked)

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
    # pad to a chunk multiple (clones of start 0; sliced off after): every
    # screening execution then has the SAME shape — one compilation, and
    # no odd-size remainder chunk paying a fresh multi-minute compile
    chunk = SCREEN_CHUNK if SCREEN_CHUNK and N > SCREEN_CHUNK else N
    n_pad = (-N) % chunk
    if n_pad:
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[:1],
                                      (n_pad, starts.shape[1]))])
    screen_cfg = FitConfig(max_iter=SCREEN_ITERS, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=POLISH_ITERS, eval_mode="lockstep")

    # persistent runners: compile once, reuse (production shape)
    # with_cov=False: screening triages non-converged members — their
    # covariance is meaningless, XLA DCEs its math, and the per-chunk
    # flush stops transferring it over the (slow) remote tunnel
    screen_run = make_multistart_runner(
        proj_screen.residuals, proj_screen.residuals_and_jacobian,
        screen_cfg, iter_chunk=ITER_CHUNK, with_cov=False)
    polish_run = make_multistart_runner(
        proj_tight.residuals, proj_tight.residuals_and_jacobian,
        polish_cfg, iter_chunk=POLISH_ITER_CHUNK)

    n_chunks = starts.shape[0] // chunk

    def screen_all(resume: bool):
        """Screen all chunks via the library's chunked checkpoint path
        (fit.multistart.run_chunked: atomic per-chunk persist, validated
        resume). ``resume=False`` ignores (and overwrites) any existing
        checkpoint — the measured pass must do the full work unless this
        process is a crash-restart (TPUSYSBIO_HEADLINE_RESUME=1, set by
        the supervisor)."""
        res, done = run_chunked(screen_run, starts, chunk,
                                checkpoint_path=CKPT or None,
                                resume=resume,
                                trace_len=screen_cfg.max_iter,
                                channels="rank")
        if n_pad:  # drop pad clones before ranking
            res = jax.tree.map(lambda a: a[:N], res)
        return res, done

    resume = os.environ.get("TPUSYSBIO_HEADLINE_RESUME") == "1"

    # ---- warm-up: compile both jits on representative shapes ----------
    t0 = time.perf_counter()
    jax.block_until_ready(screen_run(starts[:chunk]).cost)
    jax.block_until_ready(polish_run(
        jnp.broadcast_to(theta_true, (TOP_K, theta_true.shape[0]))).cost)
    warmup_s = time.perf_counter() - t0

    # ---- measured pass ------------------------------------------------
    t0 = time.perf_counter()
    screen, chunks_skipped = screen_all(resume)
    jax.block_until_ready(screen.cost)
    t1 = time.perf_counter()
    top = screen.ranked().theta[:TOP_K]
    polish = polish_run(jnp.asarray(top))
    jax.block_until_ready(polish.cost)
    t2 = time.perf_counter()
    wall, screen_s, polish_s = t2 - t0, t1 - t0, t2 - t1

    best = polish.ranked()
    best_cost = float(best.cost[0])
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
            "n_chunks": n_chunks, "chunks_resumed": chunks_skipped,
            "warmup_seconds_incl_compile": round(warmup_s, 1),
            "screen_seconds": round(screen_s, 1),
            "polish_seconds": round(polish_s, 1),
            "screen_converged": ok_screen,
            "polish_converged": ok_polish,
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
