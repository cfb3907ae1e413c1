"""Polish-leg tuning for the 10k headline (docs/PERFORMANCE.md roadmap #1).

Reuses a completed screening checkpoint (the expensive 10k screen) to
measure ONLY the polish phase under different knob settings:

    TPUSYSBIO_POLISH_CKPT=/tmp/h4/screen.npz \
    TPUSYSBIO_POLISH_TOPK=256 TPUSYSBIO_POLISH_SUBBATCH=64 \
    TPUSYSBIO_POLISH_ITER_CHUNK=0 TPUSYSBIO_POLISH_ITERS=20 \
        python bench/experiments/polish_tune.py

Knob space (round-4 hypotheses):
  - POLISH_ITER_CHUNK=0 (single 20-iter execution) removes the per-chunk
    host round-trips entirely; 4 removes them via the lagged done-check.
  - SUBBATCH groups ranked members of similar screened cost, tightening
    each sub-batch's lockstep union (one slow member taxes sb-1 peers).
  - ITERS: the budget is iteration-capped, not convergence-capped
    (polish_converged ~ 2/256); the winner's cost trace says how small
    the budget can be while the MINPACK anchor still holds.

Prints one JSON line: polish wall seconds (warm), best cost, anchor check,
winner trace tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CKPT = os.environ.get("TPUSYSBIO_POLISH_CKPT", "/tmp/h4/screen.npz")
N = int(os.environ.get("TPUSYSBIO_POLISH_N", "10000"))
TOP_K = int(os.environ.get("TPUSYSBIO_POLISH_TOPK", "256"))
SUBBATCH = int(os.environ.get("TPUSYSBIO_POLISH_SUBBATCH", "0"))
ITER_CHUNK = int(os.environ.get("TPUSYSBIO_POLISH_ITER_CHUNK", "4"))
ITERS = int(os.environ.get("TPUSYSBIO_POLISH_ITERS", "20"))
MINPACK_ANCHOR_COST = 10.133


def main():
    from bench.fits_bench import build_problem
    from tpusysbio.config import FitConfig
    from tpusysbio.fit.multistart import (MultistartResult,
                                          make_multistart_runner)

    ck = np.load(CKPT)
    screen = MultistartResult(
        theta=jnp.asarray(ck["theta"][:N]), cost=jnp.asarray(ck["cost"][:N]),
        grad_norm=jnp.asarray(ck["grad_norm"][:N]),
        status=jnp.asarray(ck["status"][:N]),
        n_iter=jnp.asarray(ck["n_iter"][:N]),
        theta0=jnp.asarray(ck["theta"][:N]))
    top = jnp.asarray(screen.ranked().theta[:TOP_K])

    proj_tight, theta_true = build_problem()
    cfg = FitConfig(max_iter=ITERS, eval_mode="lockstep")
    run = make_multistart_runner(proj_tight.residuals,
                                 proj_tight.residuals_and_jacobian,
                                 cfg, iter_chunk=ITER_CHUNK or None)
    sb = SUBBATCH if SUBBATCH and SUBBATCH < TOP_K else TOP_K

    def polish(batch):
        if sb >= TOP_K:
            return run(batch)
        frs = [run(batch[i:i + sb]) for i in range(0, TOP_K, sb)]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *frs)

    # warmup on the production shape
    t0 = time.perf_counter()
    warm = polish(jnp.broadcast_to(theta_true, (TOP_K, top.shape[1])))
    jax.block_until_ready(warm.cost)
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = polish(top)
    jax.block_until_ready(res.cost)
    wall = time.perf_counter() - t0

    best = res.ranked()
    best_cost = float(best.cost[0])
    trace = np.asarray(best.cost_trace[0])
    # at which iteration does the winner first beat the MINPACK anchor?
    under = np.flatnonzero(trace <= 1.001 * MINPACK_ANCHOR_COST)
    anchor_iter = int(under[0]) + 1 if under.size else None
    print(json.dumps({
        "metric": "polish leg seconds (warm)",
        "value": round(wall, 1),
        "detail": {
            "top_k": TOP_K, "subbatch": SUBBATCH or None,
            "iter_chunk": ITER_CHUNK or None, "iters": ITERS,
            "warmup_s": round(warm_s, 1),
            "best_cost": best_cost,
            "anchor_ok": bool(best_cost <= 1.001 * MINPACK_ANCHOR_COST),
            "winner_anchor_iter": anchor_iter,
            "winner_trace": [round(float(x), 6) for x in trace],
            "polish_converged": int((np.asarray(res.status) > 0).sum()),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
