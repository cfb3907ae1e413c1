"""Measure the EGFR-97 screen-phase lockstep-union waste directly.

The 10k two-phase EGFR run screens 512-start chunks in lockstep: every
LM iteration's integration costs the CHUNK-MAX step count, so members
needing few steps pay for the chunk's worst member. This probe
integrates every start once at the screen config (rtol=1e-3) with a
high cap, records per-member ``nsteps``, and reports:

- the step-count distribution (quantiles, fraction at/over the 192 cap);
- mean per-chunk union for the PRODUCTION chunking (LHS order = random)
  vs the same starts sorted by nsteps — the upper bound on what
  probe-sorted chunking can save;
- the same comparison under the production cap (union clipped at 192).

    python -m bench.experiments.egfr_union_probe
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_EGFRPROBE_N", "10240"))
CHUNK = int(os.environ.get("TPUSYSBIO_EGFRPROBE_CHUNK", "512"))
CAP = int(os.environ.get("TPUSYSBIO_EGFRPROBE_CAP", "512"))


def main():
    from bench.egfr_bench import build_problem
    from tpusysbio.config import SolverConfig
    from tpusysbio.fit import latin_hypercube

    proj_tight, theta_true = build_problem()
    proj = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=CAP,
                            linear_solver="pallas", mixed_precision=True))

    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 0.5, theta_true + 0.5)

    def probe_one(th):
        ev = proj.evaluate(th, with_jac=False)
        return ev.status, ev.nsteps

    run = jax.jit(jax.vmap(probe_one))

    t0 = time.perf_counter()
    chunks = [run(starts[i:i + CHUNK]) for i in range(0, N, CHUNK)]
    outs = [(np.asarray(s), np.asarray(n)) for s, n in chunks]
    wall = time.perf_counter() - t0
    status = np.concatenate([o[0] for o in outs])
    nsteps = np.concatenate([o[1] for o in outs]).astype(np.int64)

    def unions(order, cap=None):
        ns = nsteps[order]
        if cap is not None:
            ns = np.minimum(ns, cap)
        u = ns.reshape(-1, CHUNK).max(axis=1)
        return float(u.mean())

    rand = np.arange(N)
    srt = np.argsort(nsteps, kind="stable")
    q = {f"p{p}": int(np.percentile(nsteps, p))
         for p in (5, 25, 50, 75, 95, 99)}
    rec = {
        "metric": "EGFR-97 screen-phase union probe (rtol=1e-3, one "
                  "integration per start at theta0)",
        "value": round(unions(srt, 192) / unions(rand, 192), 3),
        "unit": "sorted/random union ratio at cap 192 (lower = more "
                "headroom for probe-sorted chunking)",
        "detail": {
            "n": N, "chunk": CHUNK, "probe_cap": CAP,
            "wall_seconds_incl_compile": round(wall, 1),
            "ok_members": int((status == 1).sum()),
            "capped_members_at_192": int((nsteps >= 192).sum()),
            "nsteps_quantiles": q,
            "nsteps_mean": round(float(nsteps.mean()), 1),
            "union_random_uncapped": unions(rand),
            "union_sorted_uncapped": unions(srt),
            "union_random_cap192": unions(rand, 192),
            "union_sorted_cap192": unions(srt, 192),
            "union_random_cap160": unions(rand, 160),
            "union_sorted_cap160": unions(srt, 160),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
