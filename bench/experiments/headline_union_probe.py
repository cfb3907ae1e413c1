"""Measure the MAPK-22 headline screen-phase lockstep-union waste.

Twin of ``egfr_union_probe`` for the headline workload
(``bench/headline_bench.py``: 10k LHS starts, screen chunks of 1024 at
rtol=1e-3, cap 192). The EGFR round-5 cap sweep showed the screen step
CAP — not chunk presorting — is the union lever once the theta0 step
distribution is tight; this probe supplies the same decision data for
the headline problem: per-start nsteps at theta0 under a high cap, the
quantiles, and the sorted/random chunk-union ratio at the production
cap.

    python -m bench.experiments.headline_union_probe
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

N = int(os.environ.get("TPUSYSBIO_HLPROBE_N", "10240"))
CHUNK = int(os.environ.get("TPUSYSBIO_HLPROBE_CHUNK", "1024"))
CAP = int(os.environ.get("TPUSYSBIO_HLPROBE_CAP", "512"))
PROD_CAP = int(os.environ.get("TPUSYSBIO_HLPROBE_PROD_CAP", "192"))


def main():
    from bench.fits_bench import build_problem
    from tpusysbio.config import SolverConfig
    from tpusysbio.fit import latin_hypercube

    proj_tight, theta_true = build_problem()
    proj = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=CAP,
                            linear_solver="pallas", mixed_precision=True))

    # identical start cloud to headline_bench (seed 0, +-1.0 log)
    starts = latin_hypercube(jax.random.PRNGKey(0), N,
                             theta_true - 1.0, theta_true + 1.0)

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
        "metric": "MAPK-22 headline screen-phase union probe (rtol=1e-3, "
                  "one integration per start at theta0)",
        "value": round(unions(srt, PROD_CAP) / unions(rand, PROD_CAP), 3),
        "unit": f"sorted/random union ratio at cap {PROD_CAP} "
                "(lower = more headroom for probe-sorted chunking)",
        "detail": {
            "n": N, "chunk": CHUNK, "probe_cap": CAP,
            "wall_seconds_incl_compile": round(wall, 1),
            "ok_members": int((status == 1).sum()),
            f"capped_members_at_{PROD_CAP}":
                int((nsteps >= PROD_CAP).sum()),
            "nsteps_quantiles": q,
            "nsteps_max": int(nsteps.max()),
            "nsteps_mean": round(float(nsteps.mean()), 1),
            "union_random_uncapped": unions(rand),
            "union_sorted_uncapped": unions(srt),
            f"union_random_cap{PROD_CAP}": unions(rand, PROD_CAP),
            f"union_sorted_cap{PROD_CAP}": unions(srt, PROD_CAP),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
