"""Profile ONE lockstep LM iteration's dominant cost: the vmapped
residuals_and_jacobian evaluation, at (a) the LHS ±1.0 start cloud the
fits bench uses and (b) a mild 0.1 spread around truth (the engine-bench
regime) — separating the lockstep-union tax (max_steps-capped pathological
members) from any fit-path assembly overhead.

    python -m bench.experiments.fit_iter_profile
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_FIP_BATCH", "128"))


def main():
    from bench.fits_bench import build_problem
    from tpusysbio.fit import latin_hypercube

    proj, theta_true = build_problem()

    eval_jac = jax.jit(jax.vmap(
        lambda th: proj.evaluate(th, with_jac=True)))

    starts = latin_hypercube(jax.random.PRNGKey(0), BATCH,
                             theta_true - 1.0, theta_true + 1.0)
    rng = np.random.default_rng(0)
    mild = theta_true[None, :] + jnp.asarray(
        rng.normal(scale=0.1, size=(BATCH, theta_true.shape[0])))

    rows = []
    for name, ths in (("lhs_pm1", starts), ("mild_0.1", mild)):
        t0 = time.perf_counter()
        ev = eval_jac(ths)
        jax.block_until_ready(ev.cost)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ev = eval_jac(ths)
        jax.block_until_ready(ev.cost)
        warm = time.perf_counter() - t0
        ns = np.asarray(ev.nsteps).ravel()
        st = np.asarray(ev.status).ravel()
        rows.append({
            "cloud": name, "batch": BATCH,
            "warm_seconds": round(warm, 3),
            "first_seconds": round(first, 1),
            "eff_int_per_s": round(BATCH / warm, 1),
            "nsteps_mean": float(ns.mean()), "nsteps_max": int(ns.max()),
            "nsteps_p90": float(np.percentile(ns, 90)),
            "n_maxed": int((ns >= proj.config.max_steps).sum()),
            "status_ok": int((st == 1).sum()),
        })
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
