"""Per-iteration wall-clock of the vmapped lockstep LM fit.

The fit_iter_profile experiment showed ONE vmapped residuals+jacobian
evaluation at the LHS start cloud costs 0.53 s (b128), yet the fits bench
spends 4.6 s per LM iteration — this script advances the real LM state one
iteration per device call (traced cap: a single compilation) and times
each, then separately evaluates nsteps at each iteration's accepted thetas
to see whether mid-fit trial points drag the lockstep union.

    python -m bench.experiments.lm_iter_timing
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_LIT_BATCH", "128"))
MAX_ITER = int(os.environ.get("TPUSYSBIO_LIT_MAXITER", "20"))


def main():
    from bench.fits_bench import build_problem
    from tpusysbio.config import FitConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.optim.lm import lm_init, lm_run

    proj, theta_true = build_problem()
    cfg = FitConfig(max_iter=MAX_ITER, eval_mode="lockstep")
    starts = latin_hypercube(jax.random.PRNGKey(0), BATCH,
                             theta_true - 1.0, theta_true + 1.0)

    init = jax.jit(jax.vmap(
        lambda th: lm_init(proj.residuals_and_jacobian, th, cfg)))
    step = jax.jit(jax.vmap(
        lambda st, cap: lm_run(proj.residuals, proj.residuals_and_jacobian,
                               st, cfg, iter_cap=cap),
        in_axes=(0, None)))
    nsteps_at = jax.jit(jax.vmap(
        lambda th: proj.evaluate(th, with_jac=True).nsteps))

    t0 = time.perf_counter()
    state = init(starts)
    jax.block_until_ready(state.cost)
    t_init = time.perf_counter() - t0

    # warm the step jit on a throwaway copy so per-iteration times are warm
    t0 = time.perf_counter()
    _ = step(state, jnp.asarray(1, jnp.int32))
    jax.block_until_ready(_.cost)
    t_compile = time.perf_counter() - t0

    iter_s, ns_rows = [], []
    for it in range(1, MAX_ITER + 1):
        t0 = time.perf_counter()
        state = step(state, jnp.asarray(it, jnp.int32))
        jax.block_until_ready(state.cost)
        iter_s.append(round(time.perf_counter() - t0, 3))
        ns = np.asarray(nsteps_at(state.theta)).ravel()
        ns_rows.append((float(ns.mean()), int(ns.max())))

    print(json.dumps({
        "batch": BATCH, "init_seconds": round(t_init, 1),
        "step_compile_seconds": round(t_compile, 1),
        "per_iter_seconds": iter_s,
        "total_loop_seconds": round(sum(iter_s), 2),
        "nsteps_mean_max_at_accepted": ns_rows,
        "lam_final_minmax": [float(np.asarray(state.lam).min()),
                             float(np.asarray(state.lam).max())],
        "done": int(np.asarray(state.done).sum()),
    }))


if __name__ == "__main__":
    main()
