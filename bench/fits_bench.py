"""North-star metric 2 (BASELINE.json:2): multi-start fits/min at ~20 states.

A full production workload: N complete LM fits of the stiff MAPK-22
cascade (12 free MAPK-layer rate constants, rest fixed at truth) from a
Latin-hypercube start cloud, vmapped in lockstep on one chip. Prints one
JSON line; multiply by chips for pod-slice throughput (the starts axis
shards with zero communication — SURVEY.md §3.4).

Run on TPU (no PYTHONPATH!):   python -m bench.fits_bench
Env: TPUSYSBIO_FITS_BATCH (default 64), TPUSYSBIO_FITS_MAXITER (default 20).
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_FITS_BATCH", "128"))
MAX_ITER = int(os.environ.get("TPUSYSBIO_FITS_MAXITER", "20"))


def build_problem():
    from tpusysbio.config import SolverConfig
    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.model import library
    from tpusysbio.project import ParameterMap, Project

    model = library.mapk_huang_ferrell()
    p_true = library.mapk_true_params()
    t = np.linspace(5.0, 100.0, 12)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 100.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-9, atol=1e-12,
                                             max_steps=2048))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(0)
    sigma = 0.02 * float(np.max(obs))
    data = obs + rng.normal(scale=sigma, size=obs.shape)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("wt", meas)])
    free = [n for n in model.param_names
            if n.startswith(("KKPP+K", "KPase+KP"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    solver = os.environ.get("TPUSYSBIO_FITS_SOLVER", "pallas")
    # max_steps = 2x the nominal 262-step integration: one pathological
    # LHS member otherwise drags every LM iteration's lockstep union to
    # the full budget (docs/PERFORMANCE.md "lockstep-union tax")
    max_steps = int(os.environ.get("TPUSYSBIO_FITS_MAX_STEPS", "512"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-6, atol=1e-9,
                                       max_steps=max_steps,
                                       linear_solver=solver,
                                       sens_precision="f32",
                                       dense_f32=True))
    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    return proj, theta_true


def main():
    from tpusysbio.config import FitConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import make_multistart_runner

    proj, theta_true = build_problem()
    starts = latin_hypercube(jax.random.PRNGKey(0), BATCH,
                             theta_true - 1.0, theta_true + 1.0)
    cfg = FitConfig(max_iter=MAX_ITER, eval_mode=os.environ.get("TPUSYSBIO_FITS_MODE", "lockstep"))

    # iter_chunk keeps each device call under the runtime's execution
    # ceiling (docs/PERFORMANCE.md); chunks share one compilation.
    # A PERSISTENT runner is the production shape (see the headline
    # harness): fresh multistart_fit calls re-trace their jit wrappers
    # every time, which costs tens of seconds of host time per call on
    # the remote-AOT runtime and is NOT fit throughput.
    chunk = int(os.environ.get("TPUSYSBIO_FITS_ITER_CHUNK", "4"))
    run = make_multistart_runner(proj.residuals,
                                 proj.residuals_and_jacobian,
                                 cfg, iter_chunk=chunk)
    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    run_s = time.perf_counter() - t0

    ok = np.asarray(out.status) > 0
    best = out.ranked()
    fits_per_min = BATCH / run_s * 60.0
    print(json.dumps({
        "metric": "multi-start LM fits/min/chip (MAPK-22, 12 free params, "
                  "BDF+fwd-sens, rtol=1e-6)",
        "value": round(fits_per_min, 2),
        "unit": "fits/min/chip",
        "detail": {
            "batch": BATCH, "run_seconds": round(run_s, 2),
            "first_call_seconds": round(compile_and_run, 1),
            "converged": int(ok.sum()),
            "best_cost": float(best.cost[0]),
            "cost_at_truth_scale": None,
            "mean_lm_iters": float(np.asarray(out.n_iter).mean()),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
