"""Config 5 (BASELINE.json:11) at FITTING scale: EGFR-97 with forward
sensitivities and full multi-start LM fits.

Round 2 measured only sensitivity-free EGFR integrations; this bench
takes the ~100-state network to the shapes that stress VMEM and the
linear algebra:

- ``mode=sens``: vmapped BDF integrations WITH the fit-parameter
  sensitivity column block (sens_mode='theta': 97×(1+G) columns for the
  12-free-parameter case instead of 97×147 — the reduced propagation
  that makes this config tractable at all).
- ``mode=fits``: full multi-start LM fits/min (the BASELINE.json:2
  metric at ~100 states).

Env: TPUSYSBIO_EGFR_MODE (sens|fits), TPUSYSBIO_EGFR_BATCH (default 64),
TPUSYSBIO_EGFR_SOLVER (default pallas — the block-Schur path at n=97),
TPUSYSBIO_EGFR_MAXITER (default 10).

    python -m bench.egfr_bench
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

MODE = os.environ.get("TPUSYSBIO_EGFR_MODE", "sens")
BATCH = int(os.environ.get("TPUSYSBIO_EGFR_BATCH", "64"))
SOLVER = os.environ.get("TPUSYSBIO_EGFR_SOLVER", "pallas")
MAX_ITER = int(os.environ.get("TPUSYSBIO_EGFR_MAXITER", "10"))
REPEATS = int(os.environ.get("TPUSYSBIO_EGFR_REPEATS", "3"))


def build_problem():
    """12-free-parameter EGFR-97 fit: receptor module + layer-0 kinase and
    phosphatase rates free, everything else fixed at truth."""
    from tpusysbio.config import SolverConfig
    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.model import library
    from tpusysbio.project import ParameterMap, Project

    model = library.egfr_like()
    p_true = library.egfr_true_params()
    t = np.linspace(0.5, 10.0, 9)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-8, atol=1e-11,
                                             max_steps=4096))
    assert int(sim.status) == 1, int(sim.status)
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(0)
    sigma = 0.02 * float(np.max(obs))
    data = obs + rng.normal(scale=sigma, size=obs.shape)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("egf", meas)])

    free = [n for n in model.param_names
            if n.startswith(("L+Rec", "LR+A0_0", "LR+A0_1", "P0+A0_1"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    # max_steps = 2x nominal (EGFR-97 needs ~340 BDF steps at rtol=1e-6):
    # the lockstep-union cap (docs/PERFORMANCE.md)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=768,
                                       linear_solver=SOLVER,
                                       sens_precision="f32",
                                       dense_f32=True))
    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    return proj, theta_true


def bench_sens(proj, theta_true):
    G = theta_true.shape[0]
    rng = np.random.default_rng(0)
    thetas = theta_true[None, :] + jnp.asarray(
        rng.normal(scale=0.1, size=(BATCH, G)))

    def eval_one(th):
        ev = proj.evaluate(th, with_jac=True)
        return ev.status, ev.nsteps

    run = jax.jit(jax.vmap(eval_one))

    t0 = time.perf_counter()
    out = run(thetas)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(thetas))
        times.append(time.perf_counter() - t0)
    best = min(times)
    status = np.asarray(out[0]).reshape(-1)
    return {
        "metric": "EGFR-97 + 12-param fwd sens integrations/sec/chip "
                  f"(theta-mode columns, {SOLVER}, rtol=1e-6)",
        "value": round(BATCH / best, 2),
        "unit": "integrations/sec/chip",
        "detail": {"batch": BATCH, "best_batch_seconds": round(best, 2),
                   "compile_seconds": round(compile_s, 1),
                   "ok_members": int((status == 1).sum()),
                   "mean_nsteps": float(np.asarray(out[1]).mean()),
                   "backend": jax.default_backend()},
    }


def bench_fits(proj, theta_true):
    from tpusysbio.config import FitConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import make_multistart_runner

    starts = latin_hypercube(jax.random.PRNGKey(0), BATCH,
                             theta_true - 0.5, theta_true + 0.5)
    cfg = FitConfig(max_iter=MAX_ITER, eval_mode="lockstep")
    run = make_multistart_runner(proj.residuals,
                                 proj.residuals_and_jacobian, cfg,
                                 iter_chunk=2)
    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    warm = time.perf_counter() - t0
    status = np.asarray(out.status)
    best = out.ranked()
    ct = float(jax.jit(proj.cost)(theta_true))
    return {
        "metric": f"EGFR-97 multi-start LM fits/min/chip (12 free params, "
                  f"{SOLVER}, rtol=1e-6, {MAX_ITER} iters)",
        "value": round(BATCH / warm * 60.0, 1),
        "unit": "fits/min/chip",
        "detail": {"batch": BATCH, "warm_seconds": round(warm, 1),
                   "cold_seconds_incl_compile": round(cold, 1),
                   "converged": int((status > 0).sum()),
                   "best_cost": float(best.cost[0]),
                   "cost_at_truth": ct,
                   "backend": jax.default_backend()},
    }


def main():
    proj, theta_true = build_problem()
    if MODE == "sens":
        rec = bench_sens(proj, theta_true)
    else:
        rec = bench_fits(proj, theta_true)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
