"""Cross-config benchmark harness (SURVEY.md §5 metrics: the built-in
benchmark that times jitted calls with warm-up and block_until_ready).

Times vmapped stiff integrations for several canonical configs × solvers
and prints one JSON record per row. Heavier than bench.py (many compiles);
run occasionally:

    python -m bench.harness                  # TPU (no PYTHONPATH)
    TPUSYSBIO_HARNESS_BATCH=64 python -m bench.harness
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.sens import make_sens_rhs  # noqa: E402
from tpusysbio import solvers  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_HARNESS_BATCH", "64"))

CONFIGS = [
    # (name, builder, params, t_end, with_sens, solver list)
    ("mm3", library.michaelis_menten, library.MM_TRUE_PARAMS, 10.0, True,
     ["bdf", "radau"]),
    ("repressilator", library.repressilator,
     library.REPRESSILATOR_TRUE_PARAMS, 30.0, True, ["bdf"]),
    ("mapk22", library.mapk_huang_ferrell, library.mapk_true_params(),
     100.0, True, ["bdf", "radau"]),
    ("egfr97", library.egfr_like, library.egfr_true_params(), 10.0, False,
     ["bdf"]),
]


def bench_one(name, builder, p_np, t_end, with_sens, solver_name):
    model = builder()
    p_true = jnp.asarray(p_np)
    t_eval = jnp.linspace(0.0, t_end, 21)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048,
                       linear_solver="inv32")
    solve = solvers.SOLVERS[solver_name]

    def integrate(p):
        kw = {}
        if with_sens:
            kw = dict(sens_rhs=make_sens_rhs(model.rhs, p),
                      s0=jnp.zeros((model.n_states, model.n_params),
                                   p.dtype))
        res = solve(lambda t, y: model.rhs(t, y, p), (0.0, t_end),
                    model.y0(p), t_eval, config=cfg, **kw)
        return res.ys, res.status, res.nsteps

    run = jax.jit(jax.vmap(integrate))
    rng = np.random.default_rng(0)
    ps = p_true[None, :] * jnp.asarray(
        np.exp(rng.normal(scale=0.1, size=(BATCH, p_true.shape[0]))))

    t0 = time.perf_counter()
    out = run(ps)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(ps))
    run_s = time.perf_counter() - t0
    status = np.asarray(out[1])
    print(json.dumps({
        "config": name, "solver": solver_name, "with_sens": with_sens,
        "n_states": model.n_states, "n_params": model.n_params,
        "batch": BATCH,
        "integrations_per_sec": round(BATCH / run_s, 2),
        "run_seconds": round(run_s, 3),
        "compile_seconds": round(compile_s, 1),
        "ok": int((status == 1).sum()),
        "mean_nsteps": round(float(np.asarray(out[2]).mean()), 1),
    }), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    for row in CONFIGS:
        name, builder, p, t_end, with_sens, solver_list = row
        for s in solver_list:
            try:
                bench_one(name, builder, p, t_end, with_sens, s)
            except Exception as e:  # keep the sweep alive
                print(json.dumps({"config": name, "solver": s,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
