"""Adams vs RK45 on smooth non-stiff ENSEMBLES (VERDICT round-2 #6 gate:
"repressilator/Lotka ensemble int/s beats dopri5 at equal accuracy").

Vmapped batches of Lotka–Volterra and repressilator integrations with
full forward sensitivities at rtol=1e-6, one TPU chip.

Usage: python bench/experiments/adams_ensemble_bench.py  (no PYTHONPATH)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.sens import make_sens_rhs  # noqa: E402
from tpusysbio import solvers  # noqa: E402

BATCH = 256
REPEATS = 3


def bench(tag, model, p_true, t_end, solver_name):
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=16384)
    t_eval = jnp.linspace(0.0, t_end, 21)
    solve = solvers.SOLVERS[solver_name]

    def one(p):
        sens_rhs = (lambda t, y, S: model.rhs_sens(t, y, S, p)) \
            if model.rhs_sens is not None else make_sens_rhs(model.rhs, p)
        s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
        r = solve(lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
                  (0.0, t_end), model.y0(p), t_eval, config=cfg,
                  sens_rhs=sens_rhs, s0=s0)
        return r.status, r.nsteps, r.nfev

    run = jax.jit(jax.vmap(one))
    rng = np.random.default_rng(0)
    ps = jnp.asarray(p_true)[None, :] * jnp.asarray(
        np.exp(rng.normal(scale=0.1,
                          size=(BATCH, len(p_true)))))
    t0 = time.perf_counter()
    out = run(ps)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ps))
        times.append(time.perf_counter() - t0)
    best = min(times)
    status = np.asarray(out[0])
    print(json.dumps({
        "tag": tag, "solver": solver_name,
        "int_per_sec_chip": round(BATCH / best, 1),
        "batch_seconds": round(best, 3),
        "compile_seconds": round(compile_s, 1),
        "ok": int((status == 1).sum()),
        "mean_nsteps": float(np.asarray(out[1]).mean()),
        "mean_nfev": float(np.asarray(out[2]).mean()),
    }), flush=True)


def main():
    lv = library.lotka_volterra()
    rep = library.repressilator()
    for name in ("adams", "dopri5"):
        bench("lotka+sens b256", lv, library.LV_TRUE_PARAMS, 15.0, name)
    for name in ("adams", "dopri5"):
        bench("repressilator+sens b256", rep,
              library.REPRESSILATOR_TRUE_PARAMS, 40.0, name)


if __name__ == "__main__":
    main()
