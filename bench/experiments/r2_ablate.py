"""Round-2 ablations: quantify the remaining perf levers on real TPU.

Rows (MAPK-22 + 30-param fwd sens unless noted):
  A  current best full-accuracy config (re-measure round-1 59.6 int/s)
  B  screening config (mixed_precision f32 hot loop, rtol=1e-3)
  C  screening at batch 512 (does the larger program still fit the
     execution ceiling? linear scaling?)
  E  EGFR ~97-state, no sens (VERDICT item 6: n≈100 dense-LU behavior)
  E2 EGFR ~97-state, no sens, batch 256

Usage: python bench/experiments/r2_ablate.py   (TPU, no PYTHONPATH)
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


def bench(name, model, p_true, t_end, cfg, batch, with_sens=True,
          stepper="bdf", repeats=2):
    t_eval = jnp.linspace(0.0, t_end, 41)
    p_true = jnp.asarray(p_true)

    def integrate(p):
        kw = {}
        if with_sens:
            if model.rhs_sens is not None:
                kw["sens_rhs"] = lambda t, y, S: model.rhs_sens(t, y, S, p)
            else:
                kw["sens_rhs"] = make_sens_rhs(model.rhs, p)
            kw["s0"] = jnp.zeros((model.n_states, model.n_params), p.dtype)
        if model.rhs_jac is not None:
            kw["jac"] = lambda t, y: model.rhs_jac(t, y, p.astype(y.dtype))
        res = solvers.SOLVERS[stepper](
            lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
            (0.0, t_end), model.y0(p), t_eval, config=cfg, **kw)
        return res.ys, res.status, res.nsteps

    run = jax.jit(jax.vmap(integrate))
    rng = np.random.default_rng(0)
    ps = p_true[None, :] * jnp.asarray(
        np.exp(rng.normal(scale=0.1, size=(batch, p_true.shape[0]))))
    t0 = time.perf_counter()
    try:
        out = run(ps)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"row": name, "error": str(e)[:400]}), flush=True)
        return
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ps))
        times.append(time.perf_counter() - t0)
    best = min(times)
    status = np.asarray(out[1])
    print(json.dumps({
        "row": name, "batch": batch, "int_per_sec": round(batch / best, 2),
        "best_s": round(best, 3), "compile_s": round(compile_s, 1),
        "ok": int((status == 1).sum()),
        "mean_nsteps": round(float(np.asarray(out[2]).mean()), 1),
    }), flush=True)


def main():
    mapk = library.mapk_huang_ferrell()
    p_mapk = library.mapk_true_params()

    tight = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                         linear_solver="inv32", sens_precision="f32")
    screen = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                          linear_solver="inv32", mixed_precision=True)

    bench("A mapk tight f32-sens b128", mapk, p_mapk, 100.0, tight, 128)
    bench("B mapk screen mp b128", mapk, p_mapk, 100.0, screen, 128)
    bench("C mapk screen mp b512", mapk, p_mapk, 100.0, screen, 512)

    egfr = library.egfr_like()
    p_egfr = library.egfr_true_params()
    ecfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048,
                        linear_solver="inv32")
    bench("E egfr97 tight nosens b64", egfr, p_egfr, 10.0, ecfg, 64,
          with_sens=False)
    bench("E2 egfr97 tight nosens b256", egfr, p_egfr, 10.0, ecfg, 256,
          with_sens=False)


if __name__ == "__main__":
    main()
