"""Debug: mixed-precision screening fails on TPU but not CPU.

Hypothesis: TPU f32 matmuls run at bf16 precision by default (MXU
DEFAULT precision), wrecking Newton convergence in the f32 hot loop.
Compare statuses with default vs HIGHEST matmul precision.

Usage: python bench/experiments/mp_debug.py
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
from tpusysbio import solvers  # noqa: E402


def run_case(label, cfg, batch=8):
    model = library.mapk_huang_ferrell()
    p_true = jnp.asarray(library.mapk_true_params())
    t_eval = jnp.linspace(0.0, 100.0, 41)

    def integrate(p):
        sens_rhs = lambda t, y, S: model.rhs_sens(t, y, S, p)  # noqa: E731
        jac = lambda t, y: model.rhs_jac(t, y, p.astype(y.dtype))  # noqa: E731
        s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
        res = solvers.SOLVERS["bdf"](
            lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
            (0.0, 100.0), model.y0(p), t_eval, config=cfg,
            sens_rhs=sens_rhs, s0=s0, jac=jac)
        return res.ys, res.status, res.nsteps, res.naccepted, res.nrejected

    run = jax.jit(jax.vmap(integrate))
    rng = np.random.default_rng(0)
    ps = p_true[None, :] * jnp.asarray(
        np.exp(rng.normal(scale=0.1, size=(batch, p_true.shape[0]))))
    t0 = time.perf_counter()
    out = run(ps)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(ps))
    run_s = time.perf_counter() - t0
    print(json.dumps({
        "case": label,
        "status": np.asarray(out[1]).tolist(),
        "nsteps": np.asarray(out[2]).tolist(),
        "nacc": np.asarray(out[3]).tolist(),
        "nrej": np.asarray(out[4]).tolist(),
        "compile_plus_run_s": round(wall, 1),
        "run_s": round(run_s, 3),
    }), flush=True)


scfg = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                    linear_solver="inv32", mixed_precision=True)

run_case("mp default-precision", scfg)
with jax.default_matmul_precision("highest"):
    run_case("mp HIGHEST-precision", scfg)
