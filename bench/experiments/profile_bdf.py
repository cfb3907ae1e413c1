"""Capture a device trace of the batch-128 MAPK-22+sens BDF integration.

Writes a profile under /tmp/bdf_profile; analyze with
bench/experiments/profile_report.py (xprof tool-data converter).

Usage: python bench/experiments/profile_bdf.py
"""
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

BATCH = 128

model = library.mapk_huang_ferrell()
p_true = jnp.asarray(library.mapk_true_params())
t_eval = jnp.linspace(0.0, 100.0, 41)
cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                   linear_solver="inv32", sens_precision="f32")


def integrate(p):
    sens_rhs = lambda t, y, S: model.rhs_sens(t, y, S, p)  # noqa: E731
    jac = lambda t, y: model.rhs_jac(t, y, p.astype(y.dtype))  # noqa: E731
    s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
    res = solvers.SOLVERS["bdf"](
        lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
        (0.0, 100.0), model.y0(p), t_eval, config=cfg,
        sens_rhs=sens_rhs, s0=s0, jac=jac)
    return res.ys, res.status


run = jax.jit(jax.vmap(integrate))
rng = np.random.default_rng(0)
ps = p_true[None, :] * jnp.asarray(
    np.exp(rng.normal(scale=0.1, size=(BATCH, p_true.shape[0]))))

out = run(ps)
jax.block_until_ready(out)
print("warmed up", flush=True)

with jax.profiler.trace("/tmp/bdf_profile"):
    t0 = time.perf_counter()
    jax.block_until_ready(run(ps))
    print(f"traced run: {time.perf_counter() - t0:.3f}s", flush=True)
print("trace written to /tmp/bdf_profile", flush=True)
