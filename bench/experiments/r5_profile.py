"""Trace the EXACT bench.py contract (sens returned) to find where the
41-point dense-output tax goes (r5: bench 249 vs 298 int/s when sens are
not returned; NT=3 measures 303).

Writes a profile under /tmp/r5_profile; read with
bench/experiments/profile_report.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio import solvers  # noqa: E402

BATCH = 256
model = library.mapk_huang_ferrell()
p_true = jnp.asarray(library.mapk_true_params())
t_eval = jnp.linspace(0.0, 100.0, 41)
cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                   linear_solver="pallas", sens_precision="f32",
                   dense_f32=True)


def integrate(p):
    sens_rhs = lambda t, y, S: model.rhs_sens(t, y, S, p)  # noqa: E731
    jac = lambda t, y: model.rhs_jac(t, y, p.astype(y.dtype))  # noqa: E731
    s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
    res = solvers.SOLVERS["bdf"](
        lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
        (0.0, 100.0), model.y0(p), t_eval, config=cfg,
        sens_rhs=sens_rhs, s0=s0, jac=jac)
    return res.ys, res.sens, res.status, res.nsteps


run = jax.jit(jax.vmap(integrate))
rng = np.random.default_rng(0)
ps = p_true[None, :] * jnp.asarray(
    np.exp(rng.normal(scale=0.1, size=(BATCH, p_true.shape[0]))))
out = run(ps)
jax.block_until_ready(out)
t0 = time.perf_counter()
jax.block_until_ready(run(ps))
print("warm batch seconds:", time.perf_counter() - t0)
with jax.profiler.trace("/tmp/r5_profile"):
    jax.block_until_ready(run(ps))
print("trace written")
