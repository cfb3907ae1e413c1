"""Trace the SCREENING fit phase (mp+pallas, b512) to find why fits/s
lags the raw integration rate by ~6x.

Usage: python bench/experiments/profile_screen.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

import dataclasses  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402
from tpusysbio.fit.multistart import make_multistart_runner  # noqa: E402
from bench.fits_bench import build_problem  # noqa: E402

N = 512

proj_tight, theta_true = build_problem()
proj_screen = dataclasses.replace(
    proj_tight,
    config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                        linear_solver="pallas", mixed_precision=True))
screen_cfg = FitConfig(max_iter=8, eval_mode="lockstep",
                       ftol=1e-4, xtol=1e-4)
run = make_multistart_runner(proj_screen.residuals,
                             proj_screen.residuals_and_jacobian,
                             screen_cfg, iter_chunk=8)
starts = latin_hypercube(jax.random.PRNGKey(0), N,
                         theta_true - 1.0, theta_true + 1.0)
out = run(starts)
jax.block_until_ready(out.cost)
print("warm", flush=True)
t0 = time.perf_counter()
out = run(starts)
jax.block_until_ready(out.cost)
print(f"warm run: {time.perf_counter()-t0:.2f}s "
      f"({N/(time.perf_counter()-t0):.1f} fits8/s)", flush=True)

with jax.profiler.trace("/tmp/screen_profile"):
    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    print(f"traced: {time.perf_counter()-t0:.2f}s", flush=True)
