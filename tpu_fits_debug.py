import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, time
from bench.fits_bench import build_problem
from tpusysbio.config import FitConfig
from tpusysbio.optim import lm_fit

print("building problem (data-gen integration)...", flush=True)
t0=time.time()
proj, theta_true = build_problem()
print(f"  ok ({time.time()-t0:.0f}s)", flush=True)

print("single residual eval...", flush=True)
t0=time.time()
r = jax.jit(proj.residuals)(theta_true)
jax.block_until_ready(r); print(f"  ok cost={float(0.5*jnp.sum(r*r)):.3f} ({time.time()-t0:.0f}s)", flush=True)

print("single residual+jac eval...", flush=True)
t0=time.time()
r, J = jax.jit(proj.residuals_and_jacobian)(theta_true)
jax.block_until_ready(J); print(f"  ok |J|max={float(jnp.max(jnp.abs(J))):.3g} ({time.time()-t0:.0f}s)", flush=True)

print("single LM fit (3 iters)...", flush=True)
t0=time.time()
fit = jax.jit(lambda th: lm_fit(proj.residuals, proj.residuals_and_jacobian, th, FitConfig(max_iter=3)))(theta_true + 0.3)
jax.block_until_ready(fit.cost); print(f"  ok status={int(fit.status)} cost={float(fit.cost):.3f} ({time.time()-t0:.0f}s)", flush=True)

print("vmapped LM fit batch 4 (3 iters)...", flush=True)
t0=time.time()
starts = theta_true[None,:] + 0.1*jnp.arange(4)[:,None]
fits = jax.jit(jax.vmap(lambda th: lm_fit(proj.residuals, proj.residuals_and_jacobian, th, FitConfig(max_iter=3))))(starts)
jax.block_until_ready(fits.cost); print(f"  ok costs={np.asarray(fits.cost).round(2)} ({time.time()-t0:.0f}s)", flush=True)
