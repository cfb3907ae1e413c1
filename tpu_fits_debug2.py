import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, time
from bench.fits_bench import build_problem
from tpusysbio.config import FitConfig
from tpusysbio.optim import lm_fit

proj, theta_true = build_problem()
print("problem built", flush=True)
rng = np.random.default_rng(0)
for batch, iters in [(4, 12), (16, 6), (16, 12)]:
    starts = theta_true[None,:] + jnp.asarray(rng.normal(scale=0.5, size=(batch, theta_true.shape[0])))
    cfg = FitConfig(max_iter=iters, eval_mode="lockstep")
    f = jax.jit(jax.vmap(lambda th: lm_fit(proj.residuals, proj.residuals_and_jacobian, th, cfg)))
    t0=time.time()
    try:
        out = f(starts)
        jax.block_until_ready(out.cost)
        ok = int((np.asarray(out.status) >= 0).sum())
        print(f"batch={batch} iters={iters}: OK {time.time()-t0:.0f}s costs[:4]={np.asarray(out.cost)[:4].round(2)}", flush=True)
        t0=time.time(); jax.block_until_ready(f(starts).cost)
        print(f"   rerun {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"batch={batch} iters={iters}: FAILED {time.time()-t0:.0f}s: {str(e)[:150]}", flush=True)
