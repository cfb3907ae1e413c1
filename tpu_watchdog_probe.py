import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, time
from tpusysbio.model import library
from tpusysbio.config import SolverConfig
from tpusysbio.solvers import bdf_solve
from tpusysbio.sens import make_sens_rhs

# One jit whose on-device runtime we can dial via n_repeats of integration
mapk = library.mapk_huang_ferrell()
p_true = jnp.asarray(library.mapk_true_params())
cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024, linear_solver="inv32")
t_eval = jnp.linspace(0., 100., 5)

def one(p):
    sens_rhs = make_sens_rhs(mapk.rhs, p)
    s0 = jnp.zeros((22, 30), p.dtype)
    r = bdf_solve(lambda t,y: mapk.rhs(t,y,p), (0.,100.), mapk.y0(p), t_eval,
                  config=cfg, sens_rhs=sens_rhs, s0=s0)
    return r.ys[-1], r.status

def chained(p, n):
    # n sequential integrations (scan) -> runtime scales ~linearly
    def body(carry, _):
        y, s = one(p * (1.0 + 1e-9 * carry[1].astype(p.dtype)))
        return (y, s), s
    (_, _), ss = jax.lax.scan(body, (jnp.zeros(22), jnp.asarray(0, jnp.int32)), None, length=n)
    return ss

rng = np.random.default_rng(0)
ps = p_true * jnp.asarray(np.exp(rng.normal(scale=0.05, size=30)))
for n in [2, 8, 24, 48]:
    f = jax.jit(lambda p: chained(p, n))
    t0 = time.time()
    try:
        out = jax.block_until_ready(f(ps))
        print(f"n={n}: OK run+compile {time.time()-t0:.0f}s statuses ok={int((np.asarray(out)==1).sum())}", flush=True)
        t0 = time.time()
        jax.block_until_ready(f(ps))
        print(f"   pure run {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"n={n}: FAILED after {time.time()-t0:.0f}s: {str(e)[:120]}", flush=True)
        break
