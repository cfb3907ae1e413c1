# TPU component diagnostics (run WITHOUT PYTHONPATH from /root/repo)
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, time
print("backend:", jax.default_backend(), flush=True)

from tpusysbio.linalg import lu as mylu
from tpusysbio.model import library
from tpusysbio.config import SolverConfig
from tpusysbio.solvers import bdf_solve

rng = np.random.default_rng(0)
# 1. LU on TPU f64
a = jnp.asarray(rng.normal(size=(22,22))); b = jnp.asarray(rng.normal(size=22))
t0=time.time()
x = np.asarray(jax.jit(lambda a,b: mylu.lu_solve(mylu.lu_factor(a), b))(a,b))
print(f"1. lu_solve err={np.max(np.abs(x-np.linalg.solve(np.asarray(a),np.asarray(b)))):.2e} ({time.time()-t0:.0f}s)", flush=True)
t0=time.time()
inv = np.asarray(jax.jit(mylu.lu_inverse)(a))
print(f"2. lu_inverse |XA-I|={np.max(np.abs(inv@np.asarray(a)-np.eye(22))):.2e} ({time.time()-t0:.0f}s)", flush=True)

# 3. mass-action RHS value vs precomputed CPU reference
mapk = library.mapk_huang_ferrell()
p = jnp.asarray(library.mapk_true_params())
y_test = jnp.asarray(np.abs(rng.normal(size=22))*0.1)
rhs_val = np.asarray(jax.jit(lambda y: mapk.rhs(0., y, p))(y_test))
print("3. rhs[0:4] =", rhs_val[:4], flush=True)

# 4. MM3 bdf single
mm = library.michaelis_menten()
pmm = jnp.asarray(library.MM_TRUE_PARAMS)
t0=time.time()
res = jax.jit(lambda pv: bdf_solve(lambda t,y: mm.rhs(t,y,pv), (0.,10.), mm.y0(pv), jnp.linspace(0,10,5), config=SolverConfig()))(pmm)
jax.block_until_ready(res.ys)
print(f"4. MM3 bdf: status={int(res.status)} nsteps={int(res.nsteps)} nacc={int(res.naccepted)} ys[-1]={np.asarray(res.ys)[-1]} (compile {time.time()-t0:.0f}s)", flush=True)

# 5. MAPK bdf single no-sens
t0=time.time()
res = jax.jit(lambda pv: bdf_solve(lambda t,y: mapk.rhs(t,y,pv), (0.,100.), mapk.y0(pv), jnp.linspace(0,100,5), config=SolverConfig(max_steps=1024)))(p)
jax.block_until_ready(res.ys)
print(f"5. MAPK bdf: status={int(res.status)} nsteps={int(res.nsteps)} nacc={int(res.naccepted)} nrej={int(res.nrejected)} nlu={int(res.nlu)} (compile {time.time()-t0:.0f}s)", flush=True)
print("   KPP(t=100) =", float(np.asarray(res.ys)[-1][10]), flush=True)
