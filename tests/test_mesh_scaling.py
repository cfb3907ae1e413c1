"""Measured (not assumed) sharding overhead on the fake 8-device mesh.

VERDICT r4 #4: the v5e-8 throughput claims were single-chip × 8, assuming
zero sharding cost. On this host the 8 virtual CPU devices serialize onto
the physical cores, so the ideal sharded wall-clock for a fixed total
batch equals the unsharded wall-clock; the measured ratio

    serialized efficiency = T(unsharded) / T(8-device shard_map)

is exactly the shard_map/dispatch/collective overhead the ×8
extrapolation ignores. The companion sweep over n ∈ {1,2,4,8} lives in
``bench/experiments/mesh_scaling.py``; this test pins the n=8 point of
that curve as a regression gate on a compute-dominated shape.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.fit import latin_hypercube
from tpusysbio.fit.multistart import make_multistart_runner
from tpusysbio.model import library
from tpusysbio.project import ParameterMap, Project


def _problem():
    """Lockstep LM screen on MAPK-22 — the headline program shape, sized
    so one repeat is seconds-scale (timing noise ≪ the 10% budget)."""
    model = library.mapk_huang_ferrell()
    p_true = np.asarray(library.mapk_true_params())
    t = np.linspace(5.0, 100.0, 8)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 100.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-6, atol=1e-9,
                                             max_steps=1024))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    sigma = 0.02 * float(np.max(obs))
    rng = np.random.default_rng(0)
    data = obs + rng.normal(scale=sigma, size=obs.shape)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("wt", meas)])
    free = [n for n in model.param_names
            if n.startswith(("KKPP+K", "KPase+KP"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=160,
                                       linear_solver="lu",
                                       mixed_precision=True))
    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    return proj, theta_true


@pytest.mark.slow
def test_eight_device_serialized_efficiency():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    proj, theta_true = _problem()
    cfg = FitConfig(max_iter=4, eval_mode="lockstep", ftol=1e-10, xtol=1e-10)
    run1 = make_multistart_runner(proj.residuals,
                                  proj.residuals_and_jacobian, cfg,
                                  with_cov=False)
    mesh = Mesh(np.array(jax.devices()[:8]), ("starts",))
    run8 = make_multistart_runner(proj.residuals,
                                  proj.residuals_and_jacobian, cfg,
                                  mesh=mesh, with_cov=False)
    starts = latin_hypercube(jax.random.PRNGKey(0), 32,
                             theta_true - 1.0, theta_true + 1.0)

    out1 = run1(starts)
    jax.block_until_ready(out1.cost)      # compile + warm
    out8 = run8(starts)
    jax.block_until_ready(out8.cost)

    def best_of(run, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(run(starts).cost)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = best_of(run1)
    t8 = best_of(run8)
    eff = t1 / t8
    # member-for-member converged equality of sharded vs unsharded fits is
    # test_fit.py::test_multistart_sharded_mesh; at 4 unconverged lockstep
    # iterations mid-flight states are bitwise-sensitive to shard_map/vmap
    # fusion differences, so here only sanity is asserted
    assert np.isfinite(np.asarray(out8.cost)).sum() >= 28
    assert np.isfinite(np.asarray(out1.cost)).sum() >= 28
    assert eff >= 0.9, (
        f"8-device shard_map overhead too high: T1={t1:.3f}s T8={t8:.3f}s "
        f"serialized efficiency {eff:.3f} < 0.9")
