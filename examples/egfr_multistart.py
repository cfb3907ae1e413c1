"""Config 5 (BASELINE.json:11): vmapped multi-start fit of the ~100-state
EGFR-scale network, sharded over all available devices.

The full 144-parameter fit is the production workload; this example fits
the receptor-module rates (2 parameters) plus the first layer's kinase
rates (6) from a Latin-hypercube start cloud, to stay runnable in minutes.
Scale N_STARTS up on a pod slice.

    python examples/egfr_multistart.py [--cpu] [n_starts]
"""

import sys

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.data import Experiment, ExperimentBatch, Measurement  # noqa: E402
from tpusysbio.fit import latin_hypercube, multistart_fit  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.project import ParameterMap, Project  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_starts = int(args[0]) if args else 8

    model = library.egfr_like()
    p_true = library.egfr_true_params()
    print(f"model: {model.name} — {model.n_states} states, "
          f"{model.n_params} rate constants")

    t = np.linspace(0.5, 10.0, 9)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-8, atol=1e-11,
                                             max_steps=4096))
    assert int(sim.status) == 1, int(sim.status)
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(0)
    sigma = 0.02 * float(np.max(obs))
    data = obs + rng.normal(scale=sigma, size=obs.shape)

    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("egf", meas)])

    free = [n for n in model.param_names
            if n.startswith(("L+Rec", "LR+A0_0", "LR+A0_1"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048))

    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    starts = latin_hypercube(jax.random.PRNGKey(0), n_starts,
                             theta_true - 1.0, theta_true + 1.0)

    devs = jax.devices()
    mesh = None
    if len(devs) > 1 and n_starts % len(devs) == 0:
        mesh = Mesh(np.array(devs), ("starts",))
        print(f"sharding {n_starts} starts over {len(devs)} devices")

    out = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                         starts, FitConfig(max_iter=30), mesh=mesh).ranked()
    ok = np.asarray(out.status) > 0
    print(f"{ok.sum()}/{n_starts} starts converged; "
          f"best cost {float(out.cost[0]):.2f} "
          f"(cost at truth {float(proj.cost(theta_true)):.2f})")


if __name__ == "__main__":
    main()
