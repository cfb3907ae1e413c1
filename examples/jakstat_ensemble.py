"""Config 4 (BASELINE.json:10): JAK-STAT multi-experiment ensemble fit with
shared + local parameters and scale factors.

Two Epo doses share kinetic parameters k1..k4; the input amplitude is
experiment-local; both observables are relative (fitted scale factors).

    python examples/jakstat_ensemble.py [--cpu]
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

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.data import Experiment, ExperimentBatch, Measurement  # noqa: E402
from tpusysbio.fit import latin_hypercube, multistart_fit  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.project import ParameterMap, Project  # noqa: E402


def build_project(seed=0, sigma=0.04):
    model = library.jak_stat()
    rng = np.random.default_rng(seed)
    t = np.linspace(2.0, 60.0, 12)
    doses = [1.0, 0.4]
    scale_true = {"pstat": 2.8, "tstat": 0.7}
    exps = []
    for e, amp in enumerate(doses):
        p = jnp.asarray([2.5, 4.0, 0.3, 0.6, amp, 6.0])
        r = model.simulate(p, (0.0, 60.0), jnp.asarray(t),
                           config=SolverConfig(rtol=1e-10, atol=1e-12))
        obs = np.asarray(jax.vmap(lambda y: model.observables(y, p))(r.ys))
        meas = []
        for i, g in enumerate(["pstat", "tstat"]):
            vals = scale_true[g] * obs[:, i] * (
                1 + rng.normal(scale=sigma, size=len(t)))
            meas.append(Measurement(
                obs_index=i, times=t, values=vals,
                sigmas=np.full(len(t), sigma * scale_true[g]),
                scale_group=g))
        exps.append(Experiment(f"dose_{amp}", tuple(meas)))
    batch = ExperimentBatch.from_experiments(exps)
    pmap = ParameterMap.create(model.param_names, len(doses),
                               shared=("k1", "k2", "k3", "k4"),
                               local=("amp",), fixed={"tau": 6.0})
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-7, atol=1e-10, max_steps=512))
    theta_true = pmap.pack({"k1": 2.5, "k2": 4.0, "k3": 0.3, "k4": 0.6,
                            "amp": np.asarray(doses)})
    return proj, pmap, theta_true, scale_true


def main():
    proj, pmap, theta_true, scale_true = build_project()
    starts = latin_hypercube(jax.random.PRNGKey(0), 8,
                             theta_true - 1.5, theta_true + 1.5)
    out = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                         starts, FitConfig(max_iter=60)).ranked()
    best = jax.tree.map(lambda x: x[0], out)
    ev = proj.evaluate(best.theta, with_jac=False)
    print(f"best: status={int(best.status)} cost={float(best.cost):.2f} "
          f"(cost at truth: {float(proj.cost(theta_true)):.2f})")
    print("fitted scale factors:",
          dict(zip(["pstat", "tstat"],
                   np.round(np.asarray(ev.scale), 3).tolist())),
          "true:", scale_true)
    for name, v in zip(pmap.theta_names, np.exp(np.asarray(best.theta))):
        print(f"  {name:>7s} = {v:.4f}")


if __name__ == "__main__":
    main()
