"""Config 1 (BASELINE.json:7): 3-state Michaelis-Menten fit to synthetic data.

The minimal end-to-end slice: simulate -> add noise -> build a Project ->
single LM fit. Run:

    python examples/mm3_fit.py [--cpu]
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
from tpusysbio.model import library  # noqa: E402
from tpusysbio.optim import lm_fit  # noqa: E402
from tpusysbio.project import ParameterMap, Project  # noqa: E402


def main():
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(0.5, 10.0, 15)
    sim = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    rng = np.random.default_rng(0)
    sigma = 0.01
    data = np.asarray(sim.ys) + rng.normal(scale=sigma, size=(len(t), 3))

    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(3))
    batch = ExperimentBatch.from_experiments([Experiment("synthetic", meas)])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "km1", "k2", "E0"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-8, atol=1e-10))

    theta0 = pmap.pack({"k1": 3.0, "km1": 0.3, "k2": 0.6, "E0": 1.0})
    fit = jax.jit(lambda th: lm_fit(proj.residuals,
                                    proj.residuals_and_jacobian,
                                    th, FitConfig()))(theta0)
    print(f"status={int(fit.status)}  iters={int(fit.n_iter)}  "
          f"cost={float(fit.cost):.3f}")
    for name, v_fit, v_true in zip(pmap.theta_names,
                                   np.exp(np.asarray(fit.theta)),
                                   np.asarray(library.MM_TRUE_PARAMS)):
        print(f"  {name:>4s}: fit={v_fit:8.4f}  true={v_true:8.4f}")


if __name__ == "__main__":
    main()
