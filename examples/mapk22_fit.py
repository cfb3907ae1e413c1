"""Config 3 (BASELINE.json:9): Huang-Ferrell MAPK cascade (~22 states,
stiff) single-experiment BDF fit.

Fits the 6 catalytic rate constants of the MAPK-level reactions (the rest
held at truth) against noisy observations of the three active kinase forms.

    python examples/mapk22_fit.py [--cpu]
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
    model = library.mapk_huang_ferrell()
    p_true = library.mapk_true_params()
    t = np.linspace(5.0, 100.0, 12)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 100.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-9, atol=1e-12,
                                             max_steps=2048))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(0)
    sigma = 0.02 * float(np.max(obs))
    data = obs + rng.normal(scale=sigma, size=obs.shape)

    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("wt", meas)])

    # fit the MAPK-level catalytic mechanism rates; fix the rest at truth
    free = [n for n in model.param_names
            if n.startswith(("KKPP+K", "KPase+KP"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024))

    true_vals = {n: p_true[model.param_names.index(n)] for n in free}
    theta_true = pmap.pack(true_vals)
    theta0 = theta_true + jnp.asarray(
        np.random.default_rng(1).normal(scale=0.5, size=len(free)))
    fit = jax.jit(lambda th: lm_fit(proj.residuals,
                                    proj.residuals_and_jacobian, th,
                                    FitConfig(max_iter=50)))(theta0)
    print(f"status={int(fit.status)} iters={int(fit.n_iter)} "
          f"cost={float(fit.cost):.2f} "
          f"(cost at truth {float(proj.cost(theta_true)):.2f})")
    for name, v_fit, v_true in zip(pmap.theta_names,
                                   np.exp(np.asarray(fit.theta)),
                                   [true_vals[n] for n in free]):
        print(f"  {name:>16s}: fit={v_fit:9.3f} true={v_true:9.3f}")


if __name__ == "__main__":
    main()
