"""Timed perturbations: JAK-STAT stimulus pulse + washout.

Demonstrates ``Experiment.inputs`` — the TPU-native events analogue
(reference stack: ``solve_ivp`` events + integration restarts, spec
``scipy/integrate/_ivp/ivp.py:29-158``). The Epo stimulus here is a square
pulse expressed as two timed parameter clamps:

    t = 5   amp -> 1.0   (stimulus ON)
    t = 25  amp -> 0.0   (washout)

The Project integrates [0,5], [5,25], [25,60] piecewise inside ONE jit,
carrying state and sensitivity columns across the static boundaries —
heterogeneous schedules across experiments run in vmap lockstep. A second
experiment is pre-equilibrated (``preequilibrate=True``): its y0 is the
algebraic steady state under basal parameters, with the IFT dy*/dp chained
into the trajectory sensitivities.

    python examples/jakstat_pulse.py [--cpu]
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


def build_project(seed=0, sigma=0.02):
    model = library.jak_stat()
    rng = np.random.default_rng(seed)
    t = np.linspace(2.0, 60.0, 15)
    p_true = {"k1": 2.5, "k2": 4.0, "k3": 0.3, "k4": 0.6, "tau": 6.0}

    # generate data THROUGH the piecewise machinery itself at a tight
    # tolerance (its SciPy parity is asserted by tests/test_events.py)
    pulse = ((5.0, "amp", 1.0), (25.0, "amp", 0.0))
    exps_gen = [
        Experiment("pulse", _placeholder_meas(t), inputs=pulse),
    ]
    batch_gen = ExperimentBatch.from_experiments(
        exps_gen, param_names=model.param_names)
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "k2", "k3", "k4"),
                               fixed={"amp": 0.0, "tau": 6.0})
    proj_gen = Project(model=model, pmap=pmap, batch=batch_gen,
                       config=SolverConfig(rtol=1e-10, atol=1e-12))
    theta_true = pmap.pack({k: p_true[k] for k in
                            ("k1", "k2", "k3", "k4")})
    # residuals against zero data with sigma=1 ARE the simulated values
    data = np.asarray(proj_gen.residuals(theta_true)).reshape(2, len(t))

    meas = tuple(
        Measurement(obs_index=i, times=t,
                    values=data[i] * (1 + rng.normal(scale=sigma,
                                                     size=len(t))),
                    sigmas=np.maximum(np.abs(data[i]) * sigma, 1e-3))
        for i in range(2))
    exps = [Experiment("pulse", meas, inputs=pulse)]
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-8, atol=1e-11))
    return proj, pmap, theta_true


def _placeholder_meas(t):
    return tuple(Measurement(obs_index=i, times=t, values=np.zeros(len(t)),
                             sigmas=np.ones(len(t))) for i in range(2))


def main():
    proj, pmap, theta_true = build_project()
    theta0 = theta_true + 0.7  # log-space offset start
    res = lm_fit(jax.jit(proj.residuals),
                 jax.jit(proj.residuals_and_jacobian), theta0,
                 FitConfig(max_iter=80))
    print(f"fit: status={int(res.status)} iters={int(res.n_iter)} "
          f"cost={float(res.cost):.3f}")
    for name, v_fit, v_true in zip(pmap.theta_names,
                                   np.exp(np.asarray(res.theta)),
                                   np.exp(np.asarray(theta_true))):
        print(f"  {name:>3s} = {v_fit:.4f}  (true {v_true:.4f})")


if __name__ == "__main__":
    main()
