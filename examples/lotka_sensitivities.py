"""Config 2 (BASELINE.json:8): forward sensitivities vs finite differences.

Demonstrates ``simulate_sensitivities`` (jvp-propagated inside the BDF
stepper, including dy0/dp for the fitted initial conditions) and checks the
columns against central finite differences of the solver itself.

    python examples/lotka_sensitivities.py [--cpu]
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

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402


def main():
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    t_eval = jnp.linspace(0.0, 15.0, 16)
    cfg = SolverConfig(rtol=1e-8, atol=1e-11)

    res = model.simulate_sensitivities(p, (0.0, 15.0), t_eval, config=cfg)
    sens = np.asarray(res.sens)
    print(f"integration status={int(res.status)} steps={int(res.nsteps)}")

    @jax.jit
    def traj(pv):
        return model.simulate(pv, (0.0, 15.0), t_eval, config=cfg).ys

    eps = 1e-6
    worst = 0.0
    for k, name in enumerate(model.param_names):
        d = jnp.zeros_like(p).at[k].set(eps)
        fd = (np.asarray(traj(p + d)) - np.asarray(traj(p - d))) / (2 * eps)
        err = np.max(np.abs(sens[:, :, k] - fd)) / (1e-9 + np.max(np.abs(fd)))
        worst = max(worst, err)
        print(f"  d y/d {name:<3s}: max rel diff vs FD = {err:.2e}")
    print(f"worst column: {worst:.2e} (expect < 1e-4)")


if __name__ == "__main__":
    main()
