"""Measure the SciPy CPU baseline for the headline benchmark.

Runs the *reference path* for "stiff ODE + forward sensitivities": a SciPy
BDF integration of the explicitly augmented (n + n·m)-state MAPK-22 system
(what SysBio_Modeling does with its SymPy-generated augmented RHS —
SURVEY.md §3.3), exactly the configuration the TPU bench (bench.py) times.
Writes bench/baselines/cpu_baseline.json with provenance; bench.py reads it
to compute ``vs_baseline``.

Run on the CPU backend (this environment pre-imports jax, so the platform
must be forced via config):

    python -m bench.cpu_baseline
"""

from __future__ import annotations

import json
import os
import platform
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.integrate import solve_ivp  # noqa: E402

from tpusysbio.model import library  # noqa: E402

T_SPAN = (0.0, 100.0)
N_T = 41
RTOL, ATOL = 1e-6, 1e-9


def measure(repeats: int = 3) -> dict:
    model = library.mapk_huang_ferrell()
    p = jnp.asarray(library.mapk_true_params())
    n, m = model.n_states, model.n_params

    def aug_rhs_jax(t, z):
        y = z[:n]
        S = z[n:].reshape(n, m)
        fy = model.rhs(t, y, p)
        Jy = jax.jacfwd(lambda yy: model.rhs(t, yy, p))(y)
        Fp = jax.jacfwd(lambda pp: model.rhs(t, y, pp))(p)
        return jnp.concatenate([fy, (Jy @ S + Fp).reshape(-1)])

    aug = jax.jit(aug_rhs_jax)

    def f(t, z):
        return np.asarray(aug(t, jnp.asarray(z)))

    z0 = np.concatenate([np.asarray(model.y0(p)), np.zeros(n * m)])
    t_eval = np.linspace(*T_SPAN, N_T)
    # warm the jit
    f(0.0, z0)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sol = solve_ivp(f, T_SPAN, z0, method="BDF", rtol=RTOL, atol=ATOL,
                        t_eval=t_eval)
        assert sol.success
        times.append(time.perf_counter() - t0)

    best = min(times)
    return {
        "what": ("SciPy BDF, augmented MAPK-22 + 30-param forward "
                 "sensitivities (682 states), rtol=1e-6/atol=1e-9, "
                 "t in [0, 100], JAX-jitted RHS callback"),
        "seconds_per_integration": best,
        "integrations_per_sec": 1.0 / best,
        "cpu_count": os.cpu_count(),
        "platform": platform.platform(),
        "times": times,
    }


def main():
    out = measure()
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "baselines", "cpu_baseline.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
