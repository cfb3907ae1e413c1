"""Measure the SciPy CPU baseline for the headline benchmark — honestly.

The reference's *production* integration path is Fortran LSODA via
``scipy.integrate.odeint`` (``scipy/integrate/_odepack_py.py:252``), NOT the
Python ``solve_ivp(method='BDF')`` spec. This script measures BOTH on the
same workload — the explicitly augmented (n + n·m)-state MAPK-22 system
(what SysBio_Modeling runs with its SymPy-generated augmented RHS,
SURVEY.md §3.3) — and records the FASTEST SciPy variant as the baseline, so
the TPU speedup claim is made against the strongest CPU number:

  1. ``odeint`` (Fortran LSODA), internal finite-difference Jacobian — the
     typical reference configuration;
  2. ``odeint`` with an analytic (jitted ``jax.jacfwd``) full augmented
     Jacobian — generous to the reference (its codegen supplied analytic
     Jacobians for the state system only);
  3. ``solve_ivp(method='BDF')`` — the line-citable Python spec the
     solvers were verified against.

The ``cpu_count`` field records how many cores the measurement actually
used (this host: 1). The ≥100×-vs-32-core target (BASELINE.json:5) is then
an EXPLICIT 32× extrapolation of this single-core number — multi-start is
embarrassingly parallel so linear scaling is the reference's best case.

Run on the CPU backend:  python -m bench.cpu_baseline
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
from scipy.integrate import odeint, solve_ivp  # noqa: E402

from tpusysbio.model import library  # noqa: E402

T_SPAN = (0.0, 100.0)
N_T = 41
RTOL, ATOL = 1e-6, 1e-9


def _build():
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
    aug_jac = jax.jit(jax.jacfwd(aug_rhs_jax, argnums=1))
    z0 = np.concatenate([np.asarray(model.y0(p)), np.zeros(n * m)])
    return aug, aug_jac, z0


def _time(fn, repeats):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return times


def measure(repeats: int = 3) -> dict:
    aug, aug_jac, z0 = _build()
    t_eval = np.linspace(*T_SPAN, N_T)

    def f_ode(z, t):
        return np.asarray(aug(t, jnp.asarray(z)))

    def jac_ode(z, t):
        return np.asarray(aug_jac(t, jnp.asarray(z)))

    def f_ivp(t, z):
        return np.asarray(aug(t, jnp.asarray(z)))

    # warm the jits
    f_ode(z0, 0.0)
    jac_ode(z0, 0.0)

    def run_odeint_fd():
        out, info = odeint(f_ode, z0, t_eval, rtol=RTOL, atol=ATOL,
                           full_output=True)
        assert info["message"] == "Integration successful."
        return out

    def run_odeint_dfun():
        out, info = odeint(f_ode, z0, t_eval, Dfun=jac_ode, rtol=RTOL,
                           atol=ATOL, full_output=True)
        assert info["message"] == "Integration successful."
        return out

    def run_bdf():
        sol = solve_ivp(f_ivp, T_SPAN, z0, method="BDF", rtol=RTOL,
                        atol=ATOL, t_eval=t_eval)
        assert sol.success
        return sol

    variants = {
        "odeint_lsoda_fd_jac": _time(run_odeint_fd, repeats),
        "odeint_lsoda_analytic_jac": _time(run_odeint_dfun, repeats),
        "solve_ivp_bdf": _time(run_bdf, repeats),
    }
    bests = {k: min(v) for k, v in variants.items()}
    fastest = min(bests, key=bests.get)
    best = bests[fastest]
    return {
        "what": ("SciPy on the augmented MAPK-22 + 30-param forward-"
                 "sensitivity system (682 states), rtol=1e-6/atol=1e-9, "
                 "t in [0, 100], JAX-jitted RHS callback; baseline = "
                 "fastest SciPy variant (reference production path is "
                 "Fortran LSODA via odeint, "
                 "scipy/integrate/_odepack_py.py:252)"),
        "baseline_variant": fastest,
        "seconds_per_integration": best,
        "integrations_per_sec": 1.0 / best,
        "variants_best_seconds": bests,
        "variants_times": variants,
        "cpu_count": os.cpu_count(),
        "note_32core": ("the >=100x-vs-32-core comparison divides the TPU "
                        "rate by 32x this single-core rate (ideal-scaling "
                        "extrapolation; multi-start is embarrassingly "
                        "parallel)"),
        "platform": platform.platform(),
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
