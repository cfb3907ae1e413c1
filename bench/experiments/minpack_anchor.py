"""Reproduce the MINPACK anchor cost for the headline problem.

Runs scipy.optimize.leastsq (Fortran MINPACK lmder,
scipy/optimize/_minpack_py.py:439-449) on the EXACT headline objective
(bench/fits_bench.build_problem: 12-free-param MAPK-22, seed-0 data) with
our analytic sensitivity Jacobians, from the true parameters. The
converged cost is the ``MINPACK_ANCHOR_COST`` asserted by
bench/headline_bench.py: the headline's best polished cost must match it
to 1e-3 (it usually descends below — see docs/PERFORMANCE.md "LM
termination semantics").

    JAX_PLATFORMS=cpu python -m bench.experiments.minpack_anchor
"""

from __future__ import annotations

import json

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from scipy.optimize import leastsq

    from bench.fits_bench import build_problem

    proj, theta_true = build_problem()
    res_j = jax.jit(proj.residuals)
    rj_j = jax.jit(proj.residuals_and_jacobian)

    def fun(th):
        return np.asarray(res_j(jnp.asarray(th)))

    def jac(th):
        return np.asarray(rj_j(jnp.asarray(th))[1])

    x, cov_x, info, msg, ier = leastsq(
        fun, np.asarray(theta_true), Dfun=jac, full_output=True)
    cost = 0.5 * float(np.sum(info["fvec"] ** 2))
    print(json.dumps({
        "minpack_cost": round(cost, 4), "ier": int(ier),
        "nfev": int(info["nfev"]), "message": msg,
    }))


if __name__ == "__main__":
    main()
