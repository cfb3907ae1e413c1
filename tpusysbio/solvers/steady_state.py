"""Algebraic steady-state solve: f(y*, p) = 0 with sensitivities.

Reference capability (SURVEY.md §2 #3): steady-state measurements map a
model observable at equilibrium to data. The reference integrated to a
long horizon; here the equilibrium is found directly by a damped Newton
iteration on the RHS (reusing the in-house LU), seeded by a short coarse
integration for globalization, and the parameter sensitivities come from
the implicit function theorem::

    dy*/dp = −(∂f/∂y)⁻¹ (∂f/∂p)

— one linear solve against the converged Jacobian, no augmented
integration at all (cheaper and exact; the TPU-native answer to CVODES'
steady-state sensitivity mode).

Conservation laws make pathway Jacobians singular at equilibrium
(continuum of steady states); the caller should eliminate conserved
moieties in the model (as the library models do) or accept the
pseudo-solve the guarded LU produces.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpusysbio.config import SolverConfig
from tpusysbio.linalg import lu as _lu
from tpusysbio.solvers.bdf import bdf_solve
from tpusysbio.solvers.common import rms_norm


class SteadyStateResult(NamedTuple):
    y: jax.Array           # (n,) steady state
    sens: jax.Array        # (n, m) dy*/dp (zeros if not requested)
    residual_norm: jax.Array
    converged: jax.Array
    n_newton: jax.Array


def steady_state(
    rhs: Callable,                 # f(t, y, p) -> (n,)
    p: jax.Array,
    y0: jax.Array,
    config: SolverConfig = SolverConfig(),
    t_relax: float = 10.0,
    max_newton: int = 25,
    tol: float = 1e-10,
    with_sens: bool = False,
    jac_fn: Callable = None,
) -> SteadyStateResult:
    """Find y* with f(y*, p) = 0 near the attractor of y0.

    ``t_relax``: coarse pre-integration horizon that moves y0 into the
    Newton basin (rtol 1e-3 BDF pass). Set 0.0 to skip.
    ``jac_fn``: optional closed-form state Jacobian ``(t, y, p) -> (n, n)``
    (the mass-action fast path); forward-mode AD otherwise.
    """
    dtype = y0.dtype
    n = y0.shape[0]

    def f(y):
        return rhs(jnp.zeros((), dtype), y, p)

    if jac_fn is None:
        def jac(y):
            return jax.jacfwd(f)(y)
    else:
        def jac(y):
            return jac_fn(jnp.zeros((), dtype), y, p)

    if t_relax > 0.0:
        coarse = SolverConfig(rtol=1e-3, atol=1e-6,
                              max_steps=config.max_steps,
                              linear_solver=config.linear_solver)
        res = bdf_solve(lambda t, y: rhs(t, y, p), (0.0, t_relax), y0,
                        jnp.asarray([t_relax], dtype), config=coarse,
                        jac=(None if jac_fn is None
                             else (lambda t, y: jac_fn(t, y, p))))
        y_start = res.ys[0]
    else:
        y_start = y0

    scale = config.atol + jnp.abs(y_start) * config.rtol

    def body(carry):
        y, it, done = carry
        J = jac(y)
        fv = f(y)
        step = _lu.lu_solve(_lu.lu_factor(J), -fv)
        # damped update: halve until the residual norm does not explode
        def try_alpha(alpha):
            y_new = y + alpha * step
            return y_new, rms_norm(f(y_new) / scale)

        y1, r1 = try_alpha(jnp.asarray(1.0, dtype))
        y2, r2 = try_alpha(jnp.asarray(0.5, dtype))
        y3, r3 = try_alpha(jnp.asarray(0.25, dtype))
        r0 = rms_norm(fv / scale)
        best = jnp.argmin(jnp.stack([r1, r2, r3]))
        y_new = jnp.stack([y1, y2, y3])[best]
        r_new = jnp.stack([r1, r2, r3])[best]
        improved = jnp.isfinite(r_new) & (r_new < r0)
        y_next = jnp.where(improved, y_new, y)
        done_new = (r_new < tol) | ~improved
        return y_next, it + 1, done | done_new

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < max_newton)

    y_fin, n_it, _ = lax.while_loop(
        cond, body, (y_start, jnp.asarray(0, jnp.int32),
                     jnp.asarray(False)))
    r_fin = rms_norm(f(y_fin) / scale)
    converged = r_fin < jnp.asarray(tol * 10, dtype)

    if with_sens:
        m = p.shape[0]
        J = jac(y_fin)
        Fp = jax.jacfwd(lambda pp: rhs(jnp.zeros((), dtype), y_fin, pp))(p)
        sens = _lu.lu_solve(_lu.lu_factor(J), -Fp)
    else:
        m = p.shape[0]
        sens = jnp.zeros((n, m), dtype)

    return SteadyStateResult(y=y_fin, sens=sens, residual_norm=r_fin,
                             converged=converged, n_newton=n_it)
