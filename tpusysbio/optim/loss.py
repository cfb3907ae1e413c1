"""Robust loss functions for TRF (scipy ``least_squares`` parity).

Spec: ``scipy/optimize/_lsq/least_squares.py`` (``construct_loss_function``,
the ``loss``/``f_scale`` arguments of the SURVEY §3.5 driver at
``least_squares.py:267``) and ``scipy/optimize/_lsq/common.py``
(``scale_for_robust_loss_function``). Semantics are identical:

- ``z = (r / f_scale)²``; robust cost ``0.5 · f_scale² · Σ ρ(z)``;
- per-iteration IRLS-style rescaling ``J_s = √(ρ' + 2 ρ'' z) · J``,
  ``r_s = ρ' / √(ρ' + 2 ρ'' z) · r`` so the scaled Gauss–Newton model
  carries the robust curvature (common.py's exact formula).

All four SciPy losses ship: ``huber``, ``soft_l1``, ``cauchy``,
``arctan`` (+ ``linear`` = plain least squares). Everything is
branchless ``jnp.where`` — one jit covers the whole fit, and the
transform vmaps over multi-start ensembles unchanged.

TPU note: ``z**1.5``-type powers lower to ``exp(1.5·log z)`` on this
runtime (0 → NaN; docs/PERFORMANCE.md hazards), so the Huber tail is
computed on ``max(z, 1)`` — exact, since the tail branch is selected
only for z > 1.
"""

from __future__ import annotations

import jax.numpy as jnp

LOSSES = ("linear", "huber", "soft_l1", "cauchy", "arctan")


def _rho(loss: str, z):
    """ρ(z), ρ'(z), ρ''(z) elementwise (scipy's IMPLEMENTED_LOSSES)."""
    if loss == "huber":
        zs = jnp.maximum(z, 1.0)          # tail branch only; avoids 0**1.5
        sq = jnp.sqrt(zs)
        tail = z > 1
        rho0 = jnp.where(tail, 2.0 * sq - 1.0, z)
        rho1 = jnp.where(tail, 1.0 / sq, 1.0)
        rho2 = jnp.where(tail, -0.5 / (zs * sq), 0.0)
    elif loss == "soft_l1":
        t = 1.0 + z
        sq = jnp.sqrt(t)
        rho0 = 2.0 * (sq - 1.0)
        rho1 = 1.0 / sq
        rho2 = -0.5 / (t * sq)
    elif loss == "cauchy":
        t = 1.0 + z
        rho0 = jnp.log1p(z)
        rho1 = 1.0 / t
        rho2 = -1.0 / (t * t)
    elif loss == "arctan":
        t = 1.0 + z * z
        rho0 = jnp.arctan(z)
        rho1 = 1.0 / t
        rho2 = -2.0 * z / (t * t)
    else:
        raise ValueError(f"unknown loss {loss!r}; expected one of {LOSSES}")
    return rho0, rho1, rho2


def make_loss(loss: str, f_scale: float):
    """Build ``(cost_fn, scale_fn)`` for a robust loss.

    ``cost_fn(r) -> scalar`` is the true robust cost; ``scale_fn(r, J)
    -> (r_s, J_s)`` rescales residuals/Jacobian so the downstream
    quadratic model matches the robust objective. ``loss='linear'``
    returns ``(None, None)`` — callers keep their plain-least-squares
    fast path untouched.
    """
    if loss == "linear":
        return None, None
    if loss not in LOSSES:
        raise ValueError(f"unknown loss {loss!r}; expected one of {LOSSES}")
    if f_scale <= 0:
        raise ValueError("f_scale must be positive")

    def cost_fn(r):
        z = (r / f_scale) ** 2
        rho0, _, _ = _rho(loss, z)
        return 0.5 * f_scale * f_scale * jnp.sum(rho0)

    def scale_fn(r, J):
        z = (r / f_scale) ** 2
        _, rho1, rho2 = _rho(loss, z)
        # common.py: J_scale = ρ' + 2 ρ'' z, floored at eps
        j_scale = jnp.maximum(rho1 + 2.0 * rho2 * z,
                              jnp.finfo(r.dtype).eps)
        root = jnp.sqrt(j_scale)
        return r * (rho1 / root), J * root[:, None]

    return cost_fn, scale_fn
