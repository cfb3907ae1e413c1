"""Analytic optimal scale factors for relative measurements.

Reference capability (SURVEY.md §2 #6, BASELINE.json:10): relative data
(arbitrary units, e.g. Western blots) is matched to simulation through a
per-group scale factor B with a closed-form optimum for the weighted
least-squares inner problem::

    B_g = Σ_i (sim_i · data_i / σ_i²) / Σ_i (sim_i² / σ_i²)   over group g

and the Jacobian of the residuals needs ``dB/dp`` by the chain rule::

    dB = (Σ (dsim · data / σ²) − 2 B Σ (sim · dsim / σ²)) / Σ (sim² / σ²)

All sums are masked ``segment_sum`` over a static group-id array (group -1
= absolute data, B ≡ 1), pooled across the full experiment batch —
scale factors are project-level quantities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seg(x, group, n_groups):
    return jax.ops.segment_sum(x, group, num_segments=max(n_groups, 1),
                               indices_are_sorted=False)


def scale_factors(sim, data, inv_var, group, mask, n_groups):
    """Optimal B per group. All args flat (R,); returns (n_groups,).

    ``group`` entries are in [-1, n_groups); -1/masked entries contribute
    nothing (clipped index + zero weight).
    """
    w = jnp.where(mask & (group >= 0), inv_var, 0.0)
    g = jnp.clip(group, 0, None)
    num = _seg(w * sim * data, g, n_groups)
    den = _seg(w * sim * sim, g, n_groups)
    return num / jnp.where(den > 0, den, 1.0)


def scale_factors_and_grad(sim, dsim, data, inv_var, group, mask, n_groups):
    """B (n_groups,) and dB/dθ (n_groups, G) for ``dsim`` of shape (R, G)."""
    w = jnp.where(mask & (group >= 0), inv_var, 0.0)
    g = jnp.clip(group, 0, None)
    num = _seg(w * sim * data, g, n_groups)
    den = _seg(w * sim * sim, g, n_groups)
    den_safe = jnp.where(den > 0, den, 1.0)
    B = num / den_safe

    dnum = _seg(w[:, None] * dsim * data[:, None], g, n_groups)   # (Gp, G)
    dden = 2.0 * _seg(w[:, None] * dsim * sim[:, None], g, n_groups)
    dB = (dnum - B[:, None] * dden) / den_safe[:, None]
    return B, dB
