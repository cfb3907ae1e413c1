"""Parameter and scale-factor priors as least-squares rows.

The reference framework regularizes fits with log-normal priors on
parameters and on scale factors [R — SURVEY.md §0; the reference's
`Project` appends prior residuals to the measurement residuals so the
same Levenberg–Marquardt core minimizes data misfit + prior penalty].
The TPU-native form is identical mathematics with static shapes: a
``Priors`` spec contributes one row per θ entry and one row per
scale-factor group, weight 0 disabling a row (rows are always present —
the residual vector length never depends on values, so nothing
recompiles when priors change).

Math (θ is log-space, mapping.py):

- parameter prior, log-normal with median ``m`` and log-σ ``s``:
  row ``(θ_g − log m)/s``, Jacobian ``e_g/s`` — exactly a Gaussian in θ;
- scale-factor prior on group ``g`` (relative-data normalization B is the
  analytic optimum, scale_factors.py): row ``(log B_g − log m)/s`` with
  Jacobian ``(dB_g/dθ)/(B_g · s)``. B enters through the data, so this
  row is what keeps a fit from "explaining" bad parameters with an
  absurd normalization — the reference's main use of scale priors.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# B below this is treated as degenerate: the log-prior row saturates
# instead of producing -inf/NaN (masked members must never poison a
# vmapped batch — SURVEY.md §4 item 7).
_B_FLOOR = 1e-30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Priors:
    """Static-shape prior spec for a :class:`Project`.

    Build with :meth:`create`; fields are device arrays so a ``Priors``
    is a pytree leaf-holder (jit-stable across value changes).
    """

    theta_mu: jax.Array   # (G,) log-space prior means
    theta_w: jax.Array    # (G,) 1/σ weights; 0 ⇒ no prior on that entry
    scale_mu: jax.Array   # (n_groups,) log-space means
    scale_w: jax.Array    # (n_groups,) 1/σ; 0 ⇒ no prior on that group
    has_theta: bool = dataclasses.field(metadata=dict(static=True))
    has_scale: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        n = self.theta_mu.shape[0] if self.has_theta else 0
        return n + (self.scale_mu.shape[0] if self.has_scale else 0)

    @staticmethod
    def create(pmap, batch=None,
               params: Optional[Dict[str, Tuple[float, float]]] = None,
               scales: Optional[Dict[str, Tuple[float, float]]] = None,
               dtype=jnp.float64) -> "Priors":
        """Named priors → static spec.

        Args:
          pmap: the project's ``ParameterMap`` (for θ-entry names).
          batch: the project's ``ExperimentBatch`` (required when
            ``scales`` is given, for group names).
          params: ``{θ name: (median, log_sigma)}`` — log-normal priors
            in LINEAR space (median m, spread s in log units). A bare
            parameter name covers all its local ``name[e]`` entries.
          scales: ``{scale group name: (median, log_sigma)}``.
        """
        G = pmap.n_global
        t_mu = np.zeros(G)
        t_w = np.zeros(G)
        for name, (median, sigma) in (params or {}).items():
            if median <= 0 or sigma <= 0:
                raise ValueError(f"prior on {name!r}: median and sigma "
                                 "must be positive (log-normal)")
            idxs = [i for i, tn in enumerate(pmap.theta_names)
                    if tn == name or tn.split("[")[0] == name]
            if not idxs:
                raise KeyError(f"no θ entry named {name!r} "
                               f"(have {pmap.theta_names})")
            for i in idxs:
                t_mu[i] = np.log(median)
                t_w[i] = 1.0 / sigma

        n_groups = 0 if batch is None else batch.n_groups
        s_mu = np.zeros(max(n_groups, 1))
        s_w = np.zeros(max(n_groups, 1))
        for name, (median, sigma) in (scales or {}).items():
            if batch is None:
                raise ValueError("scale priors need the ExperimentBatch")
            if median <= 0 or sigma <= 0:
                raise ValueError(f"scale prior on {name!r}: median and "
                                 "sigma must be positive")
            if name not in batch.group_names:
                raise KeyError(f"no scale group named {name!r} "
                               f"(have {batch.group_names})")
            g = batch.group_names.index(name)
            s_mu[g] = np.log(median)
            s_w[g] = 1.0 / sigma

        return Priors(
            theta_mu=jnp.asarray(t_mu, dtype),
            theta_w=jnp.asarray(t_w, dtype),
            scale_mu=jnp.asarray(s_mu[:max(n_groups, 1)], dtype),
            scale_w=jnp.asarray(s_w[:max(n_groups, 1)], dtype),
            has_theta=bool(params),
            has_scale=bool(scales))

    # ------------------------------------------------------------------
    def rows(self, theta, B, dB=None):
        """Prior residual rows (and Jacobian rows when ``dB`` is given).

        Args:
          theta: (G,) current fit vector.
          B: (n_groups,) fitted scale factors (ignored unless has_scale).
          dB: (n_groups, G) scale-factor gradient, or None for
            residuals-only evaluation.

        Returns:
          ``(r_rows, J_rows)``; ``J_rows`` is None when ``dB`` is None.
        """
        r_parts = []
        j_parts = []
        with_jac = dB is not None
        if self.has_theta:
            r_parts.append(self.theta_w * (theta - self.theta_mu))
            if with_jac:
                j_parts.append(jnp.diag(self.theta_w))
        if self.has_scale:
            Bc = jnp.maximum(B.astype(theta.dtype), _B_FLOOR)
            r_parts.append(self.scale_w * (jnp.log(Bc) - self.scale_mu))
            if with_jac:
                j_parts.append(
                    (self.scale_w / Bc)[:, None] * dB.astype(theta.dtype))
        if not r_parts:
            z = jnp.zeros((0,), theta.dtype)
            return z, (jnp.zeros((0, theta.shape[0]), theta.dtype)
                       if with_jac else None)
        r = jnp.concatenate(r_parts)
        J = jnp.concatenate(j_parts, axis=0) if with_jac else None
        return r, J
