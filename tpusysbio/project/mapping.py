"""Global ↔ per-experiment parameter mapping in log space.

Reference capability (SURVEY.md §2 #5, BASELINE.json:10): a global
parameter vector θ holds shared parameters (one entry, used by every
experiment) and experiment-local parameters (one entry per experiment);
each experiment's full model-parameter vector is assembled from θ plus
per-experiment fixed values (condition settings / knockouts). Rate
constants are fitted in log space — positivity for free and
scale-invariant steps.

TPU-native design: the mapping is two static arrays — ``map_idx`` (E, P)
with the θ index feeding each model parameter (-1 -> fixed) and ``fixed``
(E, P) values — so assembly is one gather + ``where`` and the θ-Jacobian
chain rule is one one-hot matmul (SURVEY.md §2 #5 row): for
``p = exp(θ[idx])``, ``dp_i/dθ_g = p_i · [map_idx[i] == g]``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParameterMap:
    """θ (log-space, length G) -> per-experiment model parameters (E, P)."""

    map_idx: jax.Array   # (E, P) int32, -1 = fixed
    fixed: jax.Array     # (E, P) values used where map_idx < 0
    n_global: int = dataclasses.field(metadata=dict(static=True))
    theta_names: Tuple[str, ...] = dataclasses.field(
        metadata=dict(static=True), default=())

    @property
    def n_experiments(self) -> int:
        return self.map_idx.shape[0]

    @property
    def n_model_params(self) -> int:
        return self.map_idx.shape[1]

    def expand(self, theta: jax.Array) -> jax.Array:
        """θ -> (E, P) linear-space model parameters."""
        mapped = jnp.exp(theta)[jnp.clip(self.map_idx, 0, None)]
        return jnp.where(self.map_idx >= 0, mapped, self.fixed)

    def chain(self, theta: jax.Array) -> jax.Array:
        """d p_e / d θ as (E, P, G): the log-transform chain-rule factor.

        ``dp[e, i, g] = p[e, i] * [map_idx[e, i] == g]`` — applied to
        per-model-parameter Jacobians via one matmul per experiment.
        """
        p = self.expand(theta)
        onehot = jax.nn.one_hot(self.map_idx, self.n_global,
                                dtype=theta.dtype)  # (E, P, G); -1 -> 0 row
        return onehot * p[..., None]

    @staticmethod
    def create(param_names: Sequence[str], n_experiments: int,
               shared: Sequence[str] = (), local: Sequence[str] = (),
               fixed: Union[Dict[str, float], None] = None,
               grouped: Union[Dict[str, Sequence], None] = None,
               dtype=jnp.float64) -> "ParameterMap":
        """Build a map from name lists.

        ``shared``: one θ entry each; ``local``: E θ entries each (named
        ``"{name}[e]"``); ``grouped``: parameters shared across SUBSETS
        of experiments — ``{"k1": ["wt", "wt", "mut"]}`` (one label per
        experiment) fits one θ entry per distinct label, named
        ``"{name}[{label}]"`` (the reference's condition-group sharing:
        shared and local are the all-one-group / all-distinct special
        cases); everything else must appear in ``fixed`` (scalar or
        length-E sequence — per-experiment condition settings).
        """
        fixed = dict(fixed or {})
        grouped = dict(grouped or {})
        P = len(param_names)
        E = n_experiments
        map_idx = np.full((E, P), -1, dtype=np.int32)
        fixed_arr = np.zeros((E, P), dtype=np.float64)
        theta_names = []

        for name in shared:
            theta_names.append(name)
        local_base = len(theta_names)
        for name in local:
            for e in range(E):
                theta_names.append(f"{name}[{e}]")
        group_idx: Dict[str, list] = {}  # name -> per-experiment θ index
        for name, labels in grouped.items():
            if name in shared or name in local or name in fixed:
                raise ValueError(f"parameter {name!r} is grouped AND "
                                 "shared/local/fixed")
            labels = list(labels)
            if len(labels) != E:
                raise ValueError(
                    f"grouped[{name!r}] needs one label per experiment "
                    f"({E}), got {len(labels)}")
            idx_of = {}
            per_exp = []
            for lab in labels:
                if lab not in idx_of:
                    idx_of[lab] = len(theta_names)
                    theta_names.append(f"{name}[{lab}]")
                per_exp.append(idx_of[lab])
            group_idx[name] = per_exp

        for i, name in enumerate(param_names):
            if name in shared:
                map_idx[:, i] = shared.index(name)
            elif name in local:
                li = list(local).index(name)
                for e in range(E):
                    map_idx[e, i] = local_base + li * E + e
            elif name in group_idx:
                map_idx[:, i] = group_idx[name]
            elif name in fixed:
                v = fixed[name]
                v = np.broadcast_to(np.asarray(v, dtype=np.float64), (E,))
                fixed_arr[:, i] = v
            else:
                raise ValueError(f"parameter {name!r} is neither shared, "
                                 "local, grouped, nor fixed")

        return ParameterMap(
            map_idx=jnp.asarray(map_idx),
            fixed=jnp.asarray(fixed_arr, dtype),
            n_global=len(theta_names), theta_names=tuple(theta_names))

    def pack(self, values: Dict[str, float]) -> jax.Array:
        """Named linear-space values -> θ (log space)."""
        out = np.zeros(self.n_global)
        for i, name in enumerate(self.theta_names):
            base = name.split("[")[0]
            if name in values:
                out[i] = np.log(values[name])
            elif base in values:
                v = values[base]
                if np.ndim(v) > 0:
                    e = int(name.split("[")[1].rstrip("]"))
                    out[i] = np.log(v[e])
                else:
                    out[i] = np.log(v)
            else:
                raise KeyError(f"no value for θ entry {name!r}")
        return jnp.asarray(out, self.fixed.dtype)
