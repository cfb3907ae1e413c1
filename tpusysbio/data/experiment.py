"""Experiments and measurements as static-shape pytrees.

Reference capability (SURVEY.md §2 #3-#4): ``TimecourseMeasurement`` maps a
model observable to ``(t_i, value_i, sigma_i)`` data; ``Experiment`` groups
measurements with condition settings and local-parameter overrides;
experiments aggregate into a project (BASELINE.json:10).

TPU-native design: a ``Measurement`` row references its time by *index into
the experiment's t_eval grid* (the union of measurement times), so solver
output aligns to data by one static gather — no per-measurement integration
restarts (SURVEY.md §3.2). ``ExperimentBatch`` stacks E experiments into
padded (E, T)/(E, M) arrays with masks; condition settings/perturbations
(fixed inputs, knockouts) are expressed through the parameter map's
per-experiment fixed values (project/mapping.py), which subsumes the
reference's settings dicts.

Steady-state measurements (reference capability, SURVEY.md §2 #3) are
first-class: a ``Measurement`` with ``steady_state=True`` contributes rows
that gather from the experiment's algebraic equilibrium — solved directly
by ``solvers/steady_state.py`` (damped Newton + implicit-function-theorem
sensitivities) inside the Project residual path, never by integrating to a
long horizon.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Measurement:
    """One timecourse of one observable: host-side construction record."""

    obs_index: int                # which model observable
    times: np.ndarray             # (n_t,)
    values: np.ndarray            # (n_t,)
    sigmas: np.ndarray            # (n_t,) measurement std devs
    # scale-factor group: measurements sharing a group id share one fitted
    # scale factor B (relative data); None -> absolute data (B = 1).
    scale_group: Optional[str] = None
    # Steady-state rows: the observable is measured at the experiment's
    # algebraic equilibrium f(y*, p) = 0 rather than at a timepoint;
    # ``times`` entries are ignored (conventionally 0 or inf).
    steady_state: bool = False

    def __post_init__(self):
        t = np.asarray(self.times, dtype=np.float64)
        v = np.asarray(self.values, dtype=np.float64)
        s = np.asarray(self.sigmas, dtype=np.float64)
        if not (t.shape == v.shape == s.shape and t.ndim == 1):
            raise ValueError("times/values/sigmas must be equal-length 1-D")
        object.__setattr__(self, "times", t)
        object.__setattr__(self, "values", v)
        object.__setattr__(self, "sigmas", s)

    @staticmethod
    def at_steady_state(obs_index: int, value: float, sigma: float,
                        scale_group: Optional[str] = None) -> "Measurement":
        """Convenience constructor for one equilibrium data point."""
        return Measurement(obs_index=obs_index, times=np.zeros(1),
                           values=np.asarray([value]),
                           sigmas=np.asarray([sigma]),
                           scale_group=scale_group, steady_state=True)


@dataclasses.dataclass(frozen=True)
class Experiment:
    """Host-side experiment record: measurements + parameter overrides.

    ``fixed_params`` maps model-parameter name -> value, expressing the
    reference's condition settings (e.g. input dose, knockout -> rate 0).
    ``t0`` starts the integration; the horizon is the last measurement time.
    """

    name: str
    measurements: Tuple[Measurement, ...]
    fixed_params: dict = dataclasses.field(default_factory=dict)
    t0: float = 0.0

    def all_times(self) -> np.ndarray:
        ts = np.unique(np.concatenate(
            [m.times for m in self.measurements if not m.steady_state]
            + [np.asarray([self.t0])]))
        return ts


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ExperimentBatch:
    """E experiments padded to static shapes (device-side).

    Array fields (pytree leaves):
      t_eval:   (E, T) output-time grids, padded by repeating the last time
      t0:       (E,)
      t_end:    (E,)
      m_t_idx:  (E, M) int32 index into the experiment's t_eval row
      m_obs:    (E, M) int32 observable index
      values:   (E, M)
      sigmas:   (E, M)
      group:    (E, M) int32 scale-factor group id, -1 for absolute data
      mask:     (E, M) bool validity (padding rows are False)
      m_is_ss:  (E, M) bool — row gathers from the algebraic steady state
                instead of the trajectory (``m_t_idx`` is 0 there)

    ``n_groups`` (static) is the number of distinct scale-factor groups
    across the whole batch — scale factors are a *project-level* quantity
    (one B per group, pooled over experiments; SURVEY.md §2 #6).
    """

    t_eval: jax.Array
    t0: jax.Array
    t_end: jax.Array
    m_t_idx: jax.Array
    m_obs: jax.Array
    values: jax.Array
    sigmas: jax.Array
    group: jax.Array
    mask: jax.Array
    m_is_ss: jax.Array
    n_groups: int = dataclasses.field(metadata=dict(static=True))
    group_names: Tuple[str, ...] = dataclasses.field(
        metadata=dict(static=True), default=())
    # Static: whether ANY row is a steady-state row — gates the algebraic
    # equilibrium solve in the Project (zero cost for pure-timecourse
    # batches).
    has_steady: bool = dataclasses.field(
        metadata=dict(static=True), default=False)

    @property
    def n_experiments(self) -> int:
        return self.t_eval.shape[0]

    @property
    def n_times(self) -> int:
        return self.t_eval.shape[1]

    @property
    def n_meas(self) -> int:
        return self.m_t_idx.shape[1]

    @property
    def n_residuals(self) -> int:
        return self.n_experiments * self.n_meas

    @staticmethod
    def from_experiments(experiments: Sequence[Experiment],
                         dtype=jnp.float64) -> "ExperimentBatch":
        """Pad & pack host-side experiments into one static batch."""
        E = len(experiments)
        grids = [e.all_times() for e in experiments]
        T = max(g.shape[0] for g in grids)
        M = max(sum(m.times.shape[0] for m in e.measurements)
                for e in experiments)

        group_names: List[str] = []
        t_eval = np.zeros((E, T))
        t0 = np.zeros((E,))
        t_end = np.zeros((E,))
        m_t_idx = np.zeros((E, M), dtype=np.int32)
        m_obs = np.zeros((E, M), dtype=np.int32)
        values = np.zeros((E, M))
        sigmas = np.ones((E, M))
        group = np.full((E, M), -1, dtype=np.int32)
        mask = np.zeros((E, M), dtype=bool)
        m_is_ss = np.zeros((E, M), dtype=bool)

        for e_i, exp in enumerate(experiments):
            g = grids[e_i]
            t_eval[e_i, : g.shape[0]] = g
            t_eval[e_i, g.shape[0]:] = g[-1]
            t0[e_i] = exp.t0
            t_end[e_i] = g[-1]
            j = 0
            for meas in exp.measurements:
                if meas.scale_group is None:
                    gid = -1
                else:
                    if meas.scale_group not in group_names:
                        group_names.append(meas.scale_group)
                    gid = group_names.index(meas.scale_group)
                for t, v, s in zip(meas.times, meas.values, meas.sigmas):
                    if meas.steady_state:
                        m_t_idx[e_i, j] = 0
                        m_is_ss[e_i, j] = True
                    else:
                        t_idx = int(np.searchsorted(g, t))
                        assert g[t_idx] == t
                        m_t_idx[e_i, j] = t_idx
                    m_obs[e_i, j] = meas.obs_index
                    values[e_i, j] = v
                    sigmas[e_i, j] = s
                    group[e_i, j] = gid
                    mask[e_i, j] = True
                    j += 1

        return ExperimentBatch(
            t_eval=jnp.asarray(t_eval, dtype), t0=jnp.asarray(t0, dtype),
            t_end=jnp.asarray(t_end, dtype),
            m_t_idx=jnp.asarray(m_t_idx), m_obs=jnp.asarray(m_obs),
            values=jnp.asarray(values, dtype),
            sigmas=jnp.asarray(sigmas, dtype),
            group=jnp.asarray(group), mask=jnp.asarray(mask),
            m_is_ss=jnp.asarray(m_is_ss),
            n_groups=len(group_names), group_names=tuple(group_names),
            has_steady=bool(m_is_ss.any()))
