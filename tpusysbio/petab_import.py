"""PEtab problem import (the domain's standard fitting-problem format).

PEtab (https://petab.readthedocs.io, v1) bundles an SBML model with TSV
tables — conditions, observables, measurements, parameters — into a
complete parameter-estimation problem. It is how this domain ships
benchmark problems today (the successor workflow to the reference's
hand-built projects), and every ingredient already exists natively here:
``model.from_sbml``, ``data.Experiment``/``ExperimentBatch``,
``project.ParameterMap``/``Priors``, and bounded ``optim.trf_fit``. This
module is the glue.

Supported subset (raise, never mis-fit, outside it):

- problem YAML (format_version 1) or the table paths passed directly;
- condition table: numeric overrides of model PARAMETERS per condition
  (species/compartment overrides unsupported);
- observable table: ``observableFormula`` over model states/parameters
  (SymPy-parsed; ``observableParameters`` placeholders unsupported),
  ``observableTransformation`` ``lin``, ``noiseDistribution`` ``normal``
  (the defaults), ``noiseFormula`` a number or a parameter id;
- measurement table: ``observableId, simulationConditionId, time,
  measurement`` (+ optional numeric ``noiseParameters`` per row,
  ``preequilibrationConditionId`` → native pre-equilibration,
  ``time = inf`` → native steady-state rows);
- parameter table: ``parameterScale`` ``lin``/``log``/``log10`` (bounds
  and nominals converted to the fit's natural-log θ), ``estimate`` 0/1,
  priors ``objectivePriorType`` ∈ {``parameterScaleNormal``,
  ``normal``, ``logNormal``} → native :class:`tpusysbio.project.Priors`.

Returns a :class:`PetabProblem` whose pieces drop straight into the
normal fitting pipeline (`problem.project.residuals`, `trf_fit` with
``problem.lb/ub``, multistart over ``problem.sample_startpoints``).
"""

from __future__ import annotations

import csv
import dataclasses
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpusysbio.config import SolverConfig


class PetabError(ValueError):
    pass


def _read_tsv(path: str) -> List[dict]:
    with open(path, newline="") as fh:
        rows = list(csv.DictReader(fh, delimiter="\t"))
    if not rows:
        raise PetabError(f"empty PEtab table: {path}")
    return rows


def _get(row: dict, key: str, default=None):
    v = row.get(key)
    return default if v is None or v == "" else v


@dataclasses.dataclass(frozen=True)
class PetabProblem:
    """A loaded PEtab problem, assembled into native objects.

    Attributes:
      model: ``OdeModel`` with the PEtab observables installed.
      batch: one experiment per simulation condition (measurement
        grids padded/masked).
      pmap: estimated parameters shared across conditions; condition
        overrides and non-estimated parameters fixed.
      priors: native ``Priors`` (None when the table declares none).
      project: ready-to-fit ``Project``.
      theta0: nominal values in θ (natural log) space.
      lb / ub: bounds in θ space for ``trf_fit``.
      x_ids: estimated parameter ids, θ order.
    """

    model: object
    batch: object
    pmap: object
    priors: Optional[object]
    project: object
    theta0: np.ndarray
    lb: np.ndarray
    ub: np.ndarray
    x_ids: Tuple[str, ...]

    def sample_startpoints(self, key, n: int):
        """Latin-hypercube starts inside the PEtab bounds (θ space)."""
        from tpusysbio.fit import latin_hypercube
        import jax.numpy as jnp

        return latin_hypercube(key, n, jnp.asarray(self.lb),
                               jnp.asarray(self.ub))


def _to_theta(val: float) -> float:
    """PEtab linear-scale value (nominal/bounds are ALWAYS linear in
    PEtab v1) → this package's natural-log θ."""
    if val <= 0:
        raise PetabError(
            f"linear value {val} <= 0: the fit vector is log-space "
            "(positivity is structural)")
    return math.log(val)


def from_petab(source, config: Optional[SolverConfig] = None,
               ) -> PetabProblem:
    """Load a PEtab problem.

    Args:
      source: path to the problem YAML, or a dict with keys
        ``sbml``/``conditions``/``observables``/``measurements``/
        ``parameters`` mapping to file paths.
      config: solver config for the assembled ``Project``.
    """
    import sympy as sp
    import jax.numpy as jnp

    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.model.sbml_import import from_sbml
    from tpusysbio.project import ParameterMap, Priors, Project

    if isinstance(source, str):
        import yaml

        base = os.path.dirname(os.path.abspath(source))
        with open(source) as fh:
            doc = yaml.safe_load(fh)
        probs = doc.get("problems")
        if not probs or len(probs) != 1:
            raise PetabError("need exactly one entry in problems[]")
        pr = probs[0]

        def one(key):
            files = pr.get(key) or []
            if len(files) != 1:
                raise PetabError(f"need exactly one file in {key}")
            return os.path.join(base, files[0])

        paths = {
            "sbml": one("sbml_files"),
            "conditions": one("condition_files"),
            "observables": one("observable_files"),
            "measurements": one("measurement_files"),
            "parameters": os.path.join(base, doc["parameter_file"]),
        }
    else:
        paths = dict(source)

    model, p_nominal_sbml = from_sbml(paths["sbml"])
    pnames = list(model.param_names)
    sbml_defaults = dict(zip(pnames, p_nominal_sbml))

    # ---- parameter table -------------------------------------------------
    par_rows = _read_tsv(paths["parameters"])
    estimated: List[str] = []
    theta0, lb, ub = [], [], []
    fixed_vals: Dict[str, float] = {}
    prior_spec: Dict[str, Tuple[float, float]] = {}
    for row in par_rows:
        pid = _get(row, "parameterId")
        if pid is None:
            raise PetabError("parameter row without parameterId")
        scale = _get(row, "parameterScale", "lin")
        if scale not in ("lin", "log", "log10"):
            raise PetabError(f"unknown parameterScale {scale!r}")
        nominal = _get(row, "nominalValue")
        if int(_get(row, "estimate", 1)) == 1:
            if pid not in pnames:
                raise PetabError(
                    f"estimated parameter {pid!r} is not a model "
                    f"parameter (observableParameters-style ids are "
                    "not supported)")
            estimated.append(pid)
            theta0.append(_to_theta(float(nominal))
                          if nominal is not None else 0.0)
            lo, hi = _get(row, "lowerBound"), _get(row, "upperBound")
            if lo is None or hi is None:
                raise PetabError(f"estimated {pid!r} needs bounds")
            lb.append(_to_theta(float(lo)))
            ub.append(_to_theta(float(hi)))
            pt = _get(row, "objectivePriorType")
            if pt:
                pp = _get(row, "objectivePriorParameters")
                if pp is None:
                    raise PetabError(f"prior on {pid!r} without "
                                     "objectivePriorParameters")
                a, b = (float(v) for v in str(pp).split(";"))
                if pt == "parameterScaleNormal":
                    # prior on the PEtab-scale value; convert to ln
                    if scale == "log10":
                        mu, sig = a * math.log(10.0), b * math.log(10.0)
                    elif scale == "log":
                        mu, sig = a, b
                    else:
                        raise PetabError(
                            "parameterScaleNormal with lin scale is a "
                            "Gaussian on the linear value — not "
                            "expressible as a log-space row")
                elif pt in ("logNormal", "normal"):
                    if pt == "normal":
                        # approximate: Normal(a, b) on the linear value;
                        # refuse rather than silently mis-weight
                        raise PetabError(
                            "objectivePriorType 'normal' (linear-space "
                            "Gaussian) is unsupported; use logNormal or "
                            "parameterScaleNormal")
                    mu, sig = a, b  # logNormal: a = mean of ln, b = sd
                else:
                    raise PetabError(f"unsupported prior type {pt!r}")
                prior_spec[pid] = (math.exp(mu), sig)
        else:
            if nominal is None:
                raise PetabError(f"non-estimated {pid!r} needs a "
                                 "nominalValue")
            fixed_vals[pid] = float(nominal)

    # ---- observable table -----------------------------------------------
    obs_rows = _read_tsv(paths["observables"])
    state_syms = [sp.Symbol(s) for s in model.state_names]
    param_syms = [sp.Symbol(s) for s in pnames]
    sym_table = {str(s): s for s in state_syms + param_syms}
    obs_ids: List[str] = []
    obs_exprs: List[sp.Expr] = []
    noise_default: Dict[str, object] = {}
    for row in obs_rows:
        oid = _get(row, "observableId")
        if oid is None:
            raise PetabError("observable row without observableId")
        if _get(row, "observableTransformation", "lin") != "lin":
            raise PetabError(f"{oid}: only observableTransformation="
                             "lin is supported")
        if _get(row, "noiseDistribution", "normal") != "normal":
            raise PetabError(f"{oid}: only normal noise is supported")
        formula = _get(row, "observableFormula")
        if formula is None:
            raise PetabError(f"{oid}: missing observableFormula")
        try:
            expr = sp.sympify(formula, locals=dict(sym_table))
        except Exception as e:  # pragma: no cover - sympy message varies
            raise PetabError(f"{oid}: cannot parse observableFormula "
                             f"{formula!r}: {e}")
        extra = expr.free_symbols - set(state_syms) - set(param_syms)
        if extra:
            raise PetabError(
                f"{oid}: formula references unknown symbols "
                f"{sorted(map(str, extra))} (observableParameters "
                "placeholders are not supported)")
        obs_ids.append(oid)
        obs_exprs.append(expr)
        nf = _get(row, "noiseFormula", "1.0")
        try:
            noise_default[oid] = float(nf)
        except ValueError:
            if nf in fixed_vals:
                noise_default[oid] = float(fixed_vals[nf])
            else:
                raise PetabError(
                    f"{oid}: noiseFormula {nf!r} must be numeric or a "
                    "non-estimated parameter id (noise estimation is "
                    "not supported)")

    # install PEtab observables on the model
    obs_fn = sp.lambdify((state_syms, param_syms), obs_exprs,
                         modules=[{"ImmutableDenseMatrix": jnp.array}, jnp])

    def observables(y, p):
        return jnp.stack([jnp.asarray(v, y.dtype)
                          for v in obs_fn(list(y), list(p))])

    model = dataclasses.replace(model, observables=observables,
                                n_obs=len(obs_ids))

    # ---- condition table --------------------------------------------------
    cond_rows = _read_tsv(paths["conditions"])
    conditions: Dict[str, Dict[str, float]] = {}
    cond_order: List[str] = []
    for row in cond_rows:
        cid = _get(row, "conditionId")
        if cid is None:
            raise PetabError("condition row without conditionId")
        over = {}
        for col, val in row.items():
            if col in ("conditionId", "conditionName") or val in (None, ""):
                continue
            if col not in pnames:
                raise PetabError(
                    f"condition {cid!r} overrides {col!r}, which is not "
                    "a model parameter (species/compartment overrides "
                    "are not supported)")
            if col in estimated:
                raise PetabError(
                    f"condition {cid!r} overrides estimated parameter "
                    f"{col!r} (condition-specific estimation is not "
                    "supported)")
            over[col] = float(val)
        conditions[cid] = over
        cond_order.append(cid)

    # ---- measurement table -------------------------------------------------
    meas_rows = _read_tsv(paths["measurements"])
    used_conditions: List[str] = []
    preeq_of: Dict[str, Optional[str]] = {}
    series: Dict[tuple, dict] = {}
    for row in meas_rows:
        oid = _get(row, "observableId")
        cid = _get(row, "simulationConditionId")
        if oid not in obs_ids:
            raise PetabError(f"measurement references unknown "
                             f"observable {oid!r}")
        if cid not in conditions:
            raise PetabError(f"measurement references unknown "
                             f"condition {cid!r}")
        pre = _get(row, "preequilibrationConditionId")
        if pre is not None and pre not in conditions:
            raise PetabError(f"unknown preequilibration condition {pre!r}")
        if cid not in used_conditions:
            used_conditions.append(cid)
            preeq_of[cid] = pre
        elif preeq_of[cid] != pre:
            raise PetabError(
                f"condition {cid!r} has measurements with different "
                "preequilibration conditions")
        t = float(_get(row, "time"))
        noise = _get(row, "noiseParameters")
        sigma = float(noise) if noise is not None else noise_default[oid]
        key = (cid, oid, math.isinf(t))
        rec = series.setdefault(key, {"t": [], "v": [], "s": []})
        rec["t"].append(t)
        rec["v"].append(float(_get(row, "measurement")))
        rec["s"].append(float(sigma))

    experiments = []
    for cid in used_conditions:
        meas = []
        for (c, oid, is_ss), rec in series.items():
            if c != cid:
                continue
            order = np.argsort(rec["t"], kind="stable")
            times = np.asarray(rec["t"])[order]
            if is_ss:
                times = np.zeros_like(times)
            meas.append(Measurement(
                obs_index=obs_ids.index(oid), times=times,
                values=np.asarray(rec["v"])[order],
                sigmas=np.asarray(rec["s"])[order],
                steady_state=bool(is_ss)))
        pre = preeq_of[cid]
        experiments.append(Experiment(
            cid, tuple(meas), preequilibrate=pre is not None,
            preeq_params=dict(conditions[pre]) if pre else {}))
    if not experiments:
        raise PetabError("no measurements")

    # ---- parameter map -----------------------------------------------------
    E = len(used_conditions)
    fixed_map: Dict[str, list] = {}
    for name in pnames:
        if name in estimated:
            continue
        per_exp = []
        for cid in used_conditions:
            if name in conditions[cid]:
                per_exp.append(conditions[cid][name])
            elif name in fixed_vals:
                per_exp.append(fixed_vals[name])
            elif name in sbml_defaults:
                per_exp.append(float(sbml_defaults[name]))
            else:  # pragma: no cover - sbml always supplies a value
                raise PetabError(f"no value for fixed parameter {name!r}")
        fixed_map[name] = per_exp

    pmap = ParameterMap.create(pnames, E, shared=tuple(estimated),
                               fixed=fixed_map)
    batch = ExperimentBatch.from_experiments(experiments,
                                             param_names=pnames)

    priors = None
    if prior_spec:
        priors = Priors.create(pmap, batch, params=prior_spec)

    project = Project(model=model, pmap=pmap, batch=batch,
                      config=config or SolverConfig(), priors=priors)
    return PetabProblem(
        model=model, batch=batch, pmap=pmap, priors=priors,
        project=project, theta0=np.asarray(theta0), lb=np.asarray(lb),
        ub=np.asarray(ub), x_ids=tuple(estimated))
