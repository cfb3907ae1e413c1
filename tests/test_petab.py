"""PEtab problem import (petab_import.py): tables → native objects."""

import math
import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.model import library
from tpusysbio.optim import trf_fit
from tpusysbio.petab_import import PetabError, from_petab

MM_SBML_PATH = None  # filled per test via tmp_path


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text).lstrip())
    return str(p)


def _mm_sbml(tmp_path):
    import re
    src = open(os.path.join(os.path.dirname(__file__),
                            "test_sbml.py")).read()
    body = re.search(r'MM_SBML = """(.*?)"""', src, re.S).group(1)
    return _write(tmp_path, "model.xml", body)


def _make_problem(tmp_path, prior_line=True):
    model = library.michaelis_menten()
    # early samples resolve the fast binding transient — k1 is only
    # identifiable through it (later samples see the quasi-equilibrium)
    t = np.asarray([0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 2.0, 4.0, 6.0])
    rows = ["observableId\tsimulationConditionId\tmeasurement\ttime"]
    rng = np.random.default_rng(0)
    for cid, e0 in (("c_lo", 0.2), ("c_hi", 0.6)):
        p = jnp.asarray([30.0, 10.0, 5.0, e0])
        res = model.simulate(p, (0.0, 6.0), jnp.asarray(t),
                             config=SolverConfig(rtol=1e-9, atol=1e-11))
        prod = np.asarray(res.ys)[:, 2] + rng.normal(0, 0.01, len(t))
        total = (np.asarray(res.ys)[:, 0] + np.asarray(res.ys)[:, 1]
                 + rng.normal(0, 0.01, len(t)))
        for ti, v in zip(t, prod):
            rows.append(f"obs_p\t{cid}\t{v:.6f}\t{ti}")
        for ti, v in zip(t, total):
            rows.append(f"obs_total\t{cid}\t{v:.6f}\t{ti}")

    sbml = _mm_sbml(tmp_path)
    cond = _write(tmp_path, "conditions.tsv", """
        conditionId\tE0
        c_lo\t0.2
        c_hi\t0.6
    """)
    obs = _write(tmp_path, "observables.tsv", """
        observableId\tobservableFormula\tnoiseFormula
        obs_p\tP\t0.01
        obs_total\tS + C\t0.01
    """)
    meas = _write(tmp_path, "measurements.tsv", "\n".join(rows) + "\n")
    prior = ("\tobjectivePriorType\tobjectivePriorParameters" if prior_line
             else "")
    prior_val = ("\tlogNormal\t" + f"{math.log(30.0)};0.2"
                 if prior_line else "")
    pad = "\t\t" if prior_line else ""
    params = _write(tmp_path, "parameters.tsv", f"""
        parameterId\tparameterScale\tlowerBound\tupperBound\tnominalValue\testimate{prior}
        k1\tlog10\t1\t100\t20\t1{prior_val}
        km1\tlog10\t0.1\t100\t5\t1{pad}
        k2\tlog10\t0.1\t50\t2\t1{pad}
        E0\tlin\t\t\t0.2\t0{pad}
    """)
    yaml_path = _write(tmp_path, "problem.yaml", f"""
        format_version: 1
        parameter_file: parameters.tsv
        problems:
          - sbml_files: [model.xml]
            condition_files: [conditions.tsv]
            observable_files: [observables.tsv]
            measurement_files: [measurements.tsv]
    """)
    return yaml_path


def test_petab_loads_and_assembles(tmp_path):
    prob = from_petab(_make_problem(tmp_path),
                      config=SolverConfig(rtol=1e-7, atol=1e-9))
    assert prob.x_ids == ("k1", "km1", "k2")
    np.testing.assert_allclose(prob.theta0,
                               np.log([20.0, 5.0, 2.0]), rtol=1e-12)
    np.testing.assert_allclose(prob.lb, np.log([1.0, 0.1, 0.1]))
    np.testing.assert_allclose(prob.ub, np.log([100.0, 100.0, 50.0]))
    # two conditions -> two experiments; E0 fixed per-condition
    assert prob.batch.t_eval.shape[0] == 2
    p_all = np.asarray(prob.pmap.expand(jnp.asarray(prob.theta0)))
    np.testing.assert_allclose(p_all[:, 3], [0.2, 0.6])
    # PEtab observables installed: obs_total = S + C
    y = jnp.asarray([0.5, 0.2, 0.3])
    p = jnp.asarray([30.0, 10.0, 5.0, 0.2])
    np.testing.assert_allclose(
        np.asarray(prob.model.observables(y, p)), [0.3, 0.7], rtol=1e-14)
    # prior row present (k1 logNormal)
    assert prob.priors is not None
    assert prob.project.n_residuals == prob.batch.n_residuals + 3
    r = prob.project.residuals(jnp.asarray(prob.theta0))
    assert bool(jnp.all(jnp.isfinite(r)))


def test_petab_fit_recovers_truth(tmp_path):
    prob = from_petab(_make_problem(tmp_path, prior_line=False),
                      config=SolverConfig(rtol=1e-7, atol=1e-9))
    assert prob.priors is None
    fit = jax.jit(lambda th: trf_fit(
        prob.project.residuals, prob.project.residuals_and_jacobian,
        th, jnp.asarray(prob.lb), jnp.asarray(prob.ub),
        FitConfig(max_iter=60)))(jnp.asarray(prob.theta0))
    assert int(fit.status) > 0
    fitted = dict(zip(prob.x_ids, np.exp(np.asarray(fit.theta))))
    # the optimum must beat the truth (noise realization) and recover
    # the identifiable quantities: Kd = km1/k1 and kcat = k2 (k1 and km1
    # individually drift along the Kd degeneracy direction)
    theta_true = jnp.log(jnp.asarray([30.0, 10.0, 5.0]))
    assert float(fit.cost) <= float(
        jax.jit(prob.project.cost)(theta_true)) + 1e-9
    np.testing.assert_allclose(fitted["km1"] / fitted["k1"], 10.0 / 30.0,
                               rtol=0.25)
    np.testing.assert_allclose(fitted["k2"], 5.0, rtol=0.15)
    # bounds respected
    assert np.all(np.asarray(fit.theta) <= prob.ub + 1e-12)
    assert np.all(np.asarray(fit.theta) >= prob.lb - 1e-12)


def test_petab_validation_errors(tmp_path):
    yaml_path = _make_problem(tmp_path)
    base = os.path.dirname(yaml_path)

    obs_bad = os.path.join(base, "observables.tsv")
    good = open(obs_bad).read()
    open(obs_bad, "w").write(good.replace("S + C", "S + nope"))
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(obs_bad, "w").write(
        good.replace("observableFormula\tnoiseFormula",
                     "observableFormula\tnoiseDistribution\tnoiseFormula")
        .replace("P\t0.01", "P\tlaplace\t0.01")
        .replace("S + C\t0.01", "S + C\tnormal\t0.01"))
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(obs_bad, "w").write(good)

    cond_bad = os.path.join(base, "conditions.tsv")
    goodc = open(cond_bad).read()
    open(cond_bad, "w").write(goodc.replace("E0", "k1"))
    with pytest.raises(PetabError):  # overriding an ESTIMATED parameter
        from_petab(yaml_path)
    open(cond_bad, "w").write(goodc)

    par_bad = os.path.join(base, "parameters.tsv")
    goodp = open(par_bad).read()
    open(par_bad, "w").write(goodp.replace("k1\tlog10\t1", "zzz\tlog10\t1"))
    with pytest.raises(PetabError):  # estimating a non-model parameter
        from_petab(yaml_path)


def test_petab_bounded_multistart(tmp_path):
    """multistart_trf drives a PEtab problem's bounds over a fake mesh."""
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    from tpusysbio.fit.multistart import multistart_trf
    from tpusysbio.utils import make_mesh

    prob = from_petab(_make_problem(tmp_path, prior_line=False),
                      config=SolverConfig(rtol=1e-6, atol=1e-8))
    starts = prob.sample_startpoints(jax.random.PRNGKey(1), 8)
    out = multistart_trf(prob.project.residuals,
                         prob.project.residuals_and_jacobian,
                         starts, prob.lb, prob.ub,
                         FitConfig(max_iter=40), mesh=make_mesh())
    # no member fails outright; the cap (status 0) is fine for far starts
    assert (np.asarray(out.status) >= 0).all()
    assert (np.asarray(out.status) > 0).any()
    best = out.best()
    theta_true = jnp.log(jnp.asarray([30.0, 10.0, 5.0]))
    assert float(best.cost) <= float(
        jax.jit(prob.project.cost)(theta_true)) + 1e-9
    th = np.asarray(out.theta)
    assert (th <= prob.ub[None, :] + 1e-12).all()
    assert (th >= prob.lb[None, :] - 1e-12).all()
