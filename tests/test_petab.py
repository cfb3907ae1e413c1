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

    # estimating a non-model parameter is now ALLOWED (output parameter,
    # appended to the model vector) — but estimating one inside a
    # noiseFormula still raises (noise estimation unsupported)
    obs_noise = os.path.join(base, "observables.tsv")
    open(obs_noise, "w").write(good.replace("P\t0.01", "P\tsigma_p"))
    par_bad = os.path.join(base, "parameters.tsv")
    goodp = open(par_bad).read()
    open(par_bad, "w").write(
        goodp + "sigma_p\tlog10\t0.001\t1\t0.01\t1\t\t\n")
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(obs_noise, "w").write(good)
    open(par_bad, "w").write(goodp)


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


# ---------------------------------------------------------------------------
# Widened subset (VERDICT r4 item 6): observableParameters placeholders
# (incl. ESTIMATED output parameters, the Boehm-class scaling pattern),
# observableTransformation log10, noiseParameter placeholders, and
# condition-table species overrides.
# ---------------------------------------------------------------------------

SCALE_TRUE = 2.5
OFFSET = 0.05


def _scipy_mm(p, y0, t):
    """Independent trajectory oracle (scipy BDF at tight tolerance)."""
    from scipy.integrate import solve_ivp

    k1, km1, k2, e0 = p

    def rhs(tt, y):
        s, c, prod = y
        bind = k1 * (e0 - c) * s
        return [-bind + km1 * c, bind - (km1 + k2) * c, k2 * c]

    sol = solve_ivp(rhs, (0.0, float(t[-1])), y0, method="BDF",
                    t_eval=t, rtol=1e-10, atol=1e-12)
    return sol.y.T  # (T, 3)


def _make_widened_problem(tmp_path):
    """Boehm-style mini problem: estimated scaling placeholder, log10
    observable, per-row noise placeholders, species override."""
    t = np.asarray([0.25, 0.5, 1.0, 2.0, 4.0])
    p_true = [30.0, 10.0, 5.0]
    rows = ["observableId\tsimulationConditionId\tmeasurement\ttime"
            "\tobservableParameters\tnoiseParameters"]
    # c_a: default y0 (S=1); c_b: species override S=0.5 AND E0=0.6
    for cid, e0, s0 in (("c_a", 0.2, 1.0), ("c_b", 0.6, 0.5)):
        traj = _scipy_mm(p_true + [e0], [s0, 0.0, 0.0], t)
        sc = SCALE_TRUE * traj[:, 2] + OFFSET     # scale_p * P + offset
        tot = traj[:, 0] + traj[:, 1]             # S + C (log10 observable)
        for ti, v in zip(t, sc):
            rows.append(f"obs_sc\t{cid}\t{v:.12f}\t{ti}"
                        f"\tscale_p;{OFFSET}\t0.01")
        for ti, v in zip(t, tot):
            rows.append(f"obs_tot\t{cid}\t{v:.12f}\t{ti}\t\t")

    sbml = _mm_sbml(tmp_path)
    _write(tmp_path, "conditions.tsv", """
        conditionId\tE0\tS
        c_a\t0.2\t
        c_b\t0.6\t0.5
    """)
    _write(tmp_path, "observables.tsv", """
        observableId\tobservableFormula\tobservableTransformation\tnoiseFormula
        obs_sc\tobservableParameter1_obs_sc * P + observableParameter2_obs_sc\tlin\tnoiseParameter1_obs_sc
        obs_tot\tS + C\tlog10\t0.02
    """)
    _write(tmp_path, "measurements.tsv", "\n".join(rows) + "\n")
    _write(tmp_path, "parameters.tsv", """
        parameterId\tparameterScale\tlowerBound\tupperBound\tnominalValue\testimate
        k1\tlog10\t1\t100\t20\t1
        km1\tlog10\t0.1\t100\t5\t1
        k2\tlog10\t0.1\t50\t2\t1
        scale_p\tlog10\t0.1\t20\t1.5\t1
        E0\tlin\t\t\t0.2\t0
    """)
    return _write(tmp_path, "problem.yaml", """
        format_version: 1
        parameter_file: parameters.tsv
        problems:
          - sbml_files: [model.xml]
            condition_files: [conditions.tsv]
            observable_files: [observables.tsv]
            measurement_files: [measurements.tsv]
    """)


def test_petab_widened_assembles(tmp_path):
    prob = from_petab(_make_widened_problem(tmp_path),
                      config=SolverConfig(rtol=1e-8, atol=1e-10))
    # estimated output parameter appended to the model vector
    assert prob.x_ids == ("k1", "km1", "k2", "scale_p")
    assert prob.model.n_params == 5
    assert prob.model.param_names[-1] == "scale_p"
    # two expanded observables
    assert prob.obs_labels == (f"obs_sc[scale_p;{OFFSET}]", "obs_tot")
    # species override packed into the batch
    assert bool(prob.batch.has_y0_over)
    y0m = np.asarray(prob.batch.y0_mask)
    assert y0m[0].sum() == 0 and y0m[1, 0] and y0m[1, 1:].sum() == 0
    np.testing.assert_allclose(np.asarray(prob.batch.y0_vals)[1, 0], 0.5)
    # the dynamics ignore the appended output parameter
    y = jnp.asarray([0.4, 0.1, 0.2])
    p5 = jnp.asarray([30.0, 10.0, 5.0, 0.2, SCALE_TRUE])
    obs = np.asarray(prob.model.observables(y, p5))
    np.testing.assert_allclose(obs[0], SCALE_TRUE * 0.2 + OFFSET,
                               rtol=1e-12)
    np.testing.assert_allclose(obs[1], np.log10(0.5), rtol=1e-12)


def test_petab_widened_residuals_and_fit(tmp_path):
    """Noise-free synthetic data from the scipy oracle: residuals vanish
    at the truth; a bounded fit from a perturbed start recovers the
    kinetic parameters AND the estimated scaling factor."""
    from tpusysbio.fit.multistart import multistart_trf

    prob = from_petab(_make_widened_problem(tmp_path),
                      config=SolverConfig(rtol=1e-9, atol=1e-11))
    theta_true = jnp.log(jnp.asarray([30.0, 10.0, 5.0, SCALE_TRUE]))
    r = jax.jit(prob.project.residuals)(theta_true)
    assert bool(jnp.all(jnp.isfinite(r)))
    # rtol=1e-9 solver vs 1e-10 oracle on sigma >= 0.01 rows
    assert float(jnp.max(jnp.abs(r))) < 1e-3

    # manual check of one log10 residual row: (log10 sim - log10 meas)/sig
    ev = prob.project.evaluate(theta_true)
    assert float(ev.cost) < 1e-6

    start = theta_true + jnp.asarray([0.4, -0.3, 0.2, -0.5])
    fit = jax.jit(lambda th: trf_fit(
        prob.project.residuals, prob.project.residuals_and_jacobian, th,
        jnp.asarray(prob.lb), jnp.asarray(prob.ub),
        FitConfig(max_iter=80)))(start)
    assert int(fit.status) > 0
    np.testing.assert_allclose(np.asarray(fit.theta),
                               np.asarray(theta_true), atol=2e-3)

    # bounded multistart end-to-end (the PEtab -> fleet path)
    starts = prob.sample_startpoints(jax.random.PRNGKey(0), 4)
    out = multistart_trf(prob.project.residuals,
                         prob.project.residuals_and_jacobian, starts,
                         prob.lb, prob.ub, FitConfig(max_iter=60))
    assert float(out.best().cost) < 1e-5


def test_petab_widened_validation(tmp_path):
    yaml_path = _make_widened_problem(tmp_path)
    base = os.path.dirname(yaml_path)

    # placeholder/value count mismatch
    meas = os.path.join(base, "measurements.tsv")
    good = open(meas).read()
    open(meas, "w").write(good.replace(f"scale_p;{OFFSET}", "scale_p"))
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(meas, "w").write(good)

    # non-positive measurement under log10 transformation
    bad = good.replace("obs_tot\tc_a\t", "obs_tot\tc_a\t-", 1)
    open(meas, "w").write(bad)
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(meas, "w").write(good)

    # unknown condition column (neither parameter nor species)
    cond = os.path.join(base, "conditions.tsv")
    goodc = open(cond).read()
    open(cond, "w").write(goodc.replace("\tS\n", "\tcompartmentX\n"))
    with pytest.raises(PetabError):
        from_petab(yaml_path)
    open(cond, "w").write(goodc)
