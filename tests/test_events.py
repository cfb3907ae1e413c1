"""Timed perturbations (events analogue) + pre-equilibration.

Reference capability: time-dependent experimental conditions (stimulus at
t>0, dose step, washout) — the reference stack implements them with
``solve_ivp`` events + restarts (spec: ``scipy/integrate/_ivp/ivp.py:29-158``;
SURVEY.md §2a #12, #4). Event times in this domain are known constants, so
the TPU-native mechanism is STATIC segment boundaries (``Experiment.inputs``)
integrated piecewise inside one jit, with state and sensitivity columns
chained across boundaries. Parity oracle: SciPy integrating the same
piecewise system segment-by-segment at tight tolerance.

Pre-equilibration (``Experiment.preequilibrate``): y0 = steady state under
basal parameters (damped Newton + IFT sensitivities); oracle is SciPy
long-horizon pre-simulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tpusysbio.config import SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.model import library
from tpusysbio.model.core import OdeModel
from tpusysbio.project import ParameterMap, Project

TIGHT = SolverConfig(rtol=1e-9, atol=1e-12)


# ----------------------------------------------------------------------
# SciPy piecewise oracle
# ----------------------------------------------------------------------

def _scipy_piecewise(rhs_np, y0, t_grid, p_base, segments):
    """Integrate segment-by-segment with SciPy BDF at tight tolerance.

    ``segments``: list of (t_lo, t_hi, p_eff). Returns ys at t_grid.
    """
    ys = np.zeros((len(t_grid), len(y0)))
    y = np.array(y0, dtype=float)
    for t_lo, t_hi, p_eff in segments:
        inside = [float(t) for t in t_grid if t_lo < t <= t_hi]
        # t_hi is always evaluated so the carried state is y(t_hi), not
        # the last measurement point
        pts = sorted(set(inside + [float(t_hi)]))
        sol = solve_ivp(lambda t, y: rhs_np(t, y, p_eff), (t_lo, t_hi), y,
                        method="BDF", t_eval=pts, rtol=1e-10, atol=1e-13)
        assert sol.success
        for k, t in enumerate(t_grid):
            if t_lo < t <= t_hi:
                ys[k] = sol.y[:, pts.index(float(t))]
            elif t == t_lo and t_lo == segments[0][0]:
                ys[k] = y0
        y = sol.y[:, -1]
    return ys


def _jakstat_pulse_project(n_t=9, with_second_exp=False):
    """JAK-STAT with a STIMULUS PULSE expressed as timed inputs:
    amp clamped to 1.3 at t=2 (stimulus on), back to 0.0 at t=10
    (washout). Data = SciPy piecewise sim (zero noise), absolute sigma=1,
    so residuals are exactly (sim_jax - sim_scipy)."""
    model = library.jak_stat()
    p_true = np.array(library.JAKSTAT_TRUE_PARAMS)
    p_true[4] = 0.0  # basal: no stimulus until the input fires
    t = np.linspace(1.0, 16.0, n_t)

    def rhs_np(tt, y, p):
        return np.asarray(model.rhs(tt, jnp.asarray(y), jnp.asarray(p)))

    def piecewise_data(p):
        p_on, p_off = p.copy(), p.copy()
        p_on[4], p_off[4] = 1.3, 0.0
        segs = [(0.0, 2.0, p), (2.0, 10.0, p_on), (10.0, 16.0, p_off)]
        y_traj = _scipy_piecewise(rhs_np, [1.0, 0.0, 0.0, 0.0], t, p, segs)
        return np.stack([np.asarray(model.observables(jnp.asarray(y),
                                                      jnp.asarray(p)))
                         for y in y_traj])

    data = piecewise_data(p_true)
    meas = tuple(
        Measurement(obs_index=i, times=t, values=data[:, i],
                    sigmas=np.ones(n_t)) for i in range(2))
    exps = [Experiment("pulse", meas,
                       inputs=((2.0, "amp", 1.3), (10.0, "amp", 0.0)))]
    if with_second_exp:
        # heterogeneous schedule: second experiment has NO inputs
        sol = solve_ivp(lambda tt, y: rhs_np(tt, y, p_true), (0.0, 16.0),
                        [1.0, 0.0, 0.0, 0.0], method="BDF", t_eval=t,
                        rtol=1e-10, atol=1e-13)
        data2 = np.stack([np.asarray(model.observables(jnp.asarray(y),
                                                       jnp.asarray(p_true)))
                          for y in sol.y.T])
        meas2 = tuple(
            Measurement(obs_index=i, times=t, values=data2[:, i],
                        sigmas=np.ones(n_t)) for i in range(2))
        exps.append(Experiment("basal", meas2))
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names)
    pmap = ParameterMap.create(model.param_names, len(exps),
                               shared=("k1", "k2", "k3", "k4", "tau"),
                               fixed={"amp": [0.0] * len(exps)})
    proj = Project(model=model, pmap=pmap, batch=batch, config=TIGHT)
    theta = pmap.pack({"k1": 2.5, "k2": 4.0, "k3": 0.3, "k4": 0.6,
                       "tau": 6.0})
    return proj, theta


def test_event_times_validation():
    m = Measurement(obs_index=0, times=np.array([1.0, 5.0]),
                    values=np.zeros(2), sigmas=np.ones(2))
    with pytest.raises(ValueError, match="input times"):
        Experiment("bad", (m,), inputs=((7.0, "k1", 1.0),)).event_times()
    ok = Experiment("ok", (m,), inputs=((2.0, "k1", 1.0),))
    np.testing.assert_allclose(ok.event_times(), [2.0])
    # param_names is mandatory once inputs exist
    with pytest.raises(ValueError, match="param_names"):
        ExperimentBatch.from_experiments([ok])


def test_piecewise_trajectory_matches_scipy():
    proj, theta = _jakstat_pulse_project()
    r = np.asarray(jax.jit(proj.residuals)(theta))
    assert np.max(np.abs(r)) < 1e-6


def test_piecewise_jacobian_matches_fd():
    """Sensitivity chaining across segment boundaries: FD of the residual
    function is the oracle (clamped amp contributes nothing — it is a
    fixed parameter here; the kinetics columns must chain through all
    three segments)."""
    proj, theta = _jakstat_pulse_project()
    r, J = jax.jit(proj.residuals_and_jacobian)(theta)
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = jnp.zeros(proj.n_theta).at[g].set(eps)
        fd = (np.asarray(res_fn(theta + d))
              - np.asarray(res_fn(theta - d))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, g]), fd, rtol=2e-5,
                                   atol=1e-8)


def test_heterogeneous_schedules_vmap():
    """A batch mixing an eventful and an event-free experiment: the padded
    zero-length segments of the event-free member must no-op (same values
    as running it alone)."""
    proj, theta = _jakstat_pulse_project(with_second_exp=True)
    r = np.asarray(jax.jit(proj.residuals)(theta))
    assert np.max(np.abs(r)) < 1e-6
    ev = proj.evaluate(theta)
    assert np.all(np.asarray(ev.status) == 1)  # both DONE


# ----------------------------------------------------------------------
# Timed STATE assignments (bolus dose / reset) — Experiment.input_states
# ----------------------------------------------------------------------

def _bolus_project(n_t=8):
    """Inflow model with a BOLUS at t=3 (y1 SET to 5.0) plus a washout
    clamp v=0.1 at t=5 — mixed parameter + state timed inputs in ONE
    experiment. Data = SciPy piecewise with a hard state reset (zero
    noise), so residuals are exactly (sim_jax - sim_scipy)."""
    model = _inflow_model()
    p = np.array([2.0, 0.5, 1.0, 0.25])
    p_wash = p.copy()
    p_wash[0] = 0.1
    t = np.linspace(0.5, 8.0, n_t)

    def rhs_np(tt, y, pp):
        return [pp[0] - pp[1] * y[0], pp[2] * y[0] - pp[3] * y[1]]

    ys = np.zeros((n_t, 2))
    y = np.array([0.2, 0.2])
    for t_lo, t_hi, pp, reset in [(0.0, 3.0, p, None),
                                  (3.0, 5.0, p, 5.0),
                                  (5.0, 8.0, p_wash, None)]:
        if reset is not None:
            y = y.copy()
            y[0] = reset
        pts = sorted({float(x) for x in t if t_lo < x <= t_hi} | {t_hi})
        sol = solve_ivp(lambda tt, yy: rhs_np(tt, yy, pp), (t_lo, t_hi),
                        y, method="BDF", t_eval=pts, rtol=1e-10,
                        atol=1e-13)
        assert sol.success
        for k, tk in enumerate(t):
            if t_lo < tk <= t_hi:
                ys[k] = sol.y[:, pts.index(float(tk))]
        y = sol.y[:, -1]

    meas = tuple(
        Measurement(obs_index=i, times=t, values=ys[:, i],
                    sigmas=np.ones(n_t)) for i in range(2))
    exps = [Experiment("bolus", meas,
                       inputs=((5.0, "v", 0.1),),
                       input_states=((3.0, "y1", 5.0),))]
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names,
        state_names=model.state_names)
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=model.param_names)
    proj = Project(model=model, pmap=pmap, batch=batch, config=TIGHT)
    theta = pmap.pack({"v": 2.0, "d1": 0.5, "k": 1.0, "d2": 0.25})
    return proj, theta


def test_input_states_validation():
    m = Measurement(obs_index=0, times=np.array([1.0, 5.0]),
                    values=np.zeros(2), sigmas=np.ones(2))
    # a state jump at t0 is just a different y0 — rejected
    with pytest.raises(ValueError, match="input_states times"):
        Experiment("bad", (m,),
                   input_states=((0.0, "y1", 1.0),)).event_times()
    ok = Experiment("ok", (m,), input_states=((2.0, "y1", 1.0),))
    np.testing.assert_allclose(ok.event_times(), [2.0])
    with pytest.raises(ValueError, match="state_names"):
        ExperimentBatch.from_experiments(
            [ok], param_names=("v", "d1", "k", "d2"))
    with pytest.raises(ValueError, match="unknown state"):
        ExperimentBatch.from_experiments(
            [Experiment("zz", (m,), input_states=((2.0, "nope", 1.0),))],
            param_names=("v", "d1", "k", "d2"),
            state_names=("y1", "y2"))


def test_bolus_trajectory_matches_scipy():
    proj, theta = _bolus_project()
    r = np.asarray(jax.jit(proj.residuals)(theta))
    assert np.max(np.abs(r)) < 1e-6


def test_bolus_jacobian_matches_fd():
    """The bolus resets y1's sensitivity rows to zero at t=3 (a constant
    has no parameter dependence) while y2's columns chain through; FD of
    the residual function is the oracle for both effects. atol absorbs
    the FD noise floor (~1e-8 here: O(10) residuals integrated at
    rtol=1e-9, differenced at eps=1e-6)."""
    proj, theta = _bolus_project()
    r, J = jax.jit(proj.residuals_and_jacobian)(theta)
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = jnp.zeros(proj.n_theta).at[g].set(eps)
        fd = (np.asarray(res_fn(theta + d))
              - np.asarray(res_fn(theta - d))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, g]), fd, rtol=2e-5,
                                   atol=1e-7)


# ----------------------------------------------------------------------
# Pre-equilibration
# ----------------------------------------------------------------------

def _inflow_model():
    """2-state inflow/decay chain with a unique hyperbolic steady state
    (y* = (v/d1, k*y1*/d2)) — preeq has something nontrivial to find."""

    def rhs(t, y, p):
        v, d1, k, d2 = p
        return jnp.stack([v - d1 * y[0], k * y[0] - d2 * y[1]])

    def y0(p):
        return jnp.array([0.2, 0.2], dtype=p.dtype)

    return OdeModel(
        name="inflow2", n_states=2, n_params=4, n_obs=2,
        rhs=rhs, y0=y0, observables=lambda y, p: y,
        param_names=("v", "d1", "k", "d2"), state_names=("y1", "y2"))


def _preeq_project(n_t=7):
    """Basal v=0.5 equilibration, then a dose step to the experiment's own
    v — the standard equilibrate-then-perturb workflow. Data from SciPy:
    long pre-simulation under basal params, then simulate."""
    model = _inflow_model()
    p_exp = np.array([2.0, 0.5, 1.0, 0.25])
    p_basal = p_exp.copy()
    p_basal[0] = 0.5
    t = np.linspace(0.5, 8.0, n_t)

    def rhs_np(tt, y, p):
        return [p[0] - p[1] * y[0], p[2] * y[0] - p[3] * y[1]]

    pre = solve_ivp(lambda tt, y: rhs_np(tt, y, p_basal), (0.0, 400.0),
                    [0.2, 0.2], method="BDF", rtol=1e-12, atol=1e-14)
    y_eq = pre.y[:, -1]
    np.testing.assert_allclose(y_eq, [1.0, 4.0], rtol=1e-8)  # sanity
    sol = solve_ivp(lambda tt, y: rhs_np(tt, y, p_exp), (0.0, 8.0), y_eq,
                    method="BDF", t_eval=t, rtol=1e-10, atol=1e-13)
    data = sol.y.T
    meas = tuple(
        Measurement(obs_index=i, times=t, values=data[:, i],
                    sigmas=np.ones(n_t)) for i in range(2))
    exps = [Experiment("dose", meas, preequilibrate=True,
                       preeq_params={"v": 0.5})]
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names)
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("v", "d1", "k", "d2"))
    proj = Project(model=model, pmap=pmap, batch=batch, config=TIGHT,
                   ss_t_relax=20.0)
    theta = pmap.pack({"v": 2.0, "d1": 0.5, "k": 1.0, "d2": 0.25})
    return proj, theta


def test_preeq_trajectory_matches_scipy_presim():
    proj, theta = _preeq_project()
    r = np.asarray(jax.jit(proj.residuals)(theta))
    assert np.max(np.abs(r)) < 1e-6


def test_preeq_jacobian_matches_fd():
    """The IFT dy*/dp term chained into s0: FD through the WHOLE pipeline
    (steady state recomputed at p±eps) is the oracle. Note the basal
    override v is still a fit parameter of the trajectory segment — its
    column carries only the post-perturbation dependence, which FD of the
    residual function (with the basal value held fixed) reproduces.

    atol absorbs the FD oracle's own noise floor: each p±eps evaluation
    re-converges the equilibrium Newton solve to ~1e-10, and that error
    divided by 2eps shows up as O(1e-7) on near-zero entries."""
    proj, theta = _preeq_project()
    r, J = jax.jit(proj.residuals_and_jacobian)(theta)
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = jnp.zeros(proj.n_theta).at[g].set(eps)
        fd = (np.asarray(res_fn(theta + d))
              - np.asarray(res_fn(theta - d))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, g]), fd, rtol=2e-5,
                                   atol=1e-6)


def test_preeq_fit_optimum_parity():
    """Two-experiment ensemble (one preequilibrated, one not) fit from a
    perturbed start recovers the generating parameters — value AND
    optimum parity vs the data-generating SciPy pipeline."""
    from tpusysbio.optim import lm_fit

    model = _inflow_model()
    p_true = np.array([2.0, 0.5, 1.0, 0.25])
    p_basal = p_true.copy()
    p_basal[0] = 0.5
    t = np.linspace(0.5, 8.0, 7)

    def rhs_np(tt, y, p):
        return [p[0] - p[1] * y[0], p[2] * y[0] - p[3] * y[1]]

    y_eq = [1.0, 4.0]  # analytic basal steady state
    sol1 = solve_ivp(lambda tt, y: rhs_np(tt, y, p_true), (0.0, 8.0), y_eq,
                     method="BDF", t_eval=t, rtol=1e-10, atol=1e-13)
    sol2 = solve_ivp(lambda tt, y: rhs_np(tt, y, p_true), (0.0, 8.0),
                     [0.2, 0.2], method="BDF", t_eval=t, rtol=1e-10,
                     atol=1e-13)

    def meas_of(data):
        return tuple(
            Measurement(obs_index=i, times=t, values=data[:, i],
                        sigmas=np.full(7, 0.05)) for i in range(2))

    exps = [Experiment("dose", meas_of(sol1.y.T), preequilibrate=True,
                       preeq_params={"v": 0.5}),
            Experiment("naive", meas_of(sol2.y.T))]
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names)
    pmap = ParameterMap.create(model.param_names, 2,
                               shared=model.param_names)
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-8, atol=1e-11),
                   ss_t_relax=20.0)
    theta0 = pmap.pack({"v": 1.2, "d1": 0.8, "k": 0.6, "d2": 0.4})
    res = lm_fit(jax.jit(proj.residuals),
                 jax.jit(proj.residuals_and_jacobian), theta0)
    p_fit = np.exp(np.asarray(res.theta))
    np.testing.assert_allclose(p_fit, p_true, rtol=1e-5)
