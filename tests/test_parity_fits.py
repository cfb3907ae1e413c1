"""Fitted-parameter parity at the 1e-6 bar (BASELINE.json:5) for the
canonical configs 2-4.

Each test fits the SAME synthetic dataset twice from the SAME start:

- ours: Project residuals (BDF + forward sensitivities) + jitted LM,
- reference: ``scipy.optimize.least_squares`` over residuals computed by
  ``scipy.integrate.solve_ivp(method='BDF')`` on the same RHS — i.e. the
  reference stack end to end (SURVEY.md §3.1), with the scale-factor
  objective reproduced in NumPy where the config needs it.

The two optima must agree to ~1e-6 in log-parameters (= relative in p).
Config 1 (Michaelis-Menten) parity is covered in tests/test_fit.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp
from scipy.optimize import least_squares

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.model import library
from tpusysbio.optim import lm_fit
from tpusysbio.project import ParameterMap, Project

TIGHT_FIT = FitConfig(ftol=1e-11, xtol=1e-11, gtol=1e-11, max_iter=150)


def _scipy_residual_fn(model, free_idx, p_full, t, data, sigma, groups,
                       t_end, rtol=1e-9, atol=1e-12, theta_ref=None,
                       radius=2.0):
    """Reference-stack residuals: log-theta -> (B*sim - data)/sigma.

    ``data``/``sigma``: (T, n_obs); ``groups``: None (absolute data) or
    int group id per observable for pooled scale factors.
    ``theta_ref``/``radius``: log-space trust plateau — outside it the
    residuals are a flat 1e6 wall. MINPACK's unbounded LM occasionally
    probes absurd log-rates where ``solve_ivp`` (which has no step
    budget) grinds for minutes; both fits here start within 0.1 of the
    optimum, so the wall never binds near the solution.
    """
    rhs = jax.jit(lambda t_, y_, p_: model.rhs(t_, y_, p_))
    p_template = np.asarray(p_full, dtype=np.float64)

    def resid(theta):
        if theta_ref is not None and np.max(
                np.abs(theta - theta_ref)) > radius:
            return np.full(data.size, 1e6)
        p = p_template.copy()
        p[free_idx] = np.exp(np.clip(theta, -60.0, 60.0))
        if not np.all(np.isfinite(p)):
            return np.full(data.size, 1e6)
        pj = jnp.asarray(p)

        def f(t_, y_):
            return np.asarray(rhs(t_, jnp.asarray(y_), pj))

        sol = solve_ivp(f, (0.0, t_end), np.asarray(model.y0(pj)),
                        method="BDF", rtol=rtol, atol=atol, t_eval=t)
        if not sol.success:
            return np.full(data.size, 1e6)
        obs = np.asarray(jax.vmap(
            lambda y: model.observables(y, pj))(jnp.asarray(sol.y.T)))
        if groups is None:
            B_row = np.ones(data.shape[1])
        else:
            B_row = np.empty(data.shape[1])
            for g in set(groups):
                cols = [i for i, gi in enumerate(groups) if gi == g]
                s, d, sg = obs[:, cols], data[:, cols], sigma[:, cols]
                B = np.sum(s * d / sg**2) / np.sum(s * s / sg**2)
                B_row[cols] = B
        # observable-major ordering, matching the Project's residual
        # stacking (one Measurement per observable, all times)
        return ((B_row[None, :] * obs - data) / sigma).T.reshape(-1)

    return resid


def _run_pair(model, free_names, fixed, t, data, sigma, t_end,
              scale_groups=None, theta_offset=0.1, box=None):
    """Fit ours + scipy from the same start; return (theta_ours, scipy).

    ``box``: optional half-width of a log-space box around the start —
    BOTH optimizers run bounded (ours: lm_fit lower/upper; scipy: trf).
    Used where the unbounded problem is multi-modal so the comparison
    stays within one identifiable basin with an interior optimum."""
    p_true = {**fixed}
    free_idx = [model.param_names.index(n) for n in free_names]
    p_full = np.zeros(model.n_params)
    for n, v in fixed.items():
        p_full[model.param_names.index(n)] = v

    meas = []
    for i in range(data.shape[1]):
        g = None if scale_groups is None else f"g{scale_groups[i]}"
        meas.append(Measurement(obs_index=i, times=t, values=data[:, i],
                                sigmas=sigma[:, i], scale_group=g))
    batch = ExperimentBatch.from_experiments([Experiment("e0", tuple(meas))])
    pmap = ParameterMap.create(
        model.param_names, 1, shared=tuple(free_names),
        fixed={n: v for n, v in fixed.items() if n not in free_names})
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-9, atol=1e-12,
                                       max_steps=4096))
    theta_true = pmap.pack(p_true)
    theta0 = theta_true + theta_offset

    lo = None if box is None else theta0 - box
    hi = None if box is None else theta0 + box
    if box is None:
        ours = jax.jit(lambda th: lm_fit(
            proj.residuals, proj.residuals_and_jacobian, th,
            TIGHT_FIT))(theta0)
    else:
        from tpusysbio.optim import trf_fit

        ours = jax.jit(lambda th: trf_fit(
            proj.residuals, proj.residuals_and_jacobian, th, lo, hi,
            TIGHT_FIT))(theta0)
    assert int(ours.status) > 0

    resid = _scipy_residual_fn(model, free_idx, p_full, np.asarray(t),
                               data, sigma, scale_groups, t_end,
                               theta_ref=np.asarray(theta0))
    # analytic Jacobian from the forward-sensitivity path (matches the
    # scipy residual function to ~1e-9: same math, tighter-than-FD);
    # ordering matches because both stack observable-major
    jac_jit = jax.jit(lambda th: proj.residuals_and_jacobian(th)[1])

    def jac(th):
        return np.asarray(jac_jit(jnp.asarray(th)))

    if box is None:
        ref = least_squares(resid, np.asarray(theta0), method="lm",
                            jac=jac, ftol=1e-11, xtol=1e-11, gtol=1e-11,
                            max_nfev=300)
    else:
        ref = least_squares(resid, np.asarray(theta0), method="trf",
                            jac=jac, bounds=(np.asarray(lo),
                                             np.asarray(hi)),
                            ftol=1e-11, xtol=1e-11, gtol=1e-11,
                            max_nfev=300)
    return np.asarray(ours.theta), ref.x, float(ours.cost), \
        0.5 * float(np.sum(ref.fun**2))


@pytest.mark.slow
def test_fit_parity_repressilator():
    """Config 2 (BASELINE.json:8): all 4 params free, absolute data."""
    model = library.repressilator()
    p_true = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    t = np.linspace(2.0, 30.0, 10)
    res = model.simulate(p_true, (0.0, 30.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-11, atol=1e-13))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, p_true))(res.ys))
    rng = np.random.default_rng(3)
    sigma = np.full_like(obs, 0.02)
    data = obs + rng.normal(scale=0.02, size=obs.shape)
    fixed = dict(zip(model.param_names,
                     library.REPRESSILATOR_TRUE_PARAMS))
    th_ours, th_ref, c_ours, c_ref = _run_pair(
        model, ("alpha", "alpha0", "beta", "n"), fixed, t, data, sigma,
        30.0)
    np.testing.assert_allclose(th_ours, th_ref, atol=2e-6)
    assert abs(c_ours - c_ref) <= 1e-7 * max(1.0, c_ref)


@pytest.mark.slow
def test_fit_parity_mapk22():
    """Config 3 (BASELINE.json:9): free MAPK-kinase-layer rate constants.

    The free set is the 4 K-layer CATALYTIC rate constants — directly
    identifiable flux scales. Bind/unbind pairs are the classic sloppy
    directions (rapid-equilibrium degeneracy: only their ratio is
    identified once binding saturates), and wider MAPK clouds are sloppy
    valleys where ANY optimizer's stopping point wanders along near-flat
    directions (measured: MINPACK stops the 12-param fit at cost 10.133,
    our LM keeps descending to 10.03 on the same data — cost parity
    holds, per-parameter comparison does not; docs/PERFORMANCE.md "LM
    termination semantics").
    """
    model = library.mapk_huang_ferrell()
    p_true_np = library.mapk_true_params()
    p_true = jnp.asarray(p_true_np)
    t = np.linspace(5.0, 100.0, 12)
    res = model.simulate(p_true, (0.0, 100.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-11, atol=1e-14,
                                             max_steps=4096))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, p_true))(res.ys))
    rng = np.random.default_rng(4)
    s = 0.02 * float(np.max(obs))
    sigma = np.full_like(obs, s)
    data = obs + rng.normal(scale=s, size=obs.shape)
    free = [n for n in model.param_names if n.endswith(".cat")
            and n.startswith(("KKPP+", "KPase+"))]
    assert len(free) == 4
    fixed = dict(zip(model.param_names, p_true_np))
    th_ours, th_ref, c_ours, c_ref = _run_pair(
        model, tuple(free), fixed, t, data, sigma, 100.0,
        theta_offset=0.02, box=0.5)
    np.testing.assert_allclose(th_ours, th_ref, atol=5e-6)
    assert abs(c_ours - c_ref) <= 1e-6 * max(1.0, c_ref)


@pytest.mark.slow
def test_fit_parity_jakstat_scale_factors():
    """Config 4 (BASELINE.json:10): relative observables, pooled scale
    factors in BOTH objectives."""
    model = library.jak_stat()
    p_true = jnp.asarray(library.JAKSTAT_TRUE_PARAMS)
    t = np.linspace(2.0, 60.0, 10)
    res = model.simulate(p_true, (0.0, 60.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-11, atol=1e-13))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, p_true))(res.ys))
    rng = np.random.default_rng(5)
    scale_true = np.array([3.7, 0.9])
    sigma_rel = 0.03
    data = scale_true[None, :] * obs * (
        1 + rng.normal(scale=sigma_rel, size=obs.shape))
    sigma = np.full_like(obs, sigma_rel)
    fixed = dict(zip(model.param_names, library.JAKSTAT_TRUE_PARAMS))
    th_ours, th_ref, c_ours, c_ref = _run_pair(
        model, ("k1", "k2", "k3", "k4"), fixed, t, data, sigma, 60.0,
        scale_groups=[0, 1])
    np.testing.assert_allclose(th_ours, th_ref, atol=2e-6)
    assert abs(c_ours - c_ref) <= 1e-7 * max(1.0, c_ref)
