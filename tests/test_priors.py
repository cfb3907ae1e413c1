"""Priors as least-squares rows (project/priors.py).

Autodiff is the oracle for the hand-assembled prior Jacobian rows (same
house style as test_project.py), and the regularization semantics are
pinned analytically: a tight prior pulls the optimum toward its median,
the prior-row residual at the fit optimum matches the closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.model import library
from tpusysbio.optim import lm_fit
from tpusysbio.project import ParameterMap, Priors, Project


def _mm_project(priors=None, scale_groups=False, sigma=0.02, n_t=8):
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, n_t)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    rng = np.random.default_rng(0)
    data = np.asarray(res.ys) + rng.normal(scale=sigma, size=(n_t, 3))
    if scale_groups:
        data = data * 2.5  # relative units; fitted B should recover 2.5
    meas = tuple(
        Measurement(obs_index=i, times=t, values=data[:, i],
                    sigmas=np.full(n_t, sigma),
                    scale_group="u" if scale_groups else None)
        for i in range(3))
    batch = ExperimentBatch.from_experiments([Experiment("e0", meas)])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=tuple(model.param_names))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-8, atol=1e-10),
                   priors=priors)
    theta = pmap.pack({n: float(v) for n, v in
                       zip(model.param_names, library.MM_TRUE_PARAMS)})
    return proj, pmap, batch, theta


def test_prior_rows_shapes_and_values():
    proj0, pmap, batch, theta = _mm_project()
    priors = Priors.create(pmap, batch, params={"k1": (8.0, 0.5)})
    proj = Project(model=proj0.model, pmap=pmap, batch=batch,
                   config=proj0.config, priors=priors)
    r = proj.residuals(theta)
    assert r.shape[0] == proj.n_residuals
    assert proj.n_residuals == batch.n_residuals + pmap.n_global
    # row value: (θ_k1 − log 8)/0.5; unprior'd entries are exactly 0
    k1 = pmap.theta_names.index("k1")
    rows = np.asarray(r[batch.n_residuals:])
    expect = (np.log(library.MM_TRUE_PARAMS[0]) - np.log(8.0)) / 0.5
    np.testing.assert_allclose(rows[k1], expect, rtol=1e-12)
    others = np.delete(rows, k1)
    np.testing.assert_array_equal(others, 0.0)


def test_prior_jacobian_matches_autodiff():
    proj0, pmap, batch, theta = _mm_project(scale_groups=True)
    priors = Priors.create(
        pmap, batch,
        params={"k1": (8.0, 0.5), "E0": (0.4, 0.2)},
        scales={"u": (2.0, 0.3)})
    proj = Project(model=proj0.model, pmap=pmap, batch=batch,
                   config=proj0.config, priors=priors)
    r, J = jax.jit(proj.residuals_and_jacobian)(theta)
    assert r.shape[0] == batch.n_residuals + pmap.n_global + 1
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = np.zeros(proj.n_theta)
        d[g] = eps
        fd = (np.asarray(res_fn(theta + jnp.asarray(d)))
              - np.asarray(res_fn(theta - jnp.asarray(d)))) / (2 * eps)
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(np.asarray(J)[:, g] - fd)) / scale < 1e-5, g


def test_tight_prior_pulls_optimum():
    """With a tight prior away from the data optimum, the fitted value
    lands between the two; without it, at the data optimum."""
    proj0, pmap, batch, theta = _mm_project()
    free = lm_fit(proj0.residuals, proj0.residuals_and_jacobian, theta,
                  config=FitConfig(max_iter=30))
    k1 = pmap.theta_names.index("k1")
    k1_free = float(free.theta[k1])

    prior_mu = k1_free - 0.4  # pull k1 down in log space
    priors = Priors.create(pmap, batch,
                           params={"k1": (float(np.exp(prior_mu)), 0.01)})
    proj = Project(model=proj0.model, pmap=pmap, batch=batch,
                   config=proj0.config, priors=priors)
    reg = lm_fit(proj.residuals, proj.residuals_and_jacobian, theta,
                 config=FitConfig(max_iter=30))
    assert int(reg.status) > 0
    k1_reg = float(reg.theta[k1])
    # σ=0.01 is far tighter than the data: optimum sits essentially at
    # the prior median, strictly between median and free optimum
    assert prior_mu - 1e-3 < k1_reg < k1_free
    assert abs(k1_reg - prior_mu) < 0.05
    # stationarity of the augmented objective at the reported optimum
    r, J = proj.residuals_and_jacobian(reg.theta)
    g = np.asarray(J.T @ r)
    assert np.max(np.abs(g)) < 1e-4


def test_scale_prior_shifts_fitted_scale():
    """A log-normal prior on the scale factor biases the effective
    normalization the fit is judged by; the prior row's residual and
    gradient are consistent (jacfwd oracle already covered above) and the
    cost increases when B is pushed off its analytic optimum."""
    proj0, pmap, batch, theta = _mm_project(scale_groups=True)
    ev_free = proj0.evaluate(theta)
    B_free = float(ev_free.scale[0])
    assert abs(B_free - 2.5) < 0.1  # analytic optimum recovers the units

    priors = Priors.create(pmap, batch, scales={"u": (1.0, 0.05)})
    proj = Project(model=proj0.model, pmap=pmap, batch=batch,
                   config=proj0.config, priors=priors)
    r = proj.residuals(theta)
    # prior row present and equal to (log B − log 1)/0.05
    np.testing.assert_allclose(
        float(r[-1]), np.log(B_free) / 0.05, rtol=1e-10)
    # the augmented cost exceeds the unregularized cost at truth
    assert float(proj.cost(theta)) > float(ev_free.cost)


def test_priors_create_validation():
    _, pmap, batch, _ = _mm_project()
    with pytest.raises(KeyError):
        Priors.create(pmap, batch, params={"nope": (1.0, 0.1)})
    with pytest.raises(ValueError):
        Priors.create(pmap, batch, params={"k1": (-1.0, 0.1)})
    with pytest.raises(KeyError):
        Priors.create(pmap, batch, scales={"nope": (1.0, 0.1)})
    with pytest.raises(ValueError):
        Priors.create(pmap, None, scales={"u": (1.0, 0.1)})
