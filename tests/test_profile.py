"""Profile likelihood: analytic, scipy-parity, and identifiability tests.

The profile of an independent Gaussian problem is exactly quadratic with
known curvature — the analytic oracle. The nonlinear oracle is scipy
``least_squares`` re-fit with the profiled parameter held fixed at each
grid value (exactly what the reference stack would run serially,
SURVEY.md §3.4 style). A degenerate problem (cost depends only on
θ0+θ1) must produce a flat profile and infinite CIs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares
from scipy.stats import chi2

from tpusysbio.config import FitConfig
from tpusysbio.fit import confidence_intervals, profile_likelihood


def _quadratic_fns(target, sigma):
    target = jnp.asarray(target)
    sigma = jnp.asarray(sigma)

    def residual(th):
        return (th - target) / sigma

    def residual_and_jac(th):
        return residual(th), jnp.diag(1.0 / sigma)

    return residual, residual_and_jac


def test_profile_quadratic_matches_analytic():
    target = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])
    r_fn, rj_fn = _quadratic_fns(target, sigma)
    # span must cover the widest CI: 1.96·σ_max = 3.92
    res = profile_likelihood(r_fn, rj_fn, target, n_points=5, span=5.0,
                             config=FitConfig(max_iter=30))
    # independent coordinates: profile cost is 0.5 (v - tᵢ)² / σᵢ²
    for p in range(3):
        expect = 0.5 * (np.asarray(res.values[p]) - float(target[p])) ** 2 \
            / float(sigma[p]) ** 2
        np.testing.assert_allclose(np.asarray(res.costs[p]), expect,
                                   atol=1e-10)
    # LR confidence interval = tᵢ ± sqrt(χ²₁(0.95))·σᵢ
    ci = confidence_intervals(res, level=0.95)
    half = np.sqrt(chi2.ppf(0.95, df=1)) * np.asarray(sigma)
    np.testing.assert_allclose(ci[:, 0], np.asarray(target) - half,
                               rtol=1e-6)
    np.testing.assert_allclose(ci[:, 1], np.asarray(target) + half,
                               rtol=1e-6)


def _expdecay_fns(ts, data):
    ts_j = jnp.asarray(ts)
    data_j = jnp.asarray(data)

    # θ = (log a, log b): log-space parameters, as project/mapping.py uses
    def residual(th):
        a, b = jnp.exp(th[0]), jnp.exp(th[1])
        return a * jnp.exp(-b * ts_j) - data_j

    def residual_and_jac(th):
        a, b = jnp.exp(th[0]), jnp.exp(th[1])
        e = jnp.exp(-b * ts_j)
        r = a * e - data_j
        # d/d(log a) = a·e ; d/d(log b) = -a·b·t·e
        J = jnp.stack([a * e, -a * b * ts_j * e], axis=1)
        return r, J

    return residual, residual_and_jac


def test_profile_matches_scipy_refits():
    ts = np.linspace(0.0, 3.0, 7)
    rng = np.random.default_rng(1)
    data = 2.0 * np.exp(-0.8 * ts) + 0.02 * rng.normal(size=ts.shape)
    r_fn, rj_fn = _expdecay_fns(ts, data)

    sol = least_squares(
        lambda th: np.asarray(r_fn(jnp.asarray(th))),
        x0=np.log([1.5, 1.0]), method="lm")
    theta_opt = jnp.asarray(sol.x)

    res = profile_likelihood(r_fn, rj_fn, theta_opt, n_points=4, span=0.6,
                             config=FitConfig(max_iter=60))
    assert np.all(np.asarray(res.status) > 0)

    # oracle: scipy re-fit with the profiled parameter fixed at each value
    for p, i_free in ((0, 1), (1, 0)):
        for j in (0, 2, 6, 8):  # spot-check off-center grid points
            v = float(res.values[p][j])

            def pinned(th_free):
                th = np.empty(2)
                th[res.idx[p]] = v
                th[i_free] = th_free[0]
                return np.asarray(r_fn(jnp.asarray(th)))

            ref = least_squares(pinned, x0=[float(theta_opt[i_free])],
                                method="lm")
            # scipy's .cost is 0.5·||r||², same convention as ours
            np.testing.assert_allclose(float(res.costs[p][j]), ref.cost,
                                       rtol=1e-7)


def test_profile_flat_direction_gives_infinite_ci():
    # cost depends only on θ0+θ1 — each coordinate alone is structurally
    # non-identifiable: the profile re-fit absorbs any pinned value
    def residual(th):
        return jnp.asarray([th[0] + th[1] - 1.0])

    def residual_and_jac(th):
        return residual(th), jnp.asarray([[1.0, 1.0]])

    theta_opt = jnp.asarray([0.5, 0.5])
    res = profile_likelihood(residual, residual_and_jac, theta_opt,
                             n_points=4, span=3.0,
                             config=FitConfig(max_iter=40))
    np.testing.assert_allclose(np.asarray(res.costs), 0.0, atol=1e-12)
    ci = confidence_intervals(res)
    assert np.all(np.isinf(ci[:, 0])) and np.all(np.isinf(ci[:, 1]))


def test_profile_subset_and_mesh():
    from tpusysbio.utils import make_mesh

    target = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    sigma = jnp.asarray([0.5, 2.0, 1.0, 0.25])
    r_fn, rj_fn = _quadratic_fns(target, sigma)
    mesh = make_mesh()  # conftest fakes 8 CPU devices
    idx = [0, 1, 2, 3]
    if (2 * len(idx)) % mesh.devices.size != 0:
        pytest.skip("chain axis not divisible by mesh size")
    res = profile_likelihood(r_fn, rj_fn, target, idx=idx,
                             n_points=3, span=1.0, mesh=mesh,
                             config=FitConfig(max_iter=30))
    assert res.costs.shape == (4, 7)
    expect = 0.5 * (np.asarray(res.values) - np.asarray(target)[:, None]) \
        ** 2 / np.asarray(sigma)[:, None] ** 2
    np.testing.assert_allclose(np.asarray(res.costs), expect, atol=1e-10)
