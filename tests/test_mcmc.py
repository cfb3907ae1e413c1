"""Ensemble MCMC tests (fit/mcmc.py — emcee-style stretch move).

The exact oracle is the linear-Gaussian case: residuals ``r = Aθ − b``
give a posterior that IS ``N(θ*, (AᵀA)⁻¹)``, so sampled moments must
match analytic moments to Monte-Carlo error. Plus determinism, invalid-
region rejection, and an ODE-posterior smoke against the LM covariance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusysbio.fit import autocorr_time, ensemble_sample


def _linear_gaussian():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(12, 3)))
    theta_true = jnp.asarray([1.0, -0.5, 2.0])
    b = A @ theta_true
    cov = np.linalg.inv(np.asarray(A.T @ A))
    logp = lambda th: -0.5 * jnp.sum((A @ th - b) ** 2)  # noqa: E731
    return logp, np.asarray(theta_true), cov


def test_linear_gaussian_moments():
    logp, mean, cov = _linear_gaussian()
    W, G = 64, 3
    x0 = jnp.asarray(mean + 0.1 * np.random.default_rng(1)
                     .normal(size=(W, G)))
    res = ensemble_sample(logp, x0, n_steps=2000, key=jax.random.PRNGKey(2))
    assert res.chain.shape == (2000, W, G)
    samp = np.asarray(res.flat(burn=500))
    # MC error with ~10^5 correlated draws: a few percent of the scale
    np.testing.assert_allclose(samp.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samp.T), cov, rtol=0.25, atol=0.02)
    acc = np.asarray(res.acceptance)
    assert np.all(acc > 0.1) and np.all(acc < 0.9)
    tau = autocorr_time(res.chain[500:])
    assert np.all(tau > 0.5) and np.all(tau < 200.0)


def test_determinism_and_thin():
    logp, mean, _ = _linear_gaussian()
    x0 = jnp.asarray(mean + 0.05 * np.random.default_rng(3)
                     .normal(size=(16, 3)))
    a = ensemble_sample(logp, x0, 60, jax.random.PRNGKey(7))
    b = ensemble_sample(logp, x0, 60, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.chain), np.asarray(b.chain))
    t = ensemble_sample(logp, x0, 60, jax.random.PRNGKey(7), thin=3)
    assert t.chain.shape[0] == 20
    np.testing.assert_array_equal(np.asarray(t.chain),
                                  np.asarray(a.chain[2::3]))
    np.testing.assert_array_equal(np.asarray(t.acceptance),
                                  np.asarray(a.acceptance))


def test_bounded_support_rejection():
    """-inf outside a box: every kept sample stays inside, and walkers
    starting at -inf escape into the support (emcee semantics)."""
    lb, ub = jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0])

    def logp(th):
        inside = jnp.all((th > lb) & (th < ub))
        return jnp.where(inside, -0.5 * jnp.sum(th * th), -jnp.inf)

    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(32, 2)))
    # poison two walkers just outside the support — close enough that a
    # z≈1/a stretch toward an interior partner can land inside (the move
    # at most halves the distance to the partner, so a walker stranded
    # FAR outside stays at -inf forever: faithful emcee semantics, and
    # why walkers must be initialized in the support)
    x0 = x0.at[0].set(jnp.asarray([1.3, 0.0]))
    x0 = x0.at[17].set(jnp.asarray([-1.2, 0.4]))
    res = ensemble_sample(logp, x0, 300, jax.random.PRNGKey(5))
    tail = np.asarray(res.chain[100:])
    assert np.all(tail > -1.0) and np.all(tail < 1.0)
    assert np.all(np.isfinite(np.asarray(res.log_prob[100:])))


def test_validation():
    logp = lambda th: -0.5 * jnp.sum(th * th)  # noqa: E731
    with pytest.raises(ValueError):
        ensemble_sample(logp, jnp.zeros((5, 2)), 10, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        ensemble_sample(logp, jnp.zeros((2, 2)), 10, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        ensemble_sample(logp, jnp.zeros((8, 2)), 10, jax.random.PRNGKey(0),
                        thin=3)


@pytest.mark.slow
def test_ode_posterior_matches_lm_covariance():
    """On a well-identified ODE fit, the posterior of -cost(θ) is
    asymptotically N(θ*, σ²(JᵀJ)⁻¹); the sampled marginal sigmas must
    match lm_fit's param_sigma channel (the reference's curve_fit-style
    error bars) within MC/linearization tolerance."""
    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.model import library
    from tpusysbio.optim import lm_fit
    from tpusysbio.project import ParameterMap, Project

    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, 8)
    sim = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    rng = np.random.default_rng(6)
    sigma = 0.02
    data = np.asarray(sim.ys) + rng.normal(scale=sigma, size=(8, 3))
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(8, sigma)) for i in range(3))
    batch = ExperimentBatch.from_experiments([Experiment("e0", meas)])
    # fit only (k1, k2): the full 4-parameter MM problem is structurally
    # degenerate (near-singular JᵀJ), which would make the Laplace
    # covariance oracle meaningless
    names = list(model.param_names)
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "k2"),
                               fixed={n: float(p_true[names.index(n)])
                                      for n in ("km1", "E0")})
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-8, atol=1e-10))
    theta0 = pmap.pack({"k1": 10.0, "k2": 1.5})

    fit = jax.jit(lambda th: lm_fit(proj.residuals,
                                    proj.residuals_and_jacobian,
                                    th, FitConfig(max_iter=60)))(theta0)
    assert int(fit.status) > 0

    logp = lambda th: -proj.cost(th)  # noqa: E731
    W = 16
    x0 = jnp.asarray(np.asarray(fit.theta)
                     + 0.01 * rng.normal(size=(W, 2)))
    res = ensemble_sample(logp, x0, 400, jax.random.PRNGKey(8))
    samp = np.asarray(res.flat(burn=150))
    # posterior sigma vs sqrt((JᵀJ)⁻¹) — cost already carries 1/σ² rows,
    # so the Laplace covariance is (JᵀJ)⁻¹ directly (cov channel)
    lap_sigma = np.sqrt(np.diag(np.asarray(fit.cov)))
    np.testing.assert_allclose(samp.std(axis=0), lap_sigma, rtol=0.35)
    mean_err = np.abs(samp.mean(axis=0) - np.asarray(fit.theta))
    assert np.all(mean_err < 3.0 * lap_sigma), (mean_err, lap_sigma)


def test_mesh_sharded_walkers_bitwise_match():
    """log_prob_v as a shard_map over the walker-half axis: the chain is
    bitwise identical to the unsharded run (the walker axis is
    embarrassingly parallel; same PRNG stream either way)."""
    from jax.sharding import Mesh, PartitionSpec as P

    logp, mean, _ = _linear_gaussian()
    W = 32
    x0 = jnp.asarray(mean + 0.05 * np.random.default_rng(9)
                     .normal(size=(W, 3)))
    devs = np.array(jax.devices())
    if (W // 2) % devs.size:
        import pytest as _pt
        _pt.skip("walker half not divisible by device count")
    mesh = Mesh(devs, ("walkers",))
    lpv = jax.shard_map(jax.vmap(logp), mesh=mesh,
                        in_specs=P("walkers"), out_specs=P("walkers"))
    a = ensemble_sample(logp, x0, 40, jax.random.PRNGKey(11))
    b = ensemble_sample(logp, x0, 40, jax.random.PRNGKey(11),
                        log_prob_v=lpv)
    np.testing.assert_array_equal(np.asarray(a.chain), np.asarray(b.chain))
    np.testing.assert_array_equal(np.asarray(a.acceptance),
                                  np.asarray(b.acceptance))
