"""Optimizer and multi-start tests (SURVEY.md §4 items 3, 5, 7).

- LM parity vs scipy.optimize.least_squares on the same residual/Jacobian
  (same optimum to ~1e-6 in θ),
- vmapped multi-start with a poisoned member (NaN masking semantics),
- shard_map over the fake 8-device CPU mesh — identical code path to a
  real v5e-8 slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.fit import latin_hypercube, multistart_fit, uniform_starts
from tpusysbio.model import library
from tpusysbio.optim import lm_fit
from tpusysbio.project import ParameterMap, Project


def _rosenbrock_residuals(theta):
    # classic 2-param test problem: r = (10(θ1-θ0²), 1-θ0)
    return jnp.stack([10.0 * (theta[1] - theta[0] ** 2), 1.0 - theta[0]])


def _rosenbrock_rj(theta):
    r = _rosenbrock_residuals(theta)
    J = jax.jacfwd(_rosenbrock_residuals)(theta)
    return r, J


def test_lm_rosenbrock():
    theta0 = jnp.asarray([-1.2, 1.0])
    fit = jax.jit(lambda th: lm_fit(_rosenbrock_residuals, _rosenbrock_rj,
                                    th, FitConfig(max_iter=200)))(theta0)
    assert int(fit.status) > 0
    np.testing.assert_allclose(np.asarray(fit.theta), [1.0, 1.0], atol=1e-6)


def test_lm_parity_with_scipy():
    from scipy.optimize import least_squares

    def powell_r(theta):
        # Powell's badly scaled problem
        return jnp.stack([
            1e4 * theta[0] * theta[1] - 1.0,
            jnp.exp(-theta[0]) + jnp.exp(-theta[1]) - 1.0001,
        ])

    def powell_rj(theta):
        return powell_r(theta), jax.jacfwd(powell_r)(theta)

    theta0 = jnp.asarray([0.0, 1.0])
    mine = jax.jit(lambda th: lm_fit(powell_r, powell_rj, th,
                                     FitConfig(max_iter=200)))(theta0)
    ref = least_squares(
        lambda th: np.asarray(powell_r(jnp.asarray(th))), np.asarray(theta0),
        jac=lambda th: np.asarray(jax.jacfwd(powell_r)(jnp.asarray(th))),
        method="lm")
    assert int(mine.status) > 0
    assert abs(float(mine.cost) - 0.5 * np.sum(ref.fun**2)) < 1e-12


import functools


@functools.lru_cache(maxsize=1)
def _mm_problem():
    # cached for the session: six tests share this builder, and each
    # build pays a tight-tolerance (rtol=1e-10) data-generating solve
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, 8)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    rng = np.random.default_rng(0)
    sigma = 0.01
    data = np.asarray(res.ys) + rng.normal(scale=sigma, size=(8, 3))
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(8, sigma)) for i in range(3))
    batch = ExperimentBatch.from_experiments([Experiment("e0", meas)])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "km1", "k2", "E0"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-7, atol=1e-10))
    theta_true = pmap.pack({"k1": 10.0, "km1": 1.0, "k2": 1.5, "E0": 0.5})
    return proj, theta_true


@pytest.mark.slow
def test_multistart_mm_vmapped():
    proj, theta_true = _mm_problem()
    key = jax.random.PRNGKey(0)
    lo = theta_true - 1.0
    hi = theta_true + 1.0
    starts = latin_hypercube(key, 8, lo, hi)
    # poison one member with a hopeless start (huge rates -> stiff failure)
    starts = starts.at[3].set(jnp.full((4,), 20.0))
    out = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                         starts, FitConfig(max_iter=40))
    best = out.best()
    assert int(best.status) > 0
    assert bool(jnp.isfinite(best.cost))
    # truth should be (near-)recovered by the best member
    assert float(best.cost) < 1.2 * float(proj.cost(theta_true))
    # the poisoned member must not poison the others
    assert np.isfinite(np.asarray(out.cost)[np.asarray(out.status) > 0]).all()


@pytest.mark.slow
def test_multistart_sharded_mesh():
    """Fake 8-device CPU mesh == real v5e-8 code path (SURVEY.md §4 item 5)."""
    devs = jax.devices()
    assert len(devs) == 8, "conftest must fake 8 host devices"
    proj, theta_true = _mm_problem()
    mesh = Mesh(np.array(devs), ("starts",))
    starts = uniform_starts(jax.random.PRNGKey(1), 16, theta_true - 0.5,
                            theta_true + 0.5)
    out = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                         starts, FitConfig(max_iter=30), mesh=mesh)
    # deterministic: sharded == unsharded member-for-member
    out2 = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                          starts, FitConfig(max_iter=30))
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(out2.cost),
                               rtol=1e-9)
    assert int(out.best().status) > 0


def test_sampling_shapes_and_determinism():
    lo = jnp.asarray([-1.0, 0.0, 2.0])
    hi = jnp.asarray([1.0, 3.0, 4.0])
    a = latin_hypercube(jax.random.PRNGKey(7), 64, lo, hi)
    b = latin_hypercube(jax.random.PRNGKey(7), 64, lo, hi)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (64, 3)
    assert bool(jnp.all(a >= lo) and jnp.all(a <= hi))
    # LHS stratification: each of 64 strata hit exactly once per dim
    strata = np.floor((np.asarray(a) - np.asarray(lo))
                      / (np.asarray(hi - lo)) * 64).astype(int)
    for d in range(3):
        assert len(np.unique(strata[:, d])) == 64


def test_checkpoint_resume(tmp_path):
    theta0s = jnp.tile(jnp.asarray([-1.2, 1.0]), (4, 1))
    ck = str(tmp_path / "ck.npz")
    cfg = FitConfig(max_iter=100)
    out = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                         cfg, checkpoint_path=ck, chunk_size=2)
    assert out.cost.shape == (4,)
    # resume: results identical, no recompute of completed chunks
    out2 = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                          cfg, checkpoint_path=ck, chunk_size=2)
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(out2.cost))
    # the checkpointed path carries EVERY per-member channel the plain
    # path does — incl. cov/param_sigma (the reference's leastsq cov_x,
    # scipy/optimize/_minpack_py.py:482-501) and the cost trace
    plain = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                           cfg)
    for field in ("theta", "cost", "grad_norm", "status", "n_iter",
                  "cov", "param_sigma", "cost_trace"):
        a, b = getattr(out, field), getattr(plain, field)
        assert a is not None and b is not None, field
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12, err_msg=field)
    # resumed result carries them too
    assert out2.cov is not None and out2.cost_trace is not None


def test_checkpoint_resume_rejects_incompatible(tmp_path):
    """Stale checkpoints — truncated files, older formats missing the
    cov channels, or a different max_iter (cost_trace shape) — must
    trigger a clean restart from chunk 0, never a silent channel drop or
    a concatenate crash."""
    theta0s = jnp.tile(jnp.asarray([-1.2, 1.0]), (4, 1))
    cfg = FitConfig(max_iter=50)

    def run(ck):
        return multistart_fit(_rosenbrock_residuals, _rosenbrock_rj,
                              theta0s, cfg, checkpoint_path=ck,
                              chunk_size=2)

    plain = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj,
                           theta0s, cfg)

    # (a) truncated/corrupt file (crash mid-write of a pre-atomic writer)
    ck = str(tmp_path / "corrupt.npz")
    with open(ck, "wb") as f:
        f.write(b"PK\x03\x04 truncated")
    out = run(ck)
    np.testing.assert_allclose(np.asarray(out.cost),
                               np.asarray(plain.cost))
    assert out.cov is not None

    # (b) old-format checkpoint without the cov/param_sigma/cost_trace
    # channels: must restart, not resume into a cov-less result
    ck = str(tmp_path / "oldfmt.npz")
    np.savez(ck, chunks_done=1,
             theta=np.zeros((2, 2)), cost=np.zeros(2),
             grad_norm=np.zeros(2), status=np.ones(2, np.int32),
             n_iter=np.ones(2, np.int32))
    out = run(ck)
    np.testing.assert_allclose(np.asarray(out.cost),
                               np.asarray(plain.cost))
    assert out.cov is not None and out.cost_trace is not None

    # (c) checkpoint from a run with a different max_iter: cost_trace
    # width mismatch — restart instead of np.concatenate ValueError
    ck = str(tmp_path / "maxiter.npz")
    other = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj,
                           theta0s, FitConfig(max_iter=7),
                           checkpoint_path=ck, chunk_size=2)
    assert other.cost_trace.shape[1] == 7
    out = run(ck)
    assert out.cost_trace.shape[1] == 50
    np.testing.assert_allclose(np.asarray(out.cost),
                               np.asarray(plain.cost))


def test_checkpoint_digest_covers_config_and_tag(tmp_path):
    """Resuming after a tolerance/eval-mode change or under a different
    objective tag must restart from chunk 0 — mixing chunks of two
    different runs is silent corruption (ADVICE r3: the digest previously
    fingerprinted only starts/chunking/trace_len)."""
    from tpusysbio.fit.multistart import (make_multistart_runner,
                                          run_chunked)

    theta0s = jnp.asarray([[-1.2, 1.0], [-0.5, 0.5],
                           [0.3, -0.2], [1.5, 2.0]])
    cfg = FitConfig(max_iter=10)
    runner = make_multistart_runner(_rosenbrock_residuals, _rosenbrock_rj,
                                    cfg)
    ck = str(tmp_path / "digest.npz")
    _, resumed = run_chunked(runner, theta0s, 2, checkpoint_path=ck,
                             trace_len=cfg.max_iter, config=cfg,
                             run_tag="rosenbrock")
    assert resumed == 0
    # same config + tag: resumes all chunks
    _, resumed = run_chunked(runner, theta0s, 2, checkpoint_path=ck,
                             trace_len=cfg.max_iter, config=cfg,
                             run_tag="rosenbrock")
    assert resumed == 2
    # changed ftol (same max_iter, so trace shapes are compatible and the
    # pre-fix digest would wrongly resume): restart
    cfg2 = FitConfig(max_iter=10, ftol=1e-3)
    runner2 = make_multistart_runner(_rosenbrock_residuals, _rosenbrock_rj,
                                     cfg2)
    _, resumed = run_chunked(runner2, theta0s, 2, checkpoint_path=ck,
                             trace_len=cfg2.max_iter, config=cfg2,
                             run_tag="rosenbrock")
    assert resumed == 0
    # different objective identity (run_tag): restart
    _, resumed = run_chunked(runner2, theta0s, 2, checkpoint_path=ck,
                             trace_len=cfg2.max_iter, config=cfg2,
                             run_tag="other-model")
    assert resumed == 0


def test_run_chunked_rank_channels(tmp_path):
    """Screening mode: with_cov=False runner + channels='rank' carries
    only ranking channels (cov None), matches the full path's ranking,
    and resumes; channels='all' with a cov-less runner raises."""
    from tpusysbio.fit.multistart import (make_multistart_runner,
                                          run_chunked)

    theta0s = jnp.asarray([[-1.2, 1.0], [-0.5, 0.5],
                           [0.3, -0.2], [1.5, 2.0]])
    cfg = FitConfig(max_iter=10)
    light = make_multistart_runner(_rosenbrock_residuals, _rosenbrock_rj,
                                   cfg, iter_chunk=4, with_cov=False)
    ck = str(tmp_path / "rank.npz")
    res, resumed = run_chunked(light, theta0s, 2, checkpoint_path=ck,
                               trace_len=cfg.max_iter, channels="rank")
    assert resumed == 0
    assert res.cov is None and res.param_sigma is None
    full = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                          cfg)
    np.testing.assert_allclose(np.asarray(res.cost),
                               np.asarray(full.cost), rtol=1e-12)
    # resume skips all completed chunks
    res2, resumed2 = run_chunked(light, theta0s, 2, checkpoint_path=ck,
                                 trace_len=cfg.max_iter, channels="rank")
    assert resumed2 == 2
    np.testing.assert_allclose(np.asarray(res2.cost),
                               np.asarray(res.cost))
    # a cov-less runner cannot honor the full-channel contract
    with np.testing.assert_raises(ValueError):
        run_chunked(light, theta0s, 2, trace_len=cfg.max_iter,
                    channels="all")


def test_trf_subproblem_validated():
    from tpusysbio.optim import trf_fit

    with np.testing.assert_raises(ValueError):
        trf_fit(_rosenbrock_residuals, _rosenbrock_rj,
                jnp.asarray([-1.2, 1.0]), jnp.asarray([-2.0, -2.0]),
                jnp.asarray([2.0, 2.0]), subproblem="SVD")


def test_trf_bounded_matches_scipy():
    """Bounded TRF: same optimum as scipy least_squares(method='trf')."""
    from scipy.optimize import least_squares

    from tpusysbio.optim import trf_fit

    # bounded Rosenbrock: unconstrained optimum (1,1) outside the box
    lb = jnp.asarray([-2.0, -2.0])
    ub = jnp.asarray([0.8, 2.0])

    def rj(theta):
        return _rosenbrock_residuals(theta), jax.jacfwd(
            _rosenbrock_residuals)(theta)

    theta0 = jnp.asarray([-1.2, 1.0])
    mine = jax.jit(lambda th: trf_fit(_rosenbrock_residuals, rj, th, lb, ub,
                                      FitConfig(max_iter=300)))(theta0)
    ref = least_squares(
        lambda th: np.asarray(_rosenbrock_residuals(jnp.asarray(th))),
        np.asarray(theta0),
        jac=lambda th: np.asarray(
            jax.jacfwd(_rosenbrock_residuals)(jnp.asarray(th))),
        bounds=(np.asarray(lb), np.asarray(ub)), method="trf")
    assert int(mine.status) > 0
    # both land on the boundary optimum
    assert abs(float(mine.cost) - 0.5 * np.sum(ref.fun ** 2)) < 1e-8
    np.testing.assert_allclose(np.asarray(mine.theta), ref.x, atol=1e-4)
    # bounds respected
    assert np.all(np.asarray(mine.theta) <= np.asarray(ub) + 1e-12)
    assert np.all(np.asarray(mine.theta) >= np.asarray(lb) - 1e-12)


def test_trf_interior_matches_lm():
    """With inactive bounds TRF reduces to the unconstrained optimum."""
    from tpusysbio.optim import trf_fit

    lb = jnp.asarray([-10.0, -10.0])
    ub = jnp.asarray([10.0, 10.0])

    def rj(theta):
        return _rosenbrock_residuals(theta), jax.jacfwd(
            _rosenbrock_residuals)(theta)

    mine = trf_fit(_rosenbrock_residuals, rj, jnp.asarray([-1.2, 1.0]),
                   lb, ub, FitConfig(max_iter=300))
    assert int(mine.status) > 0
    np.testing.assert_allclose(np.asarray(mine.theta), [1.0, 1.0],
                               atol=1e-5)


def test_lm_lockstep_mode_same_optimum():
    """eval_mode='lockstep' (ensemble-optimized) reaches the same optimum."""
    theta0 = jnp.asarray([-1.2, 1.0])
    a = lm_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0,
               FitConfig(max_iter=200))
    b = lm_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0,
               FitConfig(max_iter=200, eval_mode="lockstep"))
    assert int(a.status) > 0 and int(b.status) > 0
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               atol=1e-8)
    assert int(b.nfev) == 0  # lockstep never does residual-only passes


def test_multistart_iter_chunked_matches_unchunked():
    """iter_chunk advances fits in bounded device calls; same results."""
    theta0s = jnp.asarray([[-1.2, 1.0], [0.5, 0.5], [2.0, -1.0]])
    a = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=60))
    b = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=60), iter_chunk=7)
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.n_iter),
                                  np.asarray(b.n_iter))


@pytest.mark.slow
def test_multistart_iter_chunked_sharded():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("starts",))
    theta0s = jnp.tile(jnp.asarray([-1.2, 1.0]), (8, 1)) \
        + 0.01 * jnp.arange(8)[:, None]
    a = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=60), mesh=mesh, iter_chunk=9)
    b = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=60))
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost),
                               rtol=1e-10)


@pytest.mark.slow
def test_two_phase_multistart():
    """Mixed/loose screening + f64/tight polish reaches the tight optimum."""
    import dataclasses

    from tpusysbio.fit.multistart import multistart_two_phase

    proj_tight, theta_true = _mm_problem()
    proj_screen = dataclasses.replace(
        proj_tight, config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=256,
                                        mixed_precision=True))
    starts = latin_hypercube(jax.random.PRNGKey(2), 8, theta_true - 1.0,
                             theta_true + 1.0)
    polish, screen = multistart_two_phase(
        (proj_screen.residuals, proj_screen.residuals_and_jacobian),
        (proj_tight.residuals, proj_tight.residuals_and_jacobian),
        starts,
        FitConfig(max_iter=15, eval_mode="lockstep", ftol=1e-4, xtol=1e-4),
        FitConfig(max_iter=30), top_k=2)
    best = polish.best()
    assert int(best.status) > 0
    assert float(best.cost) < 1.2 * float(proj_tight.cost(theta_true))


def test_covariance_matches_scipy_leastsq():
    """FitResult.cov == scipy.optimize.leastsq cov_x (reference parity:
    scipy/optimize/_minpack_py.py:482-501) on Powell's problem."""
    from scipy.optimize import leastsq

    def powell_r(theta):
        return jnp.stack([
            1e4 * theta[0] * theta[1] - 1.0,
            jnp.exp(-theta[0]) + jnp.exp(-theta[1]) - 1.0001,
        ])

    def powell_rj(theta):
        return powell_r(theta), jax.jacfwd(powell_r)(theta)

    theta0 = jnp.asarray([0.0, 1.0])
    mine = lm_fit(powell_r, powell_rj, theta0, FitConfig(max_iter=200))
    _, cov_x, info, _, ier = leastsq(
        lambda th: np.asarray(powell_r(jnp.asarray(th))),
        np.asarray(theta0),
        Dfun=lambda th: np.asarray(jax.jacfwd(powell_r)(jnp.asarray(th))),
        full_output=True)
    assert ier in (1, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(mine.cov), cov_x, rtol=5e-3)
    # sigma = sqrt(diag(cov) * 2 cost/(m-p)): m == p here -> inf by contract
    assert np.all(np.isinf(np.asarray(mine.param_sigma)))


@pytest.mark.slow
def test_covariance_mm_fit():
    """Error bars on the MM fit: cov at the optimum matches scipy leastsq's
    cov_x through the same ODE residuals, and the true parameters lie
    within a few sigma."""
    from scipy.optimize import leastsq

    proj, theta_true = _mm_problem()
    theta0 = theta_true + jnp.asarray([0.3, -0.2, 0.1, -0.1])
    mine = lm_fit(proj.residuals, proj.residuals_and_jacobian, theta0,
                  FitConfig(max_iter=60))
    assert int(mine.status) > 0
    r_jit = jax.jit(proj.residuals)
    j_jit = jax.jit(lambda th: proj.residuals_and_jacobian(th)[1])
    _, cov_x, _, _, ier = leastsq(
        lambda th: np.asarray(r_jit(jnp.asarray(th))), np.asarray(theta0),
        Dfun=lambda th: np.asarray(j_jit(jnp.asarray(th))),
        full_output=True)
    assert ier in (1, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(mine.cov), cov_x, rtol=1e-2)
    sig = np.asarray(mine.param_sigma)
    assert np.all(np.isfinite(sig)) and np.all(sig > 0)
    assert np.all(np.abs(np.asarray(mine.theta - theta_true)) < 5 * sig)


def test_multistart_compaction_matches_unchunked():
    """Converged members exit the lockstep between chunks (compaction);
    results identical to the plain path member-for-member."""
    rng = np.random.default_rng(5)
    theta0s = jnp.asarray(rng.normal(scale=1.0, size=(16, 2)))
    a = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=120))
    b = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=120), iter_chunk=5, compact=True)
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.n_iter),
                                  np.asarray(b.n_iter))
    np.testing.assert_array_equal(np.asarray(a.status),
                                  np.asarray(b.status))


@pytest.mark.slow
def test_multistart_compaction_under_mesh():
    """Compaction is legal under a mesh: repacked batches stay divisible
    by the device count and survivors reshard; results identical to the
    plain unsharded path (the long-tailed-convergence production shape on
    a v5e-8)."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("starts",))
    rng = np.random.default_rng(9)
    theta0s = jnp.asarray(rng.normal(scale=1.0, size=(32, 2)))
    a = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=120))
    b = multistart_fit(_rosenbrock_residuals, _rosenbrock_rj, theta0s,
                       FitConfig(max_iter=120), mesh=mesh, iter_chunk=5,
                       compact=True)
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.status),
                                  np.asarray(b.status))


@pytest.mark.slow
def test_two_phase_mesh_pallas_matches_unsharded():
    """The headline-shaped program on the fake 8-device mesh: iter-chunked
    TWO-PHASE multistart with linear_solver='pallas' (interpret mode on
    CPU) under Mesh(('starts',)) — top-k ranking parity with the
    unsharded run (SURVEY.md §4 item 5; VERDICT round-2 #7)."""
    import dataclasses

    from tpusysbio.fit.multistart import multistart_two_phase

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("starts",))
    proj_tight, theta_true = _mm_problem()
    proj_tight = dataclasses.replace(
        proj_tight, config=dataclasses.replace(
            proj_tight.config, linear_solver="pallas"))
    proj_screen = dataclasses.replace(
        proj_tight, config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=256,
                                        mixed_precision=True,
                                        linear_solver="pallas"))
    starts = latin_hypercube(jax.random.PRNGKey(3), 16, theta_true - 1.0,
                             theta_true + 1.0)
    screen_cfg = FitConfig(max_iter=6, eval_mode="lockstep",
                           ftol=1e-4, xtol=1e-4)
    polish_cfg = FitConfig(max_iter=20, eval_mode="lockstep")
    fns_s = (proj_screen.residuals, proj_screen.residuals_and_jacobian)
    fns_p = (proj_tight.residuals, proj_tight.residuals_and_jacobian)
    mesh_res, _ = multistart_two_phase(
        fns_s, fns_p, starts, screen_cfg, polish_cfg, top_k=8,
        mesh=mesh, iter_chunk=3)
    plain_res, _ = multistart_two_phase(
        fns_s, fns_p, starts, screen_cfg, polish_cfg, top_k=8)
    np.testing.assert_allclose(np.asarray(mesh_res.ranked().cost),
                               np.asarray(plain_res.ranked().cost),
                               rtol=1e-9)
    assert int(mesh_res.best().status) > 0


def test_trf_svd_subproblem_matches_normal():
    """The SVD route of the reference TRF subproblem
    (scipy/optimize/_lsq/common.py:57; f32 SVD + f64 refinement) reaches
    the same bounded optimum as the damped-normal-equations incumbent."""
    from tpusysbio.optim import trf_fit

    lb = jnp.asarray([-2.0, -2.0])
    ub = jnp.asarray([0.8, 2.0])

    def rj(theta):
        return _rosenbrock_residuals(theta), jax.jacfwd(
            _rosenbrock_residuals)(theta)

    theta0 = jnp.asarray([-1.2, 1.0])
    a = jax.jit(lambda th: trf_fit(_rosenbrock_residuals, rj, th, lb, ub,
                                   FitConfig(max_iter=300)))(theta0)
    b = jax.jit(lambda th: trf_fit(_rosenbrock_residuals, rj, th, lb, ub,
                                   FitConfig(max_iter=300),
                                   subproblem="svd"))(theta0)
    assert int(a.status) > 0 and int(b.status) > 0
    np.testing.assert_allclose(np.asarray(b.theta), np.asarray(a.theta),
                               atol=1e-6)
    assert abs(float(b.cost) - float(a.cost)) < 1e-9


def test_two_phase_library_checkpoint_resume(tmp_path):
    """The library-grade two-phase path (VERDICT r3 #7): screen chunking,
    pad-to-chunk-multiple, atomic checkpointing, and validated resume are
    all inside fit.multistart — a production user gets the crash-protected
    path without bench orchestration."""
    from tpusysbio.fit.multistart import multistart_two_phase

    rng = np.random.default_rng(5)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(10, 2)))
    ck = str(tmp_path / "twophase.npz")
    screen_cfg = FitConfig(max_iter=6, ftol=1e-3, xtol=1e-3)
    polish_cfg = FitConfig(max_iter=100)
    fns = (_rosenbrock_residuals, _rosenbrock_rj)

    polish, screen, info = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=2,
        chunk_size=4, checkpoint_path=ck, run_tag="rosen",
        return_info=True)
    # N=10 pads to 12 = 3 chunks of 4; pads dropped before ranking
    assert info["n_pad"] == 2 and info["chunks_resumed"] == 0
    assert screen.cost.shape == (10,)
    assert screen.cov is None  # rank channels by default
    assert polish.cov is not None  # polish keeps the full cov_x contract
    np.testing.assert_allclose(np.asarray(polish.best().theta),
                               [1.0, 1.0], atol=1e-6)

    # a second run resumes every screening chunk from the checkpoint and
    # reproduces the results bit-for-bit
    polish2, screen2, info2 = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=2,
        chunk_size=4, checkpoint_path=ck, run_tag="rosen",
        return_info=True)
    assert info2["chunks_resumed"] == 3
    np.testing.assert_array_equal(np.asarray(screen.cost),
                                  np.asarray(screen2.cost))
    np.testing.assert_array_equal(np.asarray(polish.cost),
                                  np.asarray(polish2.cost))

    # a different run_tag is a DIFFERENT run: no silent chunk mixing
    _, _, info3 = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=2,
        chunk_size=4, checkpoint_path=ck, run_tag="other",
        return_info=True)
    assert info3["chunks_resumed"] == 0


def test_run_chunked_overlap_matches_serial(tmp_path):
    """Pipelined chunk execution (dispatch chunk c+1 before materializing
    chunk c) is a pure latency optimization: results AND checkpoint
    contents must be bit-identical with the strictly serial path."""
    from tpusysbio.fit.multistart import (make_multistart_runner,
                                          run_chunked)

    rng = np.random.default_rng(7)
    theta0s = jnp.asarray(rng.uniform(-1.5, 1.5, size=(8, 2)))
    cfg = FitConfig(max_iter=25)
    runner = make_multistart_runner(_rosenbrock_residuals, _rosenbrock_rj,
                                    cfg)
    ck_a = str(tmp_path / "a.npz")
    ck_b = str(tmp_path / "b.npz")
    res_a, _ = run_chunked(runner, theta0s, 2, checkpoint_path=ck_a,
                           trace_len=cfg.max_iter, config=cfg,
                           overlap=True)
    res_b, _ = run_chunked(runner, theta0s, 2, checkpoint_path=ck_b,
                           trace_len=cfg.max_iter, config=cfg,
                           overlap=False)
    for field in ("theta", "cost", "grad_norm", "status", "n_iter",
                  "cov", "param_sigma", "cost_trace"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_a, field)),
            np.asarray(getattr(res_b, field)), err_msg=field)
    a, b = np.load(ck_a), np.load(ck_b)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # a resumed overlapped run skips every chunk and reproduces results
    res_c, resumed = run_chunked(runner, theta0s, 2, checkpoint_path=ck_a,
                                 trace_len=cfg.max_iter, config=cfg)
    assert resumed == 4
    np.testing.assert_array_equal(np.asarray(res_a.cost),
                                  np.asarray(res_c.cost))


def test_two_phase_polish_subbatch_matches_full():
    """Cost-sorted polish sub-batches (lockstep-union mitigation,
    docs/PERFORMANCE.md roadmap #1) must reproduce the single-batch
    polish member-for-member: the polish input is the ranked screen
    top_k either way, only the lockstep grouping differs."""
    from tpusysbio.fit.multistart import multistart_two_phase

    rng = np.random.default_rng(11)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(12, 2)))
    screen_cfg = FitConfig(max_iter=6, ftol=1e-3, xtol=1e-3)
    polish_cfg = FitConfig(max_iter=60)
    fns = (_rosenbrock_residuals, _rosenbrock_rj)

    full, screen_f = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=4)
    sub, screen_s = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=4,
        polish_subbatch=2)
    np.testing.assert_array_equal(np.asarray(screen_f.cost),
                                  np.asarray(screen_s.cost))
    for field in ("theta", "cost", "status", "n_iter", "theta0"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, field)),
            np.asarray(getattr(sub, field)), err_msg=field)
    # sub-batch size must divide top_k — fail loudly, not mis-slice
    with pytest.raises(ValueError):
        multistart_two_phase(fns, fns, starts, screen_cfg, polish_cfg,
                             top_k=4, polish_subbatch=3)


@pytest.mark.parametrize("loss,f_scale", [("soft_l1", 1.0),
                                          ("huber", 0.5),
                                          ("cauchy", 2.0),
                                          ("arctan", 1.0)])
def test_trf_robust_loss_matches_scipy(loss, f_scale):
    """Robust losses: same optimum and robust cost as scipy
    least_squares(loss=..., f_scale=...) on a fit with outliers
    (spec: scipy/optimize/_lsq/least_squares.py construct_loss_function,
    common.py scale_for_robust_loss_function)."""
    from scipy.optimize import least_squares

    from tpusysbio.optim import trf_fit

    # exponential-decay curve with two gross outliers
    t = np.linspace(0.0, 5.0, 24)
    y = 3.0 * np.exp(-0.8 * t) + 0.3
    rng = np.random.default_rng(3)
    y_noisy = y + rng.normal(scale=0.02, size=t.shape)
    y_noisy[5] += 2.5
    y_noisy[17] -= 1.8
    tj, yj = jnp.asarray(t), jnp.asarray(y_noisy)

    def resid(th):
        a, k, c = th
        return a * jnp.exp(-k * tj) + c - yj

    def rj(th):
        return resid(th), jax.jacfwd(resid)(th)

    theta0 = jnp.asarray([1.0, 1.0, 0.0])
    lb = jnp.asarray([-10.0, -10.0, -10.0])
    ub = jnp.asarray([10.0, 10.0, 10.0])
    mine = jax.jit(lambda th: trf_fit(
        resid, rj, th, lb, ub, FitConfig(max_iter=200),
        loss=loss, f_scale=f_scale))(theta0)
    ref = least_squares(
        lambda th: np.asarray(resid(jnp.asarray(th))), np.asarray(theta0),
        jac=lambda th: np.asarray(jax.jacfwd(resid)(jnp.asarray(th))),
        loss=loss, f_scale=f_scale, method="trf")
    assert int(mine.status) > 0 and ref.success
    np.testing.assert_allclose(np.asarray(mine.theta), ref.x,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mine.cost), ref.cost, rtol=1e-6)
    # robustness semantics: the decay rate lands closer to the truth
    # (0.8) than the plain-least-squares fit dragged by the outliers
    plain = trf_fit(resid, rj, theta0, lb, ub, FitConfig(max_iter=200))
    assert (abs(float(mine.theta[1]) - 0.8)
            < abs(float(plain.theta[1]) - 0.8))


def test_trf_robust_loss_validation_and_linear_default():
    from tpusysbio.optim import trf_fit
    from tpusysbio.optim.loss import make_loss

    with pytest.raises(ValueError):
        make_loss("l1", 1.0)
    with pytest.raises(ValueError):
        make_loss("huber", 0.0)
    lb = jnp.asarray([-10.0, -10.0])
    ub = jnp.asarray([10.0, 10.0])
    base = trf_fit(_rosenbrock_residuals, _rosenbrock_rj,
                   jnp.asarray([-1.2, 1.0]), lb, ub,
                   FitConfig(max_iter=200))
    lin = trf_fit(_rosenbrock_residuals, _rosenbrock_rj,
                  jnp.asarray([-1.2, 1.0]), lb, ub,
                  FitConfig(max_iter=200), loss="linear", f_scale=2.0)
    np.testing.assert_array_equal(np.asarray(base.theta),
                                  np.asarray(lin.theta))


def test_multistart_trf_iter_chunked_matches_plain():
    """The TRF state is a resumable pytree: iter-chunked bounded
    multi-start reproduces the single-execution path bit-for-bit."""
    from tpusysbio.fit.multistart import multistart_trf

    rng = np.random.default_rng(5)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(6, 2)))
    lb = jnp.asarray([-2.0, -2.0])
    ub = jnp.asarray([0.8, 2.0])   # optimum (1,1) outside: bound active
    cfg = FitConfig(max_iter=60)
    a = multistart_trf(_rosenbrock_residuals, _rosenbrock_rj, starts,
                       lb, ub, cfg)
    b = multistart_trf(_rosenbrock_residuals, _rosenbrock_rj, starts,
                       lb, ub, cfg, iter_chunk=7)
    np.testing.assert_array_equal(np.asarray(a.cost), np.asarray(b.cost))
    np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))
    # bounds honored by every member
    assert np.all(np.asarray(a.theta) <= np.asarray(ub)[None, :] + 1e-12)


def test_two_phase_bounded_polish():
    """LM screen + bounded TRF polish (the shape multistart_trf's
    docstring promises): bounds are enforced on the polished members, and
    the ranked polish costs match an unsharded multistart_trf run on the
    same screened top_k — on the fake 8-device mesh with iter-chunking,
    i.e. the full production path (VERDICT r4 item 3)."""
    from tpusysbio.fit.multistart import (
        TwoPhaseDriver,
        multistart_trf,
    )

    rng = np.random.default_rng(9)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(16, 2)))
    lb = jnp.asarray([-2.0, -2.0])
    ub = jnp.asarray([0.8, 2.0])   # unconstrained optimum (1,1) infeasible
    screen_cfg = FitConfig(max_iter=6, ftol=1e-3, xtol=1e-3)
    polish_cfg = FitConfig(max_iter=60)
    fns = (_rosenbrock_residuals, _rosenbrock_rj)
    mesh = Mesh(np.array(jax.devices()), ("starts",))

    driver = TwoPhaseDriver(
        fns, fns, screen_cfg, polish_cfg, top_k=8, mesh=mesh,
        iter_chunk=5, polish_bounds=(lb, ub))
    polish, screen, _ = driver.run(starts)

    th = np.asarray(polish.theta)
    assert np.all(th <= np.asarray(ub)[None, :] + 1e-12)
    assert np.all(th >= np.asarray(lb)[None, :] - 1e-12)
    assert np.all(np.asarray(polish.status) > 0)

    # reference: unsharded bounded fits from the SAME screened top_k
    order = np.argsort(np.where(np.asarray(screen.status) < 0, np.inf,
                                np.asarray(screen.cost)), kind="stable")
    top = jnp.asarray(np.asarray(screen.theta)[order[:8]])
    ref = multistart_trf(*fns, top, lb, ub, polish_cfg)
    np.testing.assert_allclose(
        np.sort(np.asarray(polish.cost)), np.sort(np.asarray(ref.cost)),
        rtol=1e-10)


def test_two_phase_presorted_screen_matches_unsorted():
    """Probe-sorted screen chunking (TwoPhaseDriver presort_fn) is a pure
    execution-order optimization: per-member fits are independent, so the
    screen results must be field-for-field identical with the unsorted
    run, returned in the caller's original start order."""
    from tpusysbio.fit.multistart import multistart_two_phase

    rng = np.random.default_rng(11)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(10, 2)))
    screen_cfg = FitConfig(max_iter=6, ftol=1e-3, xtol=1e-3)
    polish_cfg = FitConfig(max_iter=100)
    fns = (_rosenbrock_residuals, _rosenbrock_rj)

    # key: initial cost — reorders the chunks (and exercises the
    # expensive-last pad path, N=10 -> 12 with 2 pads)
    presort = jax.jit(jax.vmap(
        lambda th: 0.5 * jnp.sum(_rosenbrock_residuals(th) ** 2)))
    keys = np.asarray(presort(starts))
    assert not np.all(np.argsort(keys, kind="stable")
                      == np.arange(len(keys)))  # the sort is non-trivial

    sorted_run = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=2,
        chunk_size=4, presort_fn=presort, return_info=True)
    plain_run = multistart_two_phase(
        fns, fns, starts, screen_cfg, polish_cfg, top_k=2,
        chunk_size=4, return_info=True)

    for a, b in ((sorted_run, plain_run),):
        np.testing.assert_array_equal(np.asarray(a[1].cost),
                                      np.asarray(b[1].cost))
        np.testing.assert_array_equal(np.asarray(a[1].theta),
                                      np.asarray(b[1].theta))
        np.testing.assert_array_equal(np.asarray(a[1].status),
                                      np.asarray(b[1].status))
        np.testing.assert_array_equal(np.asarray(a[1].theta0),
                                      np.asarray(b[1].theta0))
        np.testing.assert_allclose(np.asarray(a[0].best().theta),
                                   np.asarray(b[0].best().theta),
                                   rtol=1e-12)
    assert sorted_run[2]["presort_seconds"] > 0.0
