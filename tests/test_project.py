"""Project-layer algebra tests (SURVEY.md §4 item 4).

Autodiff is the oracle: the hand-assembled residual Jacobian (sensitivities
+ scale-factor chain rule + log transform) must match finite differences of
the residual function, and the analytic scale factor must minimize the
weighted SSR over brute-force scans.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.model import library
from tpusysbio.project import ParameterMap, Project
from tpusysbio.project.scale_factors import scale_factors


def _mm_project(sigma=0.02, seed=0, n_t=8):
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, n_t)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    rng = np.random.default_rng(seed)
    data = np.asarray(res.ys) + rng.normal(scale=sigma, size=(n_t, 3))
    meas = tuple(
        Measurement(obs_index=i, times=t, values=data[:, i],
                    sigmas=np.full(n_t, sigma)) for i in range(3))
    batch = ExperimentBatch.from_experiments(
        [Experiment("e0", meas)])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "km1", "k2", "E0"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-9, atol=1e-11))
    theta = pmap.pack({"k1": 10.0, "km1": 1.0, "k2": 1.5, "E0": 0.5})
    return proj, theta


def test_parameter_map_expand_and_chain():
    pm = ParameterMap.create(("a", "b", "c"), 2, shared=("a",),
                             local=("b",), fixed={"c": [1.0, 2.0]})
    assert pm.n_global == 3  # a, b[0], b[1]
    theta = jnp.log(jnp.asarray([4.0, 5.0, 6.0]))
    p = np.asarray(pm.expand(theta))
    np.testing.assert_allclose(p, [[4.0, 5.0, 1.0], [4.0, 6.0, 2.0]])
    chain = np.asarray(pm.chain(theta))
    # dp[e,i]/dθ_g = p * indicator
    np.testing.assert_allclose(chain[0, 0], [4.0, 0.0, 0.0])
    np.testing.assert_allclose(chain[1, 1], [0.0, 0.0, 6.0])
    np.testing.assert_allclose(chain[0, 2], [0.0, 0.0, 0.0])  # fixed


def test_scale_factor_is_argmin():
    rng = np.random.default_rng(1)
    sim = jnp.asarray(rng.uniform(0.5, 2.0, 20))
    data = jnp.asarray(rng.uniform(0.5, 2.0, 20))
    sig = jnp.asarray(rng.uniform(0.05, 0.2, 20))
    group = jnp.zeros(20, jnp.int32)
    mask = jnp.ones(20, bool)
    B = float(scale_factors(sim, data, 1.0 / sig**2, group, mask, 1)[0])

    def ssr(b):
        return float(jnp.sum(((b * sim - data) / sig) ** 2))

    assert ssr(B) < min(ssr(B * 1.001), ssr(B * 0.999))


def test_project_jacobian_matches_fd():
    proj, theta = _mm_project()
    r, J = jax.jit(proj.residuals_and_jacobian)(theta)
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = np.zeros(proj.n_theta)
        d[g] = eps
        fd = (np.asarray(res_fn(theta + jnp.asarray(d)))
              - np.asarray(res_fn(theta - jnp.asarray(d)))) / (2 * eps)
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(np.asarray(J)[:, g] - fd)) / scale < 1e-5


def test_project_with_scale_factors_jacobian():
    """Relative observables: B enters residuals AND the Jacobian term."""
    model = library.jak_stat()
    p_true = jnp.asarray(library.JAKSTAT_TRUE_PARAMS)
    t = np.linspace(2.0, 60.0, 10)
    res = model.simulate(p_true, (0.0, 60.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    obs = np.asarray(jax.vmap(lambda y: model.observables(y, p_true))(res.ys))
    rng = np.random.default_rng(2)
    scale_true = np.array([3.7, 0.9])  # arbitrary measurement units
    sigma = 0.05
    meas = []
    for i in range(2):
        vals = scale_true[i] * obs[:, i] * (1 + rng.normal(scale=sigma,
                                                           size=len(t)))
        meas.append(Measurement(obs_index=i, times=t, values=vals,
                                sigmas=np.full(len(t), sigma),
                                scale_group=f"g{i}"))
    batch = ExperimentBatch.from_experiments([Experiment("e0", tuple(meas))])
    assert batch.n_groups == 2
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "k2", "k3", "k4"),
                               fixed={"amp": 1.0, "tau": 6.0})
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-9, atol=1e-11))
    theta = pmap.pack({"k1": 2.5, "k2": 4.0, "k3": 0.3, "k4": 0.6})

    ev = jax.jit(lambda th: proj.evaluate(th, with_jac=True))(theta)
    # fitted scale factors recover the synthetic units
    np.testing.assert_allclose(np.asarray(ev.scale), scale_true, rtol=0.1)

    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = np.zeros(proj.n_theta)
        d[g] = eps
        fd = (np.asarray(res_fn(theta + jnp.asarray(d)))
              - np.asarray(res_fn(theta - jnp.asarray(d)))) / (2 * eps)
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(np.asarray(ev.jacobian)[:, g] - fd)) / scale \
            < 1e-5, f"theta[{g}]"


def test_experiment_axis_sharding():
    """EP analogue (SURVEY.md §2c): experiments sharded across the fake
    8-device mesh give bit-identical residuals to the unsharded path."""
    import dataclasses
    from jax.sharding import Mesh

    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, 4)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    data = np.asarray(res.ys)
    exps = []
    for e in range(8):
        meas = tuple(
            Measurement(obs_index=i, times=t,
                        values=data[:, i] * (1 + 0.01 * e),
                        sigmas=np.full(4, 0.05)) for i in range(3))
        exps.append(Experiment(f"e{e}", meas))
    batch = ExperimentBatch.from_experiments(exps)
    pmap = ParameterMap.create(model.param_names, 8,
                               shared=("k1", "km1", "k2", "E0"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=256))
    theta = pmap.pack({"k1": 10.0, "km1": 1.0, "k2": 1.5, "E0": 0.5})
    r_ref = np.asarray(jax.jit(proj.residuals)(theta))

    mesh = Mesh(np.array(jax.devices()), ("experiments",))
    proj_sh = dataclasses.replace(proj, experiment_mesh=mesh)
    r_sh = np.asarray(jax.jit(proj_sh.residuals)(theta))
    # partitioned execution reorders reductions: agreement to fp roundoff
    np.testing.assert_allclose(r_sh, r_ref, rtol=1e-6, atol=1e-9)


def _chain2_model():
    """2-state synthesis/conversion/degradation chain with a closed-form,
    nondegenerate equilibrium: x* = k1/k2, z* = k1/k3."""
    from tpusysbio.model.core import OdeModel

    def rhs(t, y, p):
        del t
        x, z = y
        k1, k2, k3 = p
        return jnp.stack([k1 - k2 * x, k2 * x - k3 * z])

    def y0(p):
        return jnp.array([0.05, 0.05], p.dtype)

    def observables(y, p):
        return y

    return OdeModel(name="chain2", n_states=2, n_params=3, n_obs=2,
                    rhs=rhs, y0=y0, observables=observables,
                    param_names=("k1", "k2", "k3"))


def test_steady_state_measurements_in_project():
    """Mixed timecourse + steady-state rows (SURVEY.md §2a #3): steady rows
    route through the algebraic Newton solve with IFT sensitivities, and
    the assembled Jacobian matches finite differences of the residuals."""
    model = _chain2_model()
    p_true = jnp.asarray([0.8, 2.0, 1.0])
    t = np.array([0.5, 1.0, 2.0])
    sim = model.simulate(p_true, (0.0, 2.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    traj = np.asarray(sim.ys)
    meas = (
        Measurement(obs_index=0, times=t, values=traj[:, 0],
                    sigmas=np.full(3, 0.05)),
        Measurement.at_steady_state(0, 0.41, 0.05),   # x* = 0.4
        Measurement.at_steady_state(1, 0.79, 0.05),   # z* = 0.8
    )
    batch = ExperimentBatch.from_experiments([Experiment("e0", meas)])
    assert batch.has_steady
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "k2", "k3"))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-9, atol=1e-11),
                   ss_t_relax=4.0)
    theta = pmap.pack({"k1": 0.8, "k2": 2.0, "k3": 1.0})

    r = np.asarray(jax.jit(proj.residuals)(theta))
    # steady rows sit after the 3 timecourse rows: (y* - data)/sigma
    np.testing.assert_allclose(r[3], (0.4 - 0.41) / 0.05, rtol=1e-7)
    np.testing.assert_allclose(r[4], (0.8 - 0.79) / 0.05, rtol=1e-7)

    _, J = jax.jit(proj.residuals_and_jacobian)(theta)
    res_fn = jax.jit(proj.residuals)
    eps = 1e-6
    for g in range(proj.n_theta):
        d = np.zeros(proj.n_theta)
        d[g] = eps
        fd = (np.asarray(res_fn(theta + jnp.asarray(d)))
              - np.asarray(res_fn(theta - jnp.asarray(d)))) / (2 * eps)
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(np.asarray(J)[:, g] - fd)) / scale < 1e-5

    # analytic IFT check on the steady rows: dx*/dk1 = 1/k2 etc., chained
    # through the log transform (dp/dtheta = p)
    Jnp = np.asarray(J)
    # row 3 is x* = k1/k2: d/dlog k1 = x*, d/dlog k2 = -x*, d/dlog k3 = 0
    np.testing.assert_allclose(Jnp[3] * 0.05, [0.4, -0.4, 0.0], atol=1e-7)
    # row 4 is z* = k1/k3
    np.testing.assert_allclose(Jnp[4] * 0.05, [0.8, 0.0, -0.8], atol=1e-7)


def test_sens_mode_theta_matches_params():
    """Reduced θ-space sensitivity propagation (sens_mode='theta': the
    chain rule moves inside the integrator, G columns instead of P)
    produces the same residuals AND Jacobian as the full params-mode
    path — on a problem with fixed parameters so G < P, exercising the
    reduced column block, plus a mass-action model exercising the
    closed-form rhs_sens_dir fast path."""
    import dataclasses

    # MM with one fixed parameter -> G=3 < P=4, generic jvp path
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, 6)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-10, atol=1e-12))
    data = np.asarray(res.ys)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(6, 0.05)) for i in range(3))
    batch = ExperimentBatch.from_experiments([Experiment("e0", meas)])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=("k1", "km1", "k2"),
                               fixed={"E0": float(p_true[3])})
    proj_p = Project(model=model, pmap=pmap, batch=batch,
                     config=SolverConfig(rtol=1e-8, atol=1e-10),
                     sens_mode="params")
    proj_t = dataclasses.replace(proj_p, sens_mode="theta")
    assert proj_t._theta_sens and not proj_p._theta_sens
    # auto picks theta when G < P
    assert dataclasses.replace(proj_p, sens_mode="auto")._theta_sens
    theta = pmap.pack({"k1": 8.0, "km1": 0.8, "k2": 1.2})
    r_p, J_p = jax.jit(proj_p.residuals_and_jacobian)(theta)
    r_t, J_t = jax.jit(proj_t.residuals_and_jacobian)(theta)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_p),
                               rtol=1e-10, atol=1e-12)
    assert J_t.shape == J_p.shape == (18, 3)
    np.testing.assert_allclose(np.asarray(J_t), np.asarray(J_p),
                               rtol=1e-6, atol=1e-9)


def test_sens_mode_theta_massaction_fast_path():
    """MAPK (mass-action): the closed-form rhs_sens_dir reduced block
    matches the full-P closed-form path chained outside."""
    import dataclasses

    model = library.mapk_huang_ferrell()
    assert model.rhs_sens_dir is not None
    p_true = library.mapk_true_params()
    t = np.linspace(20.0, 100.0, 4)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 100.0),
                         jnp.asarray(t),
                         config=SolverConfig(rtol=1e-8, atol=1e-11,
                                             max_steps=2048))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    meas = tuple(Measurement(obs_index=i, times=t, values=obs[:, i],
                             sigmas=np.full(len(t), 0.01))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("wt", meas)])
    free = [n for n in model.param_names if n.startswith("KKPP+K")][:4]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    proj_p = Project(model=model, pmap=pmap, batch=batch,
                     config=SolverConfig(rtol=1e-6, atol=1e-9,
                                         max_steps=1024),
                     sens_mode="params")
    proj_t = dataclasses.replace(proj_p, sens_mode="theta")
    theta = pmap.pack({n: p_true[model.param_names.index(n)]
                       for n in free}) + 0.1
    r_p, J_p = jax.jit(proj_p.residuals_and_jacobian)(theta)
    r_t, J_t = jax.jit(proj_t.residuals_and_jacobian)(theta)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_p),
                               rtol=1e-8, atol=1e-10)
    scale = np.maximum(np.abs(np.asarray(J_p)), 1.0)
    np.testing.assert_allclose(np.asarray(J_t) / scale,
                               np.asarray(J_p) / scale, atol=5e-6)


def test_parameter_map_grouped_sharing():
    """Condition-group sharing: one θ entry per distinct label — the
    reference's partially-shared ensembles (between all-shared and
    all-local)."""
    pm = ParameterMap.create(
        ("a", "b", "c"), 4, shared=("a",),
        grouped={"b": ["wt", "wt", "mut", "mut"]},
        fixed={"c": 2.0})
    assert pm.theta_names == ("a", "b[wt]", "b[mut]")
    theta = jnp.log(jnp.asarray([1.5, 3.0, 7.0]))
    p = np.asarray(pm.expand(theta))
    np.testing.assert_allclose(p[:, 0], 1.5)           # a everywhere
    np.testing.assert_allclose(p[:2, 1], 3.0)          # b[wt] in e0, e1
    np.testing.assert_allclose(p[2:, 1], 7.0)          # b[mut] in e2, e3
    np.testing.assert_allclose(p[:, 2], 2.0)           # fixed
    # chain rule: dp/dθ one-hot rows scale by p
    chain = np.asarray(pm.chain(theta))
    assert chain.shape == (4, 3, 3)
    np.testing.assert_allclose(chain[0, 1, 1], 3.0)    # e0 b -> b[wt]
    np.testing.assert_allclose(chain[3, 1, 2], 7.0)    # e3 b -> b[mut]
    np.testing.assert_allclose(chain[3, 1, 1], 0.0)
    # pack by full θ name
    th2 = pm.pack({"a": 1.5, "b[wt]": 3.0, "b[mut]": 7.0})
    np.testing.assert_allclose(np.asarray(th2), np.asarray(theta))
    # validation
    with pytest.raises(ValueError):
        ParameterMap.create(("a",), 2, shared=("a",),
                            grouped={"a": ["x", "y"]})
    with pytest.raises(ValueError):
        ParameterMap.create(("a", "b"), 3, shared=("a",),
                            grouped={"b": ["x", "y"]})
