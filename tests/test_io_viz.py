"""CSV experiment loading (data/io.py) and plotting (viz.py)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.data import Experiment, ExperimentBatch, Measurement
from tpusysbio.data.io import experiments_from_csv
from tpusysbio.fit import latin_hypercube, multistart_fit
from tpusysbio.model import library
from tpusysbio.project import ParameterMap, Project
from tpusysbio import viz

CSV = """experiment,observable,time,value,sigma,scale_group
e0,S,1.0,0.9,0.02,
e0,S,2.0,0.8,0.02,
e0,P,1.0,0.05,0.01,blot
e0,P,2.0,0.12,0.01,blot
e1,S,1.5,0.85,0.02,
"""


def test_csv_roundtrip_matches_handbuilt():
    model = library.michaelis_menten()
    exps = experiments_from_csv(CSV, model=model)
    assert [e.name for e in exps] == ["e0", "e1"]
    by_obs = {m.obs_index: m for m in exps[0].measurements}
    np.testing.assert_array_equal(by_obs[0].times, [1.0, 2.0])
    np.testing.assert_array_equal(by_obs[2].values, [0.05, 0.12])
    assert by_obs[2].scale_group == "blot"
    assert by_obs[0].scale_group is None
    # batch-identical with the hand-built equivalent
    hand = [
        Experiment("e0", (
            Measurement(0, [1.0, 2.0], [0.9, 0.8], [0.02, 0.02]),
            Measurement(2, [1.0, 2.0], [0.05, 0.12], [0.01, 0.01],
                        scale_group="blot"))),
        Experiment("e1", (Measurement(0, [1.5], [0.85], [0.02]),)),
    ]
    b1 = ExperimentBatch.from_experiments(exps)
    b2 = ExperimentBatch.from_experiments(hand)
    for field in ("t_eval", "values", "sigmas", "group", "mask", "m_obs"):
        np.testing.assert_array_equal(np.asarray(getattr(b1, field)),
                                      np.asarray(getattr(b2, field)))


def test_csv_settings_and_errors():
    model = library.michaelis_menten()
    exps = experiments_from_csv(
        CSV, model=model, settings={"e1": dict(fixed_params={"E0": 0.1})})
    assert exps[1].fixed_params == {"E0": 0.1}
    with pytest.raises(ValueError):
        experiments_from_csv(CSV, model=model, settings={"nope": {}})
    with pytest.raises(ValueError):
        experiments_from_csv("experiment,time\ne0,1\n")
    with pytest.raises(ValueError):  # name resolution needs the model
        experiments_from_csv(CSV)
    dup = CSV + "e1,S,1.5,0.9,0.02,\n"
    with pytest.raises(ValueError):
        experiments_from_csv(dup, model=model)
    # integer observables work without a model
    noname = CSV.replace(",S,", ",0,").replace(",P,", ",2,")
    exps2 = experiments_from_csv(noname)
    assert {m.obs_index for m in exps2[0].measurements} == {0, 2}


def _fitted_project():
    model = library.michaelis_menten()
    p_true = jnp.asarray(library.MM_TRUE_PARAMS)
    t = np.linspace(1.0, 10.0, 8)
    res = model.simulate(p_true, (0.0, 10.0), jnp.asarray(t),
                         config=SolverConfig(rtol=1e-9, atol=1e-11))
    rng = np.random.default_rng(0)
    sim = np.asarray(res.ys)
    meas = [Measurement(0, t, sim[:, 0] + rng.normal(scale=0.02, size=8),
                        np.full(8, 0.02)),
            Measurement(2, t, 2.0 * sim[:, 2] + rng.normal(scale=0.02,
                                                           size=8),
                        np.full(8, 0.02), scale_group="rel")]
    batch = ExperimentBatch.from_experiments([Experiment("e0", tuple(meas))])
    pmap = ParameterMap.create(model.param_names, 1,
                               shared=tuple(model.param_names))
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-7, atol=1e-9))
    theta = pmap.pack({n: float(v) for n, v in
                       zip(model.param_names, library.MM_TRUE_PARAMS)})
    return proj, theta


def test_plot_fit_panels():
    proj, theta = _fitted_project()
    fig = viz.plot_fit(proj, theta, n_dense=40)
    assert len(fig.axes) == 1
    ax = fig.axes[0]
    # two observables: two errorbar sets + two model curves
    assert len(ax.lines) >= 2
    assert len(ax.containers) == 2
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_waterfall():
    proj, theta = _fitted_project()
    starts = latin_hypercube(jax.random.PRNGKey(0), 6, theta - 0.3,
                             theta + 0.3)
    out = multistart_fit(proj.residuals, proj.residuals_and_jacobian,
                         starts, config=FitConfig(max_iter=12))
    fig = viz.plot_waterfall(out)
    assert fig.axes[0].get_ylabel() == "final cost"
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_profiles():
    import jax.numpy as jnp
    from tpusysbio.fit import profile_likelihood

    target = jnp.asarray([1.0, -2.0])
    sigma = jnp.asarray([0.5, 2.0])

    def r_fn(th):
        return (th - target) / sigma

    def rj_fn(th):
        return r_fn(th), jnp.diag(1.0 / sigma)

    prof = profile_likelihood(r_fn, rj_fn, target, n_points=3, span=5.0,
                              config=FitConfig(max_iter=20))
    fig = viz.plot_profiles(prof, names=["k1", "k2"])
    assert len([a for a in fig.axes if a.axison]) == 2
    assert fig.axes[0].get_title() == "k1"
    import matplotlib.pyplot as plt
    plt.close(fig)
