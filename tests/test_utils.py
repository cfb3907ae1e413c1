"""Utils: sanitizer modes, mesh helper, result export (SURVEY.md §5)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import FitConfig, SolverConfig
from tpusysbio.fit import multistart_fit
from tpusysbio.model import library
from tpusysbio.utils import make_mesh, results_to_records, save_results_json, \
    sanitizer


def test_sanitizer_traps_nans():
    with pytest.raises(FloatingPointError):
        with sanitizer():
            jax.block_until_ready(
                jnp.log(jnp.asarray(-1.0)) + jnp.asarray(1.0))
    # restored afterwards
    assert bool(jnp.isnan(jnp.log(jnp.asarray(-1.0))))


def test_make_mesh():
    mesh = make_mesh()
    assert mesh.axis_names == ("starts",)
    assert mesh.devices.size == len(jax.devices())


def test_results_export(tmp_path):
    def r(t):
        return jnp.stack([10.0 * (t[1] - t[0] ** 2), 1.0 - t[0]])

    def rj(t):
        return r(t), jax.jacfwd(r)(t)

    out = multistart_fit(r, rj, jnp.asarray([[-1.2, 1.0], [0.3, 0.3]]),
                         FitConfig(max_iter=100))
    recs = results_to_records(out)
    assert len(recs) == 2 and recs[0]["status"] > 0
    path = str(tmp_path / "res.json")
    save_results_json(out, path, extra={"note": "test"})
    loaded = json.load(open(path))
    assert loaded["note"] == "test" and len(loaded["results"]) == 2


def test_order_histogram():
    model = library.repressilator()
    p = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    res = model.simulate(p, (0.0, 10.0), jnp.asarray([10.0]),
                         config=SolverConfig())
    hist = np.asarray(res.order_hist)
    assert hist.sum() == int(res.naccepted)
    assert hist[0] == 0  # order index 0 unused (orders are 1..5)


def test_checkify_lane_traps_nonfinite_rhs_and_bad_step():
    """SURVEY.md §5 sanitizers: SolverConfig(debug_checks=True) +
    utils.checked raises on a non-finite RHS at the initial condition,
    while a healthy solve under the same wrapper passes through (and the
    flag is STATIC — the production path never pays for it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from tpusysbio import utils
    from tpusysbio.config import SolverConfig
    from tpusysbio.solvers import bdf_solve

    cfg = SolverConfig(rtol=1e-6, atol=1e-9, debug_checks=True)
    t_eval = jnp.asarray([0.5, 1.0])

    def bad_rhs(t, y):
        return jnp.stack([1.0 / (y[0] - 1.0)])  # inf at y0=1

    def good_rhs(t, y):
        return -y

    bad = utils.checked(jax.jit(
        lambda y0: bdf_solve(bad_rhs, (0.0, 1.0), y0, t_eval, config=cfg)))
    with pytest.raises(Exception, match="non-finite RHS"):
        bad(jnp.asarray([1.0]))

    good = utils.checked(jax.jit(
        lambda y0: bdf_solve(good_rhs, (0.0, 1.0), y0, t_eval,
                             config=cfg)))
    res = good(jnp.asarray([1.0, 2.0]))
    assert int(res.status) == 1
    np.testing.assert_allclose(np.asarray(res.ys[1]),
                               np.exp(-1.0) * np.array([1.0, 2.0]),
                               rtol=1e-5)
