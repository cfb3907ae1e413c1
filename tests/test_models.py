"""Model-library integrity + the remaining golden configs (BASELINE.json:10-11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.model.massaction import NetworkBuilder
from tpusysbio.solvers import STATUS_DONE, bdf_solve


def test_mapk_network_shape():
    m = library.mapk_huang_ferrell()
    assert m.n_states == 22          # Huang-Ferrell species count
    assert m.n_params == 30          # 10 catalytic mechanisms x (a, d, k)


def test_egfr_network_scale():
    m = library.egfr_like()
    assert 90 <= m.n_states <= 110   # "~100-state" (BASELINE.json:11)
    assert m.n_params == 146


def test_mass_action_conservation():
    """Stoichiometry closure: total enzyme/substrate mass is conserved by
    the MAPK RHS (a wrong S/R matrix breaks this immediately)."""
    m = library.mapk_huang_ferrell()
    p = jnp.asarray(library.mapk_true_params())
    net = library._mapk_network()
    idx = {sp: i for i, sp in enumerate(net.species)}
    y0 = m.y0(p)
    res = bdf_solve(lambda t, y: m.rhs(t, y, p), (0.0, 50.0), y0,
                    jnp.asarray([50.0]),
                    config=SolverConfig(rtol=1e-8, atol=1e-11,
                                        max_steps=1024))
    y = np.asarray(res.ys)[0]
    # total MAPK mass: free K forms + the complexes holding one K form each
    def is_k_form(sp):
        return sp in ("K", "KP", "KPP") or sp.endswith((":K", ":KP", ":KPP"))

    total0 = sum(float(y0[i]) for sp, i in idx.items() if is_k_form(sp))
    total1 = sum(float(y[i]) for sp, i in idx.items() if is_k_form(sp))
    np.testing.assert_allclose(total1, total0, rtol=1e-8)


def test_builder_duplicate_species_stoichiometry():
    b = NetworkBuilder()
    b.reaction("dimerize", ["A", "A"], ["A2"])
    net = b.build()
    ia, ia2 = net.species.index("A"), net.species.index("A2")
    assert net.reactants[0, ia] == 2
    assert net.stoich[ia, 0] == -2 and net.stoich[ia2, 0] == 1
    # rate law: k * A^2
    f = net.rhs()
    dy = np.asarray(f(0.0, jnp.asarray([3.0, 0.0]), jnp.asarray([2.0])))
    np.testing.assert_allclose(dy, [-2 * 2 * 9.0, 2 * 9.0])


@pytest.mark.slow
def test_jakstat_golden(golden):
    g = golden("jakstat")
    model = library.jak_stat()
    p = jnp.asarray(g["p"])
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]),
                    config=SolverConfig(rtol=1e-7, atol=1e-10))
    assert int(res.status) == STATUS_DONE
    np.testing.assert_allclose(np.asarray(res.ys), g["ys"], rtol=2e-4,
                               atol=1e-7)


@pytest.mark.slow
def test_egfr_golden(golden):
    """Config 5 trajectory at scale (~100 states)."""
    g = golden("egfr")
    model = library.egfr_like()
    p = jnp.asarray(g["p"])
    res = bdf_solve(lambda t, y: model.rhs(t, y, p), tuple(g["t_span"]),
                    model.y0(p), jnp.asarray(g["t_eval"]),
                    config=SolverConfig(rtol=1e-6, atol=1e-9,
                                        max_steps=4096))
    assert int(res.status) == STATUS_DONE
    err = np.max(np.abs(np.asarray(res.ys) - g["ys"])
                 / (1e-6 + np.max(np.abs(g["ys"]))))
    assert err < 1e-3


def test_integration_deterministic():
    """Sanitizer lane (SURVEY.md §5): same inputs => bitwise-same outputs."""
    model = library.repressilator()
    p = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    run = jax.jit(lambda pv: bdf_solve(
        lambda t, y: model.rhs(t, y, pv), (0.0, 10.0), model.y0(pv),
        jnp.linspace(0.0, 10.0, 5), config=SolverConfig()).ys)
    a = np.asarray(run(p))
    b = np.asarray(run(p))
    np.testing.assert_array_equal(a, b)
