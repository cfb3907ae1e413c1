"""SymPy front-end: imported model == hand-written model, AD flows through."""

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.model.sympy_import import from_sympy


def _mm_sympy():
    t = sp.Symbol("t")
    S, C, P = sp.symbols("S C P")
    k1, km1, k2, E0 = sp.symbols("k1 km1 k2 E0")
    return from_sympy(
        name="mm3_sympy",
        states=[S, C, P], params=[k1, km1, k2, E0],
        odes=[-k1 * (E0 - C) * S + km1 * C,
              k1 * (E0 - C) * S - (km1 + k2) * C,
              k2 * C],
        y0=[1.0, 0.0, 0.0], t=t)


def test_matches_handwritten_model():
    m_sym = _mm_sympy()
    m_ref = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    y = jnp.asarray([0.7, 0.1, 0.2])
    np.testing.assert_allclose(np.asarray(m_sym.rhs(0.0, y, p)),
                               np.asarray(m_ref.rhs(0.0, y, p)), rtol=1e-14)
    # full simulate path + AD Jacobian through the imported RHS
    cfg = SolverConfig(rtol=1e-8, atol=1e-11)
    t_eval = jnp.linspace(0.0, 5.0, 6)
    ys_sym = m_sym.simulate(p, (0.0, 5.0), t_eval, config=cfg).ys
    ys_ref = m_ref.simulate(p, (0.0, 5.0), t_eval, config=cfg).ys
    np.testing.assert_allclose(np.asarray(ys_sym), np.asarray(ys_ref),
                               rtol=1e-10, atol=1e-12)
    J = m_sym.jacobian(0.0, y, p)
    assert J.shape == (3, 3) and bool(jnp.all(jnp.isfinite(J)))


def test_param_dependent_y0_and_observables():
    x = sp.Symbol("x")
    a, x0 = sp.symbols("a x0")
    m = from_sympy("decay", states=[x], params=[a, x0],
                   odes=[-a * x], y0=[x0], observables=[2 * x])
    p = jnp.asarray([0.5, 3.0])
    np.testing.assert_allclose(np.asarray(m.y0(p)), [3.0])
    res = m.simulate_sensitivities(p, (0.0, 2.0), jnp.asarray([2.0]),
                                   config=SolverConfig(rtol=1e-10,
                                                       atol=1e-13))
    y_end = float(res.ys[0, 0])
    np.testing.assert_allclose(y_end, 3.0 * np.exp(-1.0), rtol=1e-8)
    # dy/dx0 = exp(-a t); dy/da = -t x0 exp(-a t) — incl. dy0/dp chain
    np.testing.assert_allclose(float(res.sens[0, 0, 1]), np.exp(-1.0),
                               rtol=1e-7)
    np.testing.assert_allclose(float(res.sens[0, 0, 0]),
                               -2.0 * 3.0 * np.exp(-1.0), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(m.observables(jnp.asarray([2.0]),
                                                        p)), [4.0])
