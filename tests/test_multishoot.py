"""Multiple-shooting (parallel-in-time) tests — SURVEY.md §2c SP analogue."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.solvers.multishoot import (
    ShootingProblem,
    integrate_windows,
    window_grid,
)

CFG = SolverConfig(rtol=1e-8, atol=1e-11)


def _lv():
    model = library.lotka_volterra()
    p = jnp.asarray(library.LV_TRUE_PARAMS)
    return model, p


def test_windows_match_serial_integration():
    model, p = _lv()
    f = lambda t, y: model.rhs(t, y, p)  # noqa: E731
    y0 = model.y0(p)
    K = 4
    bounds = window_grid((0.0, 8.0), K)
    # serial reference at window boundaries
    from tpusysbio.solvers import bdf_solve

    ref = bdf_solve(f, (0.0, 8.0), y0, bounds[1:], config=CFG)
    # consistent z from the reference trajectory
    z = jnp.concatenate([y0[None], ref.ys[:-1]], axis=0)
    y_end, _, status = integrate_windows(f, bounds, z, config=CFG)
    assert np.all(np.asarray(status) == 1)
    np.testing.assert_allclose(np.asarray(y_end), np.asarray(ref.ys),
                               rtol=1e-6, atol=1e-9)


def test_defects_vanish_at_consistent_states():
    model, p = _lv()
    prob = ShootingProblem(model.rhs, (0.0, 8.0), model.y0, n_windows=4,
                           n_params=model.n_params, config=CFG)
    z = prob.init_z(p)  # (K, n) — z[0] == y0
    defects, _, _, status = prob.defects_and_jac(p, z[1:])
    assert np.all(np.asarray(status) == 1)
    # init_z is a coarse pass; defects small but nonzero
    assert float(jnp.max(jnp.abs(defects))) < 0.05
    # with exact states from the tight serial solve they vanish to tol
    from tpusysbio.solvers import bdf_solve

    bounds = window_grid((0.0, 8.0), 4)
    ref = bdf_solve(lambda t, y: model.rhs(t, y, p), (0.0, 8.0),
                    model.y0(p), bounds[1:-1], config=CFG)
    defects2, _, _, _ = prob.defects_and_jac(p, ref.ys)
    assert float(jnp.max(jnp.abs(defects2))) < 1e-5


def test_defect_jacobians_match_fd():
    model, p = _lv()
    K = 3
    prob = ShootingProblem(model.rhs, (0.0, 6.0), model.y0, n_windows=K,
                           n_params=model.n_params, config=CFG)
    z_tail = prob.init_z(p)[1:]

    defects, dD_dp, Jz, _ = prob.defects_and_jac(p, z_tail)
    n = model.n_states

    # FD in p
    eps = 1e-6
    for g in range(model.n_params):
        d = jnp.zeros_like(p).at[g].set(eps)
        rp = prob.defects_and_jac(p + d, z_tail)[0]
        rm = prob.defects_and_jac(p - d, z_tail)[0]
        fd = np.asarray(rp - rm) / (2 * eps)
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(np.asarray(dD_dp)[:, :, g] - fd)) / scale < 1e-4

    # FD in z
    zt = np.asarray(z_tail)
    for j in range(zt.size):
        dz = np.zeros_like(zt)
        dz.flat[j] = eps
        rp = prob.defects_and_jac(p, jnp.asarray(zt + dz))[0]
        rm = prob.defects_and_jac(p, jnp.asarray(zt - dz))[0]
        fd = (np.asarray(rp - rm) / (2 * eps)).reshape(-1)
        col = np.asarray(Jz)[:, j]
        scale = 1e-8 + np.max(np.abs(fd))
        assert np.max(np.abs(col - fd)) / scale < 1e-4, f"z col {j}"
