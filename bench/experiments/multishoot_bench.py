"""Parallel-in-time (SP/CP analogue, SURVEY.md §2c) measured: one LONG
stiff trajectory via multiple shooting vs serial integration on one chip.

A single serial integration uses a sliver of the chip; multiple shooting
converts the idle ensemble capacity into time-axis parallelism — K
windows integrate concurrently (vmap), continuity enforced by Newton on
the window-start states. Wall = coarse serial init + a few parallel
Newton sweeps, vs the full serial tight pass.

    python -m bench.experiments.multishoot_bench
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T_END = float(os.environ.get("TPUSYSBIO_MS_TEND", "600.0"))
K = int(os.environ.get("TPUSYSBIO_MS_WINDOWS", "16"))
NEWTON_ITERS = int(os.environ.get("TPUSYSBIO_MS_ITERS", "4"))


def main():
    from tpusysbio.config import SolverConfig
    from tpusysbio.linalg import lu as _lu
    from tpusysbio.model import library
    from tpusysbio.solvers.bdf import bdf_solve
    from tpusysbio.solvers.multishoot import ShootingProblem

    model = library.repressilator()
    # canonical limit-cycle regime: sustained oscillations for the whole
    # horizon, so long-horizon cost grows linearly with T
    p = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    y0 = model.y0(p)
    n = y0.shape[0]
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=16384)

    # ---- serial reference (evaluated at the window boundaries so the
    # converged shooting states can be checked against it) ----------------
    from tpusysbio.solvers.multishoot import window_grid

    bounds = window_grid((0.0, T_END), K)
    t_eval = bounds[1:]
    serial = jax.jit(lambda: bdf_solve(
        lambda t, y: model.rhs(t, y, p), (0.0, T_END), y0, t_eval,
        config=cfg))
    res = serial()
    jax.block_until_ready(res.ys)
    t0 = time.perf_counter()
    res = serial()
    jax.block_until_ready(res.ys)
    serial_s = time.perf_counter() - t0
    y_serial_bounds = np.asarray(res.ys)   # states at bounds[1:]

    # ---- multiple shooting ----------------------------------------------
    # n_params=4: the parameter columns are unused here (p is fixed) but
    # the sens plumbing requires them — the measured multishoot cost is
    # therefore an OVERestimate by ~(n+P)/n in sensitivity work
    sp = ShootingProblem(
        f_p=model.rhs, t_span=(0.0, T_END), y0_fn=lambda pp: model.y0(pp),
        n_windows=K, n_params=4,
        config=SolverConfig(rtol=1e-6, atol=1e-9,
                            max_steps=cfg.max_steps // K * 4))
    init_z = jax.jit(lambda: sp.init_z(p)[1:])  # (K-1, n) tail
    sweep = jax.jit(lambda zt: sp.defects_and_jac(p, zt))

    @jax.jit
    def newton_step(z_tail):
        d, _, Jz, status = sp.defects_and_jac(p, z_tail)
        r = d.reshape(-1)
        dz = _lu.lu_solve(_lu.lu_factor(Jz), -r)
        return (z_tail + dz.reshape(z_tail.shape), jnp.max(jnp.abs(d)),
                status)

    def newton(z_tail):
        zt, dmax, status = newton_step(z_tail)
        return zt, float(dmax), status

    # compile both stages
    zt = init_z()
    jax.block_until_ready(zt)
    zt2, _, _ = newton(zt)
    jax.block_until_ready(zt2)

    t0 = time.perf_counter()
    zt = init_z()
    jax.block_until_ready(zt)
    init_s = time.perf_counter() - t0

    defect_trace = []
    t0 = time.perf_counter()
    for _ in range(NEWTON_ITERS):
        zt, dmax, status = newton(zt)
        defect_trace.append(dmax)
    jax.block_until_ready(zt)
    newton_s = time.perf_counter() - t0
    ms_s = init_s + newton_s

    # converged window-start states vs the serial trajectory at the same
    # boundary times (windows 1..K-1 <-> bounds[1..K-1]). NOTE:
    # defect_trace entries are PRE-update defects (newton_step measures
    # its input); this final sweep gives the post-final-update defect.
    d, _, _, status = sweep(zt)
    final_defect = float(jnp.max(jnp.abs(d)))
    scale = np.max(np.abs(y_serial_bounds)) + 1e-12
    end_err = float(np.max(np.abs(
        np.asarray(zt) - y_serial_bounds[:K - 1])) / scale)

    print(json.dumps({
        "metric": f"long-horizon trajectory t=[0,{T_END}] repressilator: "
                  f"multiple shooting (K={K}) vs serial, one chip",
        "serial_seconds": round(serial_s, 2),
        "multishoot_seconds": round(ms_s, 2),
        "speedup": round(serial_s / ms_s, 2),
        "detail": {
            "init_seconds": round(init_s, 2),
            "newton_seconds": round(newton_s, 2),
            "newton_iters": NEWTON_ITERS,
            "serial_nsteps": int(res.nsteps),
            "pre_update_defect_trace": [round(d, 8)
                                        for d in defect_trace],
            "final_defect": round(final_defect, 10),
            "zlast_vs_serial_relerr": end_err,
            "window_status_ok": int((np.asarray(status) == 1).sum()),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
