"""Golden-trajectory generator (SURVEY.md §7 M0; §4 item 1).

Produces tight-tolerance SciPy reference solutions (.npz) for every
canonical config (BASELINE.json:7-11) on CPU. These are the ground truth
the JAX solvers must match to rtol=1e-6 (BASELINE.json:5). Run directly::

    python -m bench.make_golden          # writes tests/golden/*.npz

or let tests generate fixtures lazily via the ``golden`` fixture.
"""

from __future__ import annotations

import os

import numpy as np


def _simulate_scipy(model, p, t_span, t_eval, rtol=1e-8, atol=1e-11,
                    with_sens=False):
    import jax
    import jax.numpy as jnp
    from scipy.integrate import solve_ivp

    p = jnp.asarray(p)
    y0 = np.asarray(model.y0(p))
    n = model.n_states

    if not with_sens:
        rhs = jax.jit(lambda t, y: model.rhs(t, y, p))

        def f(t, y):
            return np.asarray(rhs(t, jnp.asarray(y)))

        sol = solve_ivp(f, t_span, y0, method="BDF", rtol=rtol, atol=atol,
                        t_eval=t_eval)
        assert sol.success, sol.message
        return sol.y.T, None

    # Augmented system: the SciPy integration of hand-written sensitivity
    # equations is the independent oracle (SURVEY.md §4 item 2) — built
    # here with jacfwd, which is mathematically the "hand-written" ODE.
    m = model.n_params

    def aug_rhs_jax(t, z):
        import jax.numpy as jnp
        y = z[:n]
        S = z[n:].reshape(n, m)
        fy = model.rhs(t, y, p)
        Jy = jax.jacfwd(lambda yy: model.rhs(t, yy, p))(y)
        Fp = jax.jacfwd(lambda pp: model.rhs(t, y, pp))(p)
        dS = Jy @ S + Fp
        return jnp.concatenate([fy, dS.reshape(-1)])

    aug = jax.jit(aug_rhs_jax)

    def f(t, z):
        return np.asarray(aug(t, jnp.asarray(z)))

    import jax.numpy as jnp
    s0 = np.asarray(jax.jacfwd(model.y0)(p)).reshape(-1)
    z0 = np.concatenate([y0, s0])
    sol = solve_ivp(f, t_span, z0, method="BDF", rtol=rtol, atol=atol,
                    t_eval=t_eval)
    assert sol.success, sol.message
    ys = sol.y.T[:, :n]
    sens = sol.y.T[:, n:].reshape(-1, n, m)
    return ys, sens


def _configs():
    from tpusysbio.model import library

    return {
        "mm3": dict(model=library.michaelis_menten(),
                    p=library.MM_TRUE_PARAMS,
                    t_span=(0.0, 10.0), n_t=21, sens=True),
        "lotka": dict(model=library.lotka_volterra(),
                      p=library.LV_TRUE_PARAMS,
                      t_span=(0.0, 15.0), n_t=31, sens=True),
        "repressilator": dict(model=library.repressilator(),
                              p=library.REPRESSILATOR_TRUE_PARAMS,
                              t_span=(0.0, 30.0), n_t=61, sens=True),
        "mapk22": dict(model=library.mapk_huang_ferrell(),
                       p=library.mapk_true_params(),
                       t_span=(0.0, 100.0), n_t=41, sens=False),
        "jakstat": dict(model=library.jak_stat(),
                        p=library.JAKSTAT_TRUE_PARAMS,
                        t_span=(0.0, 60.0), n_t=31, sens=True),
        "egfr": dict(model=library.egfr_like(),
                     p=library.egfr_true_params(),
                     t_span=(0.0, 10.0), n_t=21, sens=False),
        # extra-tight references (rtol=1e-11) for the 1e-6 sensitivity
        # parity bar (BASELINE.json:5): the standard fixtures are
        # rtol=1e-8, whose own error floor masks anything below ~1e-5
        "mm3_tight": dict(model=library.michaelis_menten(),
                          p=library.MM_TRUE_PARAMS,
                          t_span=(0.0, 10.0), n_t=11, sens=True,
                          rtol=1e-11, atol=1e-14),
        "lotka_tight": dict(model=library.lotka_volterra(),
                            p=library.LV_TRUE_PARAMS,
                            t_span=(0.0, 12.0), n_t=11, sens=True,
                            rtol=1e-11, atol=1e-14),
        # bench.py's exact knob set needs a MAPK-22 sensitivity reference
        # (the standard mapk22 fixture is trajectory-only)
        "mapk22_sens": dict(model=library.mapk_huang_ferrell(),
                            p=library.mapk_true_params(),
                            t_span=(0.0, 100.0), n_t=11, sens=True,
                            rtol=1e-9, atol=1e-12),
    }


def generate(name: str, path: str):
    cfg = _configs()[name]
    t_eval = np.linspace(cfg["t_span"][0], cfg["t_span"][1], cfg["n_t"])
    ys, sens = _simulate_scipy(cfg["model"], cfg["p"], cfg["t_span"], t_eval,
                               with_sens=cfg["sens"],
                               rtol=cfg.get("rtol", 1e-8),
                               atol=cfg.get("atol", 1e-11))
    data = dict(t_eval=t_eval, ys=ys, p=np.asarray(cfg["p"]),
                t_span=np.asarray(cfg["t_span"]))
    if sens is not None:
        data["sens"] = sens
    np.savez_compressed(path, **data)
    return data


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name in _configs():
        path = os.path.join(out_dir, f"{name}.npz")
        print(f"generating {name} -> {path}")
        generate(name, path)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
