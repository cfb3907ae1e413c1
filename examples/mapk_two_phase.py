"""The production two-phase multi-start workflow (BASELINE.json:5).

Phase 1 screens a wide Latin-hypercube start cloud with the f32
mixed-precision engine at rtol=1e-3 (cheap basin triage — ~20x the
reference-accuracy integration rate); phase 2 re-fits the top fraction
at full reference accuracy (f64 state, rtol=1e-6). This is the shape
that does 10k MAPK-22 starts in under a minute on a v5e-8
(docs/PERFORMANCE.md "Round-2 headline result").

    python examples/mapk_two_phase.py --cpu 64   # quick demo
    python examples/mapk_two_phase.py 1024                    # TPU

The start count is the optional positional argument (default 64).
"""

import dataclasses
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import FitConfig, SolverConfig  # noqa: E402
from tpusysbio.data import Experiment, ExperimentBatch, Measurement  # noqa: E402
from tpusysbio.fit import latin_hypercube  # noqa: E402
from tpusysbio.fit.multistart import multistart_two_phase  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.project import ParameterMap, Project  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_starts = int(args[0]) if args else 64
    top_k = max(4, n_starts // 16)

    # synthetic dataset at the true parameters + 2% noise
    model = library.mapk_huang_ferrell()
    p_true = library.mapk_true_params()
    t = np.linspace(5.0, 100.0, 12)
    sim = model.simulate(jnp.asarray(p_true), (0.0, 100.0),
                         jnp.asarray(t),
                         config=SolverConfig(rtol=1e-9, atol=1e-12,
                                             max_steps=2048))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(0)
    sigma = 0.02 * float(np.max(obs))
    data = obs + rng.normal(scale=sigma, size=obs.shape)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("wt", meas)])

    free = [n for n in model.param_names
            if n.startswith(("KKPP+K", "KPase+KP"))]
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)

    # tight (polish) and screening projects share everything but the
    # solver config; max_steps at ~2x nominal caps the lockstep union
    proj_tight = Project(
        model=model, pmap=pmap, batch=batch,
        config=SolverConfig(rtol=1e-6, atol=1e-9, max_steps=512,
                            linear_solver="pallas",
                            sens_precision="f32"))
    proj_screen = dataclasses.replace(
        proj_tight,
        config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=192,
                            linear_solver="pallas",
                            mixed_precision=True))

    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    starts = latin_hypercube(jax.random.PRNGKey(0), n_starts,
                             theta_true - 1.0, theta_true + 1.0)

    t0 = time.perf_counter()
    polish, screen = multistart_two_phase(
        (proj_screen.residuals, proj_screen.residuals_and_jacobian),
        (proj_tight.residuals, proj_tight.residuals_and_jacobian),
        starts,
        FitConfig(max_iter=8, eval_mode="lockstep", ftol=1e-4, xtol=1e-4),
        FitConfig(max_iter=20, eval_mode="lockstep"),
        top_k=top_k, iter_chunk=8)
    jax.block_until_ready(polish.cost)
    wall = time.perf_counter() - t0

    best = polish.best()
    cost_truth = float(jax.jit(proj_tight.cost)(theta_true))
    print(f"{n_starts} starts screened, top {top_k} polished "
          f"in {wall:.1f}s (incl. compile)")
    print(f"best polished cost {float(best.cost):.4f} "
          f"(cost at truth {cost_truth:.4f})")
    fitted = np.exp(np.asarray(best.theta))
    truth = np.asarray([p_true[model.param_names.index(n)] for n in free])
    sig = np.asarray(best.param_sigma)
    # the covariance channel flags sloppy (practically unidentifiable)
    # directions with huge error bars — report recovery only where the
    # data actually constrains the parameter
    ident = sig < 1.0
    rel = np.abs(fitted - truth) / truth
    print(f"identifiable parameters (1-sigma < 1 in log space): "
          f"{int(ident.sum())}/{len(free)}; worst relative error there: "
          f"{np.max(rel[ident]) if ident.any() else float('nan'):.3f}")
    print("sloppy directions flagged by the covariance (1-sigma >= 1): "
          f"{[n for n, m in zip(free, ~ident) if m]}")


if __name__ == "__main__":
    main()
