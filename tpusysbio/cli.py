"""Command-line interface (SURVEY.md §1 L6).

The reference had per-model scripts and no real CLI; this exposes the
canonical configs (BASELINE.json:7-11) behind subcommands, with the
observability hooks from SURVEY.md §5 (``--profile`` dumps a perfetto
trace via ``jax.profiler``; solver counters print after every run).

    tpusysbio simulate --model mapk22 --t-end 100 --n-times 41
    tpusysbio sens     --model lotka
    tpusysbio fit      --example jakstat --starts 8
    tpusysbio bench
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys

import jax


def _models():
    from tpusysbio.model import library

    return {
        "mm3": (library.michaelis_menten, library.MM_TRUE_PARAMS),
        "lotka": (library.lotka_volterra, library.LV_TRUE_PARAMS),
        "repressilator": (library.repressilator,
                          library.REPRESSILATOR_TRUE_PARAMS),
        "mapk22": (library.mapk_huang_ferrell, library.mapk_true_params()),
        "jakstat": (library.jak_stat, library.JAKSTAT_TRUE_PARAMS),
        "egfr": (library.egfr_like, library.egfr_true_params()),
    }


@contextlib.contextmanager
def _maybe_profile(trace_dir):
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
        print(f"perfetto trace written to {trace_dir}", file=sys.stderr)
    else:
        yield


def _report(res):
    print(json.dumps({
        "status": int(res.status), "nsteps": int(res.nsteps),
        "naccepted": int(res.naccepted), "nrejected": int(res.nrejected),
        "nfev": int(res.nfev), "njev": int(res.njev), "nlu": int(res.nlu),
    }))


def cmd_simulate(args):
    import numpy as np
    import jax.numpy as jnp

    from tpusysbio.config import SolverConfig

    build, p_true = _models()[args.model]
    model = build()
    p = jnp.asarray(p_true)
    t_eval = jnp.linspace(0.0, args.t_end, args.n_times)
    cfg = SolverConfig(rtol=args.rtol, atol=args.atol,
                       max_steps=args.max_steps)
    with _maybe_profile(args.profile):
        res = model.simulate(p, (0.0, args.t_end), t_eval,
                             solver=args.solver, config=cfg)
        jax.block_until_ready(res.ys)
    _report(res)
    if args.out:
        np.savez(args.out, t=np.asarray(t_eval), ys=np.asarray(res.ys))
        print(f"trajectory saved to {args.out}", file=sys.stderr)


def cmd_sens(args):
    import numpy as np
    import jax.numpy as jnp

    from tpusysbio.config import SolverConfig

    build, p_true = _models()[args.model]
    model = build()
    p = jnp.asarray(p_true)
    t_eval = jnp.linspace(0.0, args.t_end, args.n_times)
    cfg = SolverConfig(rtol=args.rtol, atol=args.atol,
                       max_steps=args.max_steps)
    with _maybe_profile(args.profile):
        res = model.simulate_sensitivities(p, (0.0, args.t_end), t_eval,
                                           solver=args.solver, config=cfg)
        jax.block_until_ready(res.sens)
    _report(res)
    print(f"sens shape {tuple(res.sens.shape)}, "
          f"max |dy/dp| = {float(jnp.max(jnp.abs(res.sens))):.4g}")
    if args.out:
        np.savez(args.out, t=np.asarray(t_eval), ys=np.asarray(res.ys),
                 sens=np.asarray(res.sens))


def cmd_fit(args):
    if args.example == "jakstat":
        sys.argv = [sys.argv[0]]
        from examples import jakstat_ensemble

        jakstat_ensemble.main()
    elif args.example == "mm3":
        sys.argv = [sys.argv[0]]
        from examples import mm3_fit

        mm3_fit.main()
    else:
        raise SystemExit(f"unknown fit example {args.example!r}")


def cmd_bench(args):
    import bench

    bench.main()


_FREE_PARAMS = {
    # sensible identifiable free sets per canonical config; None = all
    "mm3": None,
    "lotka": None,
    "repressilator": None,
    "jakstat": ("k1", "k2", "k3", "k4"),
    "mapk22": "KKPP+K|KPase+KP",   # 12 MAPK-layer rate constants
    # receptor module + layer-0 kinase/phosphatase rates (bench/egfr_bench)
    "egfr": "L+Rec|LR+A0_0|LR+A0_1|P0+A0_1",
}


def _synth_problem(args):
    """Synthetic estimation problem on a canonical config: simulate at the
    true parameters, add observation noise, free the model's usual
    estimation subset. Returns (model, batch, pmap, free, theta_true)."""
    import numpy as np
    import jax.numpy as jnp

    from tpusysbio.config import SolverConfig
    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.project import ParameterMap

    build, p_true = _models()[args.model]
    model = build()
    p_true = np.asarray(p_true)
    t = np.linspace(args.t_end / args.n_times, args.t_end, args.n_times)
    sim = model.simulate(jnp.asarray(p_true), (0.0, args.t_end),
                         jnp.asarray(t),
                         config=SolverConfig(rtol=1e-9, atol=1e-12,
                                             max_steps=4096))
    obs = np.asarray(jax.vmap(
        lambda y: model.observables(y, jnp.asarray(p_true)))(sim.ys))
    rng = np.random.default_rng(args.seed)
    sigma = args.noise * float(np.max(np.abs(obs)))
    data = obs + rng.normal(scale=sigma, size=obs.shape)
    meas = tuple(Measurement(obs_index=i, times=t, values=data[:, i],
                             sigmas=np.full(len(t), sigma))
                 for i in range(model.n_obs))
    batch = ExperimentBatch.from_experiments([Experiment("synth", meas)])

    free_spec = _FREE_PARAMS.get(args.model)
    if free_spec is None:
        free = list(model.param_names)
    elif isinstance(free_spec, str):
        prefixes = tuple(free_spec.split("|"))
        free = [n for n in model.param_names if n.startswith(prefixes)]
    else:
        free = list(free_spec)
    fixed = {n: p_true[model.param_names.index(n)]
             for n in model.param_names if n not in free}
    pmap = ParameterMap.create(model.param_names, 1, shared=tuple(free),
                               fixed=fixed)
    theta_true = pmap.pack(
        {n: p_true[model.param_names.index(n)] for n in free})
    return model, batch, pmap, free, theta_true


def cmd_multistart(args):
    """End-to-end two-phase multi-start pipeline on a canonical config:
    synthesize data at the true parameters + noise, screen a Latin-
    hypercube start cloud with the f32 engine at loose rtol, polish the
    top fraction at reference accuracy, report ranked fits + 1σ bars."""
    import dataclasses
    import time

    import numpy as np
    import jax.numpy as jnp

    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import multistart_two_phase
    from tpusysbio.project import Project

    runspec = None
    if getattr(args, "config", None):
        from tpusysbio.config import load_config

        runspec = load_config(args.config)
        args.model = runspec.model
        for k, v in runspec.run.items():
            key = k.replace("-", "_")
            if not hasattr(args, key):
                raise SystemExit(f"config run key {k!r} is not a "
                                 "multistart setting")
            setattr(args, key, v)

    model, batch, pmap, free, theta_true = _synth_problem(args)

    if runspec is not None:
        tight_cfg = runspec.solver
        screen_cfg = runspec.screen_solver or dataclasses.replace(
            tight_cfg, rtol=1e-3, atol=1e-6, mixed_precision=True,
            sens_precision="full",
            max_steps=max(64, tight_cfg.max_steps // 4))
        polish_fit_cfg = runspec.fit
        screen_fit_cfg = runspec.screen_fit or dataclasses.replace(
            polish_fit_cfg, max_iter=args.screen_iters, ftol=1e-4,
            xtol=1e-4)
    else:
        tight_cfg = SolverConfig(rtol=args.rtol, atol=args.atol,
                                 max_steps=args.max_steps,
                                 linear_solver=args.linear_solver,
                                 sens_precision="f32")
        screen_cfg = SolverConfig(rtol=1e-3, atol=1e-6,
                                  max_steps=max(64, args.max_steps // 4),
                                  linear_solver=args.linear_solver,
                                  mixed_precision=True)
        polish_fit_cfg = FitConfig(max_iter=args.polish_iters,
                                   eval_mode="lockstep")
        screen_fit_cfg = FitConfig(max_iter=args.screen_iters,
                                   eval_mode="lockstep", ftol=1e-4,
                                   xtol=1e-4)
    mesh = None
    if runspec is not None and runspec.mesh is not None:
        from tpusysbio.utils import make_mesh

        mesh = make_mesh(config=runspec.mesh)
    proj_tight = Project(model=model, pmap=pmap, batch=batch,
                         config=tight_cfg)
    proj_screen = dataclasses.replace(proj_tight, config=screen_cfg)

    starts = latin_hypercube(jax.random.PRNGKey(args.seed), args.starts,
                             theta_true - args.spread,
                             theta_true + args.spread)
    top_k = min(args.top_k, args.starts)
    t0 = time.perf_counter()
    with _maybe_profile(args.profile):
        polish, screen = multistart_two_phase(
            (proj_screen.residuals, proj_screen.residuals_and_jacobian),
            (proj_tight.residuals, proj_tight.residuals_and_jacobian),
            starts, screen_fit_cfg, polish_fit_cfg,
            top_k=top_k, mesh=mesh, iter_chunk=args.iter_chunk)
        jax.block_until_ready(polish.cost)
    wall = time.perf_counter() - t0

    ranked = polish.ranked()
    cost_truth = float(proj_tight.cost(jnp.asarray(theta_true)))
    print(json.dumps({
        "model": args.model, "free_params": len(free),
        "starts": args.starts, "top_k": top_k,
        "wall_seconds": round(wall, 1),
        "screen_finished": int((np.asarray(screen.status) >= 0).sum()),
        "best_cost": float(ranked.cost[0]),
        "cost_at_truth": round(cost_truth, 6),
        "top_costs": np.asarray(ranked.cost[:min(5, top_k)]).round(
            4).tolist(),
    }))
    best_sigma = np.asarray(ranked.param_sigma[0])
    for name, th, sg in zip(free, np.asarray(ranked.theta[0]), best_sigma):
        print(f"  {name:>16s}: {np.exp(th):.6g}  "
              f"(log-space 1σ {sg:.3g})")
    if args.out:
        np.savez(args.out, theta=np.asarray(ranked.theta),
                 cost=np.asarray(ranked.cost),
                 status=np.asarray(ranked.status),
                 param_sigma=np.asarray(ranked.param_sigma),
                 free=np.asarray(free))
        print(f"ranked results saved to {args.out}", file=sys.stderr)
    if args.plot:
        from tpusysbio import viz

        viz.plot_waterfall(screen).savefig(
            f"{args.plot}_waterfall.png", dpi=110)
        viz.plot_fit(proj_tight, ranked.theta[0]).savefig(
            f"{args.plot}_fit.png", dpi=110)
        print(f"plots saved to {args.plot}_waterfall.png / _fit.png",
              file=sys.stderr)


def cmd_profile(args):
    """Profile-likelihood identifiability analysis on a canonical config:
    fit the synthetic problem, then profile every free parameter around
    the optimum (fit/profile.py — 2·P warm-started chains in one jitted
    vmap) and report likelihood-ratio confidence intervals."""
    import time

    import numpy as np
    import jax.numpy as jnp  # noqa: F401  (symmetry with other commands)

    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import confidence_intervals, profile_likelihood
    from tpusysbio.optim import lm_fit
    from tpusysbio.project import Project

    model, batch, pmap, free, theta_true = _synth_problem(args)
    cfg = SolverConfig(rtol=args.rtol, atol=args.atol,
                       max_steps=args.max_steps,
                       linear_solver=args.linear_solver,
                       sens_precision="f32")
    proj = Project(model=model, pmap=pmap, batch=batch, config=cfg)
    fit_cfg = FitConfig(max_iter=args.fit_iters, eval_mode="lockstep")

    t0 = time.perf_counter()
    fit = jax.jit(lambda th: lm_fit(
        proj.residuals, proj.residuals_and_jacobian, th, fit_cfg))(theta_true)
    prof = profile_likelihood(
        proj.residuals, proj.residuals_and_jacobian, fit.theta,
        n_points=args.n_points, span=args.span, config=fit_cfg)
    jax.block_until_ready(prof.costs)
    wall = time.perf_counter() - t0

    ci = confidence_intervals(prof, level=args.level)
    status = np.asarray(prof.status)
    print(json.dumps({
        "model": args.model, "free_params": len(free),
        "grid_points": int(prof.values.shape[1]),
        "wall_seconds": round(wall, 1),
        "fit_cost": float(fit.cost),
        "unconverged_points": int((status <= 0).sum()),
        "level": args.level,
    }))
    theta_hat = np.asarray(fit.theta)
    for p, name in enumerate(free):
        lo, hi = ci[p]
        lo_s = f"{np.exp(lo):.4g}" if np.isfinite(lo) else "-inf"
        hi_s = f"{np.exp(hi):.4g}" if np.isfinite(hi) else "+inf"
        flag = "" if np.isfinite(lo) and np.isfinite(hi) else \
            "  [non-identifiable within span]"
        print(f"  {name:>16s}: {np.exp(theta_hat[p]):.6g}  "
              f"CI [{lo_s}, {hi_s}]{flag}")
    if args.out:
        np.savez(args.out, idx=prof.idx, values=np.asarray(prof.values),
                 costs=np.asarray(prof.costs),
                 thetas=np.asarray(prof.thetas),
                 status=status, cost_opt=float(prof.cost_opt), ci=ci,
                 free=np.asarray(free))
        print(f"profile curves saved to {args.out}", file=sys.stderr)
    if args.plot:
        from tpusysbio import viz

        viz.plot_profiles(prof, names=free, level=args.level).savefig(
            f"{args.plot}_profiles.png", dpi=110)
        print(f"plot saved to {args.plot}_profiles.png", file=sys.stderr)


def cmd_sample(args):
    """Posterior sampling on a canonical config: fit the synthetic
    problem, then run ensemble MCMC (fit/mcmc.py — emcee-style stretch
    move, walkers in lockstep inside one jitted scan) from a ball around
    the optimum and report per-parameter posterior mean ± sigma."""
    import time

    import numpy as np
    import jax.numpy as jnp

    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import autocorr_time, ensemble_sample
    from tpusysbio.optim import lm_fit
    from tpusysbio.project import Project

    model, batch, pmap, free, theta_true = _synth_problem(args)
    cfg = SolverConfig(rtol=args.rtol, atol=args.atol,
                       max_steps=args.max_steps,
                       linear_solver=args.linear_solver,
                       sens_precision="f32")
    proj = Project(model=model, pmap=pmap, batch=batch, config=cfg)
    fit_cfg = FitConfig(max_iter=args.fit_iters, eval_mode="lockstep")

    t0 = time.perf_counter()
    fit = jax.jit(lambda th: lm_fit(
        proj.residuals, proj.residuals_and_jacobian, th,
        fit_cfg))(theta_true)
    rng = np.random.default_rng(args.seed)
    x0 = jnp.asarray(np.asarray(fit.theta)
                     + args.init_ball * rng.normal(
                         size=(args.walkers, len(free))))
    res = ensemble_sample(lambda th: -proj.cost(th), x0, args.steps,
                          jax.random.PRNGKey(args.seed), thin=args.thin)
    jax.block_until_ready(res.chain)
    wall = time.perf_counter() - t0

    burn = args.burn // args.thin
    samp = np.asarray(res.flat(burn=burn))
    tau = autocorr_time(res.chain[burn:])
    acc = np.asarray(res.acceptance)
    print(json.dumps({
        "model": args.model, "free_params": len(free),
        "walkers": args.walkers, "steps": args.steps,
        "kept_samples": int(samp.shape[0]),
        "wall_seconds": round(wall, 1),
        "fit_cost": float(fit.cost),
        "mean_acceptance": round(float(acc.mean()), 3),
        "max_autocorr_time": round(float(tau.max()), 1),
    }))
    mu, sd = samp.mean(axis=0), samp.std(axis=0)
    for p, name in enumerate(free):
        print(f"  {name:>16s}: {np.exp(mu[p]):.6g}  "
              f"(x/÷ {np.exp(sd[p]):.4g}; τ={tau[p]:.1f})")
    if args.out:
        np.savez(args.out, chain=np.asarray(res.chain),
                 log_prob=np.asarray(res.log_prob), acceptance=acc,
                 free=np.asarray(free))
        print(f"chain saved to {args.out}", file=sys.stderr)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpusysbio")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--x64", action="store_true", default=True,
                        help="enable float64 (default on)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_common(p):
        p.add_argument("--model", default="mm3", choices=_models().keys())
        p.add_argument("--solver", default="bdf",
                       choices=["auto", "adams", "bdf", "radau", "dopri5",
                                "rosenbrock"])
        p.add_argument("--t-end", type=float, default=10.0)
        p.add_argument("--n-times", type=int, default=21)
        p.add_argument("--rtol", type=float, default=1e-6)
        p.add_argument("--atol", type=float, default=1e-9)
        p.add_argument("--max-steps", type=int, default=2048)
        p.add_argument("--profile", metavar="DIR", default=None,
                       help="dump a jax.profiler perfetto trace to DIR")
        p.add_argument("--out", default=None, help="save results to .npz")

    p_sim = sub.add_parser("simulate", help="integrate a canonical model")
    add_common(p_sim)
    p_sim.set_defaults(fn=cmd_simulate)

    p_sens = sub.add_parser("sens",
                            help="integrate with forward sensitivities")
    add_common(p_sens)
    p_sens.set_defaults(fn=cmd_sens)

    p_fit = sub.add_parser("fit", help="run a canonical fit example")
    p_fit.add_argument("--example", default="jakstat",
                       choices=["jakstat", "mm3"])
    p_fit.set_defaults(fn=cmd_fit)

    p_bench = sub.add_parser("bench", help="run the headline benchmark")
    p_bench.set_defaults(fn=cmd_bench)

    p_ms = sub.add_parser(
        "multistart",
        help="two-phase multi-start fit pipeline on a canonical config")
    p_ms.add_argument("--config", default=None, metavar="FILE",
                      help="YAML/JSON RunSpec (configs/ ships one per "
                           "canonical config); file settings override "
                           "flag defaults")
    p_ms.add_argument("--model", default="mapk22",
                      choices=list(_FREE_PARAMS.keys()))
    p_ms.add_argument("--starts", type=int, default=64)
    p_ms.add_argument("--top-k", type=int, default=8)
    p_ms.add_argument("--screen-iters", type=int, default=8)
    p_ms.add_argument("--polish-iters", type=int, default=20)
    p_ms.add_argument("--iter-chunk", type=int, default=8)
    p_ms.add_argument("--spread", type=float, default=1.0,
                      help="LHS half-width around truth, log space")
    p_ms.add_argument("--noise", type=float, default=0.02,
                      help="data noise as a fraction of max |obs|")
    p_ms.add_argument("--seed", type=int, default=0)
    p_ms.add_argument("--t-end", type=float, default=100.0)
    p_ms.add_argument("--n-times", type=int, default=12)
    p_ms.add_argument("--rtol", type=float, default=1e-6)
    p_ms.add_argument("--atol", type=float, default=1e-9)
    p_ms.add_argument("--max-steps", type=int, default=512)
    p_ms.add_argument("--linear-solver", default="pallas",
                      choices=["lu", "inv", "inv32", "pallas"])
    p_ms.add_argument("--profile", metavar="DIR", default=None)
    p_ms.add_argument("--out", default=None,
                      help="save ranked results to .npz")
    p_ms.add_argument("--plot", default=None, metavar="PREFIX",
                      help="save PREFIX_waterfall.png + PREFIX_fit.png")
    p_ms.set_defaults(fn=cmd_multistart)

    p_pl = sub.add_parser(
        "profile",
        help="profile-likelihood identifiability analysis on a canonical "
             "config (fit, then profile every free parameter)")
    p_pl.add_argument("--model", default="mm3",
                      choices=list(_FREE_PARAMS.keys()))
    p_pl.add_argument("--n-points", type=int, default=6,
                      help="grid points per direction")
    p_pl.add_argument("--span", type=float, default=1.0,
                      help="profile half-width in log space")
    p_pl.add_argument("--level", type=float, default=0.95,
                      help="confidence level for the LR intervals")
    p_pl.add_argument("--fit-iters", type=int, default=40)
    p_pl.add_argument("--noise", type=float, default=0.02)
    p_pl.add_argument("--seed", type=int, default=0)
    p_pl.add_argument("--t-end", type=float, default=10.0)
    p_pl.add_argument("--n-times", type=int, default=12)
    p_pl.add_argument("--rtol", type=float, default=1e-6)
    p_pl.add_argument("--atol", type=float, default=1e-9)
    p_pl.add_argument("--max-steps", type=int, default=512)
    p_pl.add_argument("--linear-solver", default="pallas",
                      choices=["lu", "inv", "inv32", "pallas"])
    p_pl.add_argument("--out", default=None,
                      help="save profile curves to .npz")
    p_pl.add_argument("--plot", default=None, metavar="PREFIX",
                      help="save PREFIX_profiles.png")
    p_pl.set_defaults(fn=cmd_profile)

    p_mc = sub.add_parser(
        "sample",
        help="posterior sampling via ensemble MCMC on a canonical config "
             "(fit, then emcee-style stretch-move walkers)")
    p_mc.add_argument("--model", default="mm3",
                      choices=list(_FREE_PARAMS.keys()))
    p_mc.add_argument("--walkers", type=int, default=32)
    p_mc.add_argument("--steps", type=int, default=400)
    p_mc.add_argument("--burn", type=int, default=100,
                      help="sweeps discarded before moments (pre-thin)")
    p_mc.add_argument("--thin", type=int, default=1)
    p_mc.add_argument("--init-ball", type=float, default=0.01,
                      help="walker init sigma around the optimum (log)")
    p_mc.add_argument("--fit-iters", type=int, default=40)
    p_mc.add_argument("--noise", type=float, default=0.02)
    p_mc.add_argument("--seed", type=int, default=0)
    p_mc.add_argument("--t-end", type=float, default=10.0)
    p_mc.add_argument("--n-times", type=int, default=12)
    p_mc.add_argument("--rtol", type=float, default=1e-6)
    p_mc.add_argument("--atol", type=float, default=1e-9)
    p_mc.add_argument("--max-steps", type=int, default=512)
    p_mc.add_argument("--linear-solver", default="pallas",
                      choices=["lu", "inv", "inv32", "pallas"])
    p_mc.add_argument("--out", default=None, help="save chain to .npz")
    p_mc.set_defaults(fn=cmd_sample)

    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    return args.fn(args)


if __name__ == "__main__":
    main()
