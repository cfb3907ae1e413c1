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
                       choices=["auto", "bdf", "radau", "dopri5", "rosenbrock"])
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

    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    return args.fn(args)


if __name__ == "__main__":
    main()
