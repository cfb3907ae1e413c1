"""Driver benchmark: stiff ODE + forward-sensitivity integrations/sec/chip.

North-star metric 1 (BASELINE.json:2) on the canonical stiff config
(MAPK-22, BASELINE.json:9): a vmapped batch of BDF integrations with full
30-parameter forward sensitivities (682 effective states each), rtol=1e-6.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the per-chip rate divided by the measured single-process
SciPy rate for the *same* augmented integration on this host's CPU
(bench/baselines/cpu_baseline.json; regenerate with
``python -m bench.cpu_baseline``).

Runs on whatever backend the environment provides (TPU under the driver;
CPU if forced). x64 is enabled — accuracy parity is part of the metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (same pattern as tests/conftest.py):
# r4's driver run paid a 496 s cold compile in front of a ~1 s measurement
# because only the test suite had a cache. Keyed in-repo so a bench run
# during the build round warms the cache the driver's end-of-round run
# hits. The cache keys on serialized HLO + compile options + jaxlib
# version, so it is safe across processes.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _cache_entries() -> int:
    try:
        return len([f for f in os.listdir(_CACHE_DIR)
                    if not f.startswith(".")])
    except OSError:
        return 0

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from tpusysbio.sens import make_sens_rhs  # noqa: E402
from tpusysbio import solvers  # noqa: E402

BATCH = int(os.environ.get("TPUSYSBIO_BENCH_BATCH", "256"))
REPEATS = int(os.environ.get("TPUSYSBIO_BENCH_REPEATS", "3"))
SOLVER = os.environ.get("TPUSYSBIO_BENCH_SOLVER", "pallas")
SENS_PREC = os.environ.get("TPUSYSBIO_BENCH_SENS_PREC", "f32")
STEPPER = os.environ.get("TPUSYSBIO_BENCH_STEPPER", "bdf")
T_SPAN = (0.0, 100.0)
N_T = int(os.environ.get("TPUSYSBIO_BENCH_NT", "41"))


def _wait_for_backend(max_tries: int = 5, sleep_s: float = 20.0):
    """The axon TPU plugin fails to register when another process holds the
    tunnel; retry instead of dying (observed intermittently)."""
    for i in range(max_tries):
        try:
            return jax.devices()
        except RuntimeError as e:  # pragma: no cover - env-dependent
            if i == max_tries - 1:
                raise
            print(f"backend init failed ({e}); retry {i + 1}/{max_tries}",
                  file=sys.stderr)
            time.sleep(sleep_s)


def main():
    _wait_for_backend()
    model = library.mapk_huang_ferrell()
    p_true = jnp.asarray(library.mapk_true_params())
    t_eval = jnp.linspace(*T_SPAN, N_T)
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                       linear_solver=SOLVER, sens_precision=SENS_PREC,
                       dense_f32=True,
                       # dense_window is exact (tests/test_solvers.py) but
                       # MEASURED SLOWER under vmap on TPU (107 vs 249
                       # int/s): per-member dynamic slice starts lower to
                       # gather/scatter. Default off; a CPU-oriented knob.
                       dense_window=int(os.environ.get(
                           "TPUSYSBIO_BENCH_DENSE_WINDOW", "0")))

    def integrate(p):
        # model-provided closed-form fast paths (massaction.py) when
        # available; jvp fallback otherwise
        if model.rhs_sens is not None:
            sens_rhs = lambda t, y, S: model.rhs_sens(t, y, S, p)  # noqa: E731
        else:
            sens_rhs = make_sens_rhs(model.rhs, p)
        jac = (None if model.rhs_jac is None else
               (lambda t, y: model.rhs_jac(t, y, p.astype(y.dtype))))
        s0 = jnp.zeros((model.n_states, model.n_params), p.dtype)
        solve = solvers.SOLVERS[STEPPER]
        res = solve(lambda t, y: model.rhs(t, y, p.astype(y.dtype)),
                    T_SPAN,
                    model.y0(p), t_eval, config=cfg,
                    sens_rhs=sens_rhs, s0=s0, jac=jac)
        return res.ys, res.sens, res.status, res.nsteps

    run = jax.jit(jax.vmap(integrate))

    # mild log-normal parameter spread: a realistic multi-start-style batch
    rng = np.random.default_rng(0)
    ps = p_true[None, :] * jnp.asarray(
        np.exp(rng.normal(scale=0.1, size=(BATCH, p_true.shape[0]))))

    # compile + warm up
    cache_before = _cache_entries()
    t0 = time.perf_counter()
    out = run(ps)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    cache_after = _cache_entries()
    # new entries written => this was a cold compile (cache miss)
    cache_hit = cache_after == cache_before and cache_before > 0
    status = np.asarray(out[2])
    n_ok = int((status == 1).sum())

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ps))
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = BATCH / best  # integrations/sec on this one chip

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench", "baselines", "cpu_baseline.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            cpu = json.load(fh)
        vs = rate / cpu["integrations_per_sec"]

    print(json.dumps({
        "metric": "stiff ODE+sensitivity integrations/sec/chip (MAPK-22, "
                  f"30-param fwd sens, {STEPPER} rtol=1e-6)",
        "value": round(rate, 3),
        "unit": "integrations/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "batch": BATCH, "best_batch_seconds": round(best, 3),
            "compile_seconds": round(compile_s, 1),
            "compile_cache_hit": cache_hit,
            "ok_members": n_ok, "backend": jax.default_backend(),
            "mean_nsteps": float(np.asarray(out[3]).mean()),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
