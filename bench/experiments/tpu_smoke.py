"""Per-round TPU smoke lane (VERDICT r3 #5): compiled-Mosaic correctness.

The test suite runs on CPU (Pallas in interpret mode) — numerics are
identical there, but the Mosaic COMPILER and the TPU runtime are not
exercised at all. This script is the mechanical check that the compiled
kernels still match f64 ground truth on the real chip:

  1. ``linalg.inverse`` at n ∈ {22, 64, 97} (f32 Gauss-Jordan kernel +
     f64 Newton-Schulz refinement; 97 exercises the block-Schur path)
     vs numpy f64 inverses.
  2. The fused double-float solve+refine kernel (``factor_for_solve`` +
     ``solve_refined``) at n ∈ {22, 64} vs numpy f64 solves.
  3. Error-free transforms UNDER THE MOSAIC COMPILER: a compiled
     TwoProd-based compensated dot must beat naive f32 summation by
     orders of magnitude (LLVM FMA contraction / fast-math would
     silently destroy the (hi, lo) invariants — tests/test_pallas.py
     guards this in interpret mode, this guards the compiled path).
  4. One b256 MAPK-22 screening fit (8 LM iters, pallas solver,
     mixed precision) — convergence count and finite best cost.

Run on the chip each round; record the JSON line in PERFORMANCE.md.
Exits non-zero on any failed check.

    python -m bench.experiments.tpu_smoke
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _cond_safe_matrices(rng, B, n):
    """Well-conditioned random batch: normal + diagonal shift keeps
    kappa ~ O(10) so accuracy reflects the kernel, not the problem."""
    a = rng.normal(size=(B, n, n))
    a += n * np.eye(n)
    return a


def check_inverse(results):
    from tpusysbio.linalg import inverse

    rng = np.random.default_rng(0)
    ok = True
    for n in (22, 64, 97):
        a = _cond_safe_matrices(rng, 8, n)
        t0 = time.perf_counter()
        x = np.asarray(jax.jit(inverse)(jnp.asarray(a)))
        dt = time.perf_counter() - t0
        ref = np.linalg.inv(a)
        # induced inf-norm of I - A X, the refinement's own convergence
        # metric; the refined inverse should sit at ~f64 roundoff for
        # kappa~10 matrices — 1e-9 has >6 orders of headroom over a
        # silently-f32 result (~1e-5)
        resid = np.max(np.sum(np.abs(np.eye(n) - a @ x), axis=-1))
        err = np.max(np.abs(x - ref)) / np.max(np.abs(ref))
        passed = bool(resid < 1e-9 and err < 1e-9)
        ok &= passed
        results[f"inverse_n{n}"] = {
            "resid_infnorm": float(resid), "rel_err": float(err),
            "seconds_incl_compile": round(dt, 1), "ok": passed}
    return ok


def check_refine_solve(results):
    from tpusysbio.linalg.pallas_lu import factor_for_solve, solve_refined

    rng = np.random.default_rng(1)
    ok = True
    for n in (22, 64):
        a = _cond_safe_matrices(rng, 8, n)
        b = rng.normal(size=(8, n, 4))

        def solve(a, b):
            return solve_refined(factor_for_solve(a), b)

        t0 = time.perf_counter()
        x = np.asarray(jax.jit(jax.vmap(solve))(jnp.asarray(a),
                                                jnp.asarray(b)))
        dt = time.perf_counter() - t0
        ref = np.linalg.solve(a, b)
        err = np.max(np.abs(x - ref)) / np.max(np.abs(ref))
        passed = bool(err < 1e-9)
        ok &= passed
        results[f"refine_solve_n{n}"] = {
            "rel_err": float(err), "seconds_incl_compile": round(dt, 1),
            "ok": passed}
    return ok


def check_eft_compiled(results):
    """Compiled compensated dot vs naive f32 dot, against f64 truth.

    The vectors are built so naive f32 summation loses ~5 digits; the
    double-float path must stay ~exact. If Mosaic/LLVM ever contracts
    the TwoProd partials into FMAs, this check fails loudly."""
    from tpusysbio.linalg import pallas_lu

    rng = np.random.default_rng(2)
    a64 = rng.normal(size=4096) * 1e3
    b64 = rng.normal(size=4096)
    # poison the sum with an exactly-cancelling +/-2^30 pair: the running
    # f32 accumulator jumps to ~1e9 and back, discarding the low bits of
    # every partial it held — naive f32 summation loses ~5 digits, while
    # the (hi, lo) discipline captures the lost bits exactly in ``lo``.
    # (2^30 and its products are exactly representable; the pair cancels
    # exactly in infinite precision, so the f64 truth is unaffected.)
    a64[1000], b64[1000] = 2.0 ** 30, 1.0
    a64[3000], b64[3000] = -(2.0 ** 30), 1.0
    a32, b32 = a64.astype(np.float32), b64.astype(np.float32)
    truth = float(np.dot(a32.astype(np.float64), b32.astype(np.float64)))

    # sum the exact TwoProd partials with a running TwoSum — the same
    # (hi, lo) discipline the fused refine kernel relies on
    @jax.jit
    def comp_dot(a, b):
        p, e = pallas_lu._two_prod(a, b)

        def body(carry, pe):
            s, c = carry
            p_i, e_i = pe
            t, err = pallas_lu._two_sum(s, p_i)
            return (t, c + err + e_i), None

        (s, c), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                 (p, e))
        return s, c

    naive = float(jnp.dot(jnp.asarray(a32), jnp.asarray(b32),
                          precision=jax.lax.Precision.HIGHEST))
    s, c = comp_dot(jnp.asarray(a32), jnp.asarray(b32))
    # combine (hi, lo) in f64 ON THE HOST: the invariant under test is
    # that hi+lo carries ~double-float precision through the Mosaic/XLA
    # compile — collapsing to one f32 on device would round it back to
    # f32 eps and hide exactly the failure mode this check exists for
    comp = float(np.float64(float(s)) + np.float64(float(c)))
    err_naive = abs(naive - truth) / abs(truth)
    err_comp = abs(comp - truth) / abs(truth)
    # the poisoned data must genuinely hurt naive f32 (else the check
    # can't discriminate), and the compensated path must sit within the
    # single-level compensation bound n*eps^2*sum|p_i| ~ 5e-7 relative
    # for this conditioning (measured ~2.6e-8) — >=1000x closer than
    # naive. A contracted/fast-mathed EFT lands at naive's ~2.6e-3.
    passed = bool(err_naive > 1e-5 and err_comp < 1e-6
                  and err_comp * 1000 < err_naive)
    results["eft_compiled"] = {
        "rel_err_naive_f32": err_naive, "rel_err_compensated": err_comp,
        "ok": passed}
    return passed


def check_screen_fit(results):
    from bench.fits_bench import build_problem
    import dataclasses

    from tpusysbio.config import FitConfig, SolverConfig
    from tpusysbio.fit import latin_hypercube
    from tpusysbio.fit.multistart import make_multistart_runner

    proj, theta_true = build_problem()
    proj = dataclasses.replace(
        proj, config=SolverConfig(rtol=1e-3, atol=1e-6, max_steps=192,
                                  linear_solver="pallas",
                                  mixed_precision=True))
    starts = latin_hypercube(jax.random.PRNGKey(0), 256,
                             theta_true - 1.0, theta_true + 1.0)
    run = make_multistart_runner(
        proj.residuals, proj.residuals_and_jacobian,
        FitConfig(max_iter=8, eval_mode="lockstep", ftol=1e-4, xtol=1e-4),
        with_cov=False)
    t0 = time.perf_counter()
    out = run(starts)
    jax.block_until_ready(out.cost)
    dt = time.perf_counter() - t0
    cost = np.asarray(out.cost)
    status = np.asarray(out.status)
    finite = int(np.isfinite(cost).sum())
    best = float(np.min(np.where(status < 0, np.inf, cost)))
    # an 8-iter screen doesn't converge members; the check is that the
    # batch runs, most members stay finite, and the best screened cost
    # is in the plausible basin range (cost at truth ~ O(10))
    passed = bool(finite >= 200 and np.isfinite(best) and best < 1e4)
    results["screen_fit_b256"] = {
        "finite_members": finite, "best_screen_cost": best,
        "seconds_incl_compile": round(dt, 1), "ok": passed}
    return passed


def main() -> int:
    backend = jax.default_backend()
    results: dict = {"backend": backend}
    if backend != "tpu":
        print(json.dumps({"metric": "tpu_smoke", "skipped": True,
                          "reason": f"backend is {backend}, not tpu"}))
        return 0
    t0 = time.perf_counter()
    ok = True
    ok &= check_inverse(results)
    ok &= check_refine_solve(results)
    ok &= check_eft_compiled(results)
    ok &= check_screen_fit(results)
    print(json.dumps({
        "metric": "tpu_smoke (compiled-Mosaic correctness lane)",
        "value": round(time.perf_counter() - t0, 1),
        "unit": "seconds (incl. compiles)",
        "ok": ok, "detail": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
