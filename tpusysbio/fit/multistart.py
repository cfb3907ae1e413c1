"""Vmapped, mesh-sharded multi-start driver (SURVEY.md §3.4 rebuild).

Call stack (one jit, two boundary crossings total):

    sampler (LHS in log bounds, seeded PRNG)
    └─ shard_map over Mesh(('starts',))          # chips
       └─ vmap over the per-chip batch           # lockstep members
          └─ jitted LM fit (optim/lm.py)
             └─ BDF + forward sensitivities (solvers/bdf.py)
    └─ host gather of (θ*, cost, status) → ranking

Failed members (solver failure, non-finite residuals, LM status -1) carry
their status in the result arrays and are ranked last — never aborting the
batch (SURVEY.md §5 failure detection). Checkpoint/resume: chunked
execution writes an .npz after every chunk; a resumed run skips completed
chunks (SURVEY.md §5 checkpoint).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusysbio.config import FitConfig
from tpusysbio.optim import lm_fit
from tpusysbio.optim.lm import lm_finish, lm_init, lm_run
from tpusysbio.optim.trf import trf_finish, trf_init, trf_run


class MultistartResult(NamedTuple):
    theta: jax.Array       # (N, G) fitted parameters (log space)
    cost: jax.Array        # (N,)
    grad_norm: jax.Array   # (N,)
    status: jax.Array      # (N,) LM status codes
    n_iter: jax.Array      # (N,)
    theta0: jax.Array      # (N, G) the starts
    # per-member (JᵀJ)⁻¹ and 1σ error bars at the final iterate (the
    # reference's leastsq cov_x channel — see optim/lm.py FitResult),
    # carried identically by the plain, iter_chunk and checkpointed paths
    cov: Optional[jax.Array] = None          # (N, G, G)
    param_sigma: Optional[jax.Array] = None  # (N, G)
    # accepted-cost history per member (observability, SURVEY.md §5)
    cost_trace: Optional[jax.Array] = None   # (N, max_iter)

    def ranked(self) -> "MultistartResult":
        """Sort by cost; invalid members (failed init / non-finite) last.

        ``status == 0`` (iteration cap) members rank by their achieved
        cost: a capped fit's cost is real — screening phases stop ALL
        members at a small iteration budget, and the whole point of
        ranking is to pick the best basins among them.
        """
        bad = (self.status < 0) | ~jnp.isfinite(self.cost)
        key = jnp.where(bad, jnp.inf, self.cost)
        order = jnp.argsort(key)
        return MultistartResult(
            *(None if x is None else x[order] for x in self))

    def best(self):
        r = self.ranked()
        return jax.tree.map(lambda x: x[0], r)


def _phase_fns(residual_fn: Callable, residual_and_jac_fn: Callable,
               config: FitConfig, bounds, subproblem: str, loss: str,
               f_scale: float):
    """(init, step, finish) triple for one optimizer family: unbounded LM
    (``bounds=None``) or Coleman–Li bounded TRF with optional robust loss
    (``scipy/optimize/_lsq/trf.py:206`` trf_bounds per SURVEY §3.5). Both
    states are resumable pytrees, so the chunked/checkpointed/two-phase
    drivers work identically over either."""
    if bounds is None:
        return (
            lambda th: lm_init(residual_and_jac_fn, th, config),
            lambda st, cap: lm_run(residual_fn, residual_and_jac_fn, st,
                                   config, iter_cap=cap),
            lm_finish,
        )
    lb, ub = (jnp.asarray(b) for b in bounds)
    return (
        lambda th: trf_init(residual_and_jac_fn, th, lb, ub, config,
                            loss=loss, f_scale=f_scale),
        lambda st, cap: trf_run(residual_fn, residual_and_jac_fn, st, lb,
                                ub, config, iter_cap=cap,
                                subproblem=subproblem, loss=loss,
                                f_scale=f_scale),
        trf_finish,
    )


def _fit_batch_fn(residual_fn: Callable, residual_and_jac_fn: Callable,
                  config: FitConfig, with_cov: bool = True, bounds=None,
                  subproblem: str = "normal", loss: str = "linear",
                  f_scale: float = 1.0):
    init_fn, step_fn, finish_fn = _phase_fns(
        residual_fn, residual_and_jac_fn, config, bounds, subproblem,
        loss, f_scale)

    def fit_one(theta0):
        fr = finish_fn(step_fn(init_fn(theta0), config.max_iter))
        return fr if with_cov else fr._replace(cov=None, param_sigma=None)

    return jax.vmap(fit_one)


def _chunked_fit_fn(residual_fn: Callable, residual_and_jac_fn: Callable,
                    config: FitConfig, iter_chunk: int,
                    mesh: Optional[Mesh], compact: bool,
                    with_cov: bool = True, bounds=None,
                    subproblem: str = "normal", loss: str = "linear",
                    f_scale: float = 1.0):
    """Advance the whole batch ``iter_chunk`` LM/TRF iterations per device
    call (bounded single-execution time). The iteration cap is a traced
    scalar, so all chunks share one compilation."""
    init_fn, step_fn, finish_fn = _phase_fns(
        residual_fn, residual_and_jac_fn, config, bounds, subproblem,
        loss, f_scale)

    def wrap(fn, sharded_mask):
        if mesh is None:
            return jax.jit(fn)
        axis = mesh.axis_names[0]
        in_specs = tuple(P(axis) if s else P() for s in sharded_mask)
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
            check_vma=False))

    init = wrap(jax.vmap(init_fn), (True,))
    step = wrap(jax.vmap(step_fn, in_axes=(0, None)), (True, False))
    # lm_finish MUST be jitted: eagerly, its small-matrix covariance
    # assembly dispatches op-by-op through the (remote) runtime — measured
    # 10.3 s vs 0.03 s jitted for a b128 batch on the axon TPU, paid once
    # per chunk by the screening phase of the headline workload.
    # with_cov=False (screening): cov/param_sigma come back as None — XLA
    # dead-code-eliminates the covariance math, and (the real win on the
    # remote-tunnel runtime) the per-chunk flush stops paying their
    # device->host transfer (~700 KB per 512-chunk).
    def _finish_one(st):
        fr = finish_fn(st)
        return fr if with_cov else fr._replace(cov=None, param_sigma=None)

    finish = wrap(jax.vmap(_finish_one), (True,))

    def run(theta0s):
        # Batch compaction (docs/PERFORMANCE.md roadmap #3): converged
        # members leave the lockstep between chunks. Finished members are
        # flushed into host-side result slots and the survivors repacked
        # into the next power-of-two batch (bounded set of compiled
        # shapes); pad slots duplicate a survivor and are dropped at flush.
        N = theta0s.shape[0]
        state = init(theta0s)
        orig_idx = np.arange(N)
        flushed = {}

        def flush(state_np_done_mask, state, idxs):
            fr = finish(state)
            fr_np = jax.tree.map(np.asarray, fr)
            seen = set()
            for slot, oi in enumerate(idxs):
                if state_np_done_mask[slot] and oi >= 0 and oi not in seen:
                    flushed[int(oi)] = jax.tree.map(
                        lambda a: a[slot], fr_np)
                    seen.add(oi)

        # under a mesh, repacked batches must stay divisible by the device
        # count so shard_map keeps sharding them; gathers on the sharded
        # state (host-driven repack) reshard automatically
        n_dev = 1 if mesh is None else int(mesh.devices.size)
        if not compact:
            # Pipelined chunk dispatch: a synchronous done-check after
            # every chunk stalls the device for a host round-trip (real
            # time on the remote-tunnel runtime). Instead, lag the
            # early-exit check one chunk behind — chunk c+1 is dispatched
            # before chunk c's done flags are read, so the flags have
            # materialized while c+1 computes and the device never idles.
            # Worst case one extra no-op dispatch (lm_run's while_loop
            # gates on ~done, so stepping an all-done state is identity).
            prev_done = None
            cap = iter_chunk
            while True:
                state = step(state, jnp.asarray(
                    min(cap, config.max_iter), jnp.int32))
                if cap >= config.max_iter:
                    break
                if prev_done is not None and bool(
                        np.asarray(prev_done).all()):
                    break
                prev_done = state.done
                cap += iter_chunk
            flush(np.ones(orig_idx.shape[0], bool), state, orig_idx)
            out = [flushed[i] for i in range(N)]
            return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *out)
        cap = iter_chunk
        while True:
            state = step(state, jnp.asarray(min(cap, config.max_iter),
                                            jnp.int32))
            done = np.asarray(state.done) | (
                np.asarray(state.n_iter) >= config.max_iter)
            if done.all() or cap >= config.max_iter:
                flush(np.ones_like(done), state, orig_idx)
                break
            n_live = int((~done).sum())
            cur = orig_idx.shape[0]
            # repack when at most half the slots are live AND the repack
            # actually shrinks the batch — at the size floor (n_dev /
            # min(8, cur)) a "repack" to the same size would just pay a
            # finish() execution + host gather every chunk for nothing
            if compact and n_live <= cur // 2 and n_live > 0:
                new_size = max(1 << (n_live - 1).bit_length(),
                               min(8, cur), n_dev)
                new_size += (-new_size) % n_dev
                if new_size < cur:
                    flush(done, state, orig_idx)
                    live = np.flatnonzero(~done)
                    pad = np.full(new_size - n_live, live[0])
                    sel = np.concatenate([live, pad])
                    state = jax.tree.map(lambda a: a[jnp.asarray(sel)],
                                         state)
                    orig_idx = np.concatenate(
                        [orig_idx[live], np.full(new_size - n_live, -1)])
            cap += iter_chunk

        out = [flushed[i] for i in range(N)]
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *out)

    return run


def make_multistart_runner(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    config: FitConfig = FitConfig(),
    mesh: Optional[Mesh] = None,
    iter_chunk: Optional[int] = None,
    compact: bool = False,
    with_cov: bool = True,
    bounds=None,
    subproblem: str = "normal",
    loss: str = "linear",
    f_scale: float = 1.0,
) -> Callable:
    """Build a REUSABLE batch-fit callable with persistent jit caches.

    ``multistart_fit`` constructs fresh ``jax.jit`` wrappers per call, so
    repeated invocations re-trace (and round-trip the compile cache) every
    time — measured at tens of seconds per phase on the remote-AOT TPU
    runtime. Production drivers and benchmarks should build ONE runner per
    (objective, config) and call it repeatedly; only a changed batch shape
    triggers a new compile.

    ``bounds=(lower, upper)`` switches every member from unbounded LM to
    the Coleman–Li bounded TRF (optim/trf.py) with optional robust
    ``loss``/``f_scale``/``subproblem`` — the TRF state is a resumable
    pytree like LM's, so ``iter_chunk``/``compact``/checkpointing work
    identically. Bounds are replicated across the mesh (only the starts
    axis shards).
    """
    if iter_chunk:
        run = _chunked_fit_fn(residual_fn, residual_and_jac_fn, config,
                              iter_chunk, mesh, compact, with_cov,
                              bounds=bounds, subproblem=subproblem,
                              loss=loss, f_scale=f_scale)
    else:
        fit_batch = _fit_batch_fn(residual_fn, residual_and_jac_fn, config,
                                  with_cov, bounds=bounds,
                                  subproblem=subproblem, loss=loss,
                                  f_scale=f_scale)
        if mesh is not None:
            axis = mesh.axis_names[0]
            sharded = jax.shard_map(
                fit_batch, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                check_vma=False)
            run = jax.jit(sharded)
        else:
            run = jax.jit(fit_batch)

    def runner(theta0s):
        fr = run(theta0s)
        return MultistartResult(theta=fr.theta, cost=fr.cost,
                                grad_norm=fr.grad_norm, status=fr.status,
                                n_iter=fr.n_iter, theta0=theta0s,
                                cov=fr.cov, param_sigma=fr.param_sigma,
                                cost_trace=fr.cost_trace)

    # advertised so run_chunked can reject a channels='all'/cov-less
    # mismatch up front instead of after the first (expensive) chunk
    runner.with_cov = with_cov
    return runner


# every per-member channel — including cov/param_sigma/cost_trace (the
# reference's cov_x contract, scipy/optimize/_minpack_py.py:482-501) —
# is persisted per chunk, so a checkpointed result is field-for-field
# identical with the plain path. 'rank' keeps only the ranking channels:
# screening phases triage thousands of non-converged members whose
# covariance is meaningless, and the heavy channels cost real wall time
# in device->host transfer per chunk (measured ~0.8 s/512-chunk over the
# remote-tunnel runtime — 20 chunks of the 10k headline paid ~16 s).
_CHUNK_KEYS = ("theta", "cost", "grad_norm", "status", "n_iter",
               "cov", "param_sigma", "cost_trace")
_RANK_KEYS = ("theta", "cost", "grad_norm", "status", "n_iter")


def _atomic_savez(path: str, **arrays) -> None:
    """np.savez via temp file + os.replace: a crash mid-write (the exact
    scenario checkpoints exist for) must never corrupt the previous good
    checkpoint or leave a truncated file that poisons every resume."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _run_digest(theta0s, chunk_size: int, trace_len: int,
                config: Optional[FitConfig] = None,
                run_tag: str = "") -> np.ndarray:
    """Fingerprint of (start set, chunking, fit budget, fit config,
    caller tag) stored in every checkpoint: a resumed run must be THE
    SAME run. Chunks fit from a different N (LHS start sets depend on N),
    different starts, a different chunk size, a different iteration
    budget, different tolerances/eval mode, or a different objective
    (identified by ``run_tag`` — the config cannot see the model) must
    never be silently mixed with fresh chunks."""
    import hashlib

    h = hashlib.sha256(np.ascontiguousarray(
        np.asarray(theta0s, np.float64)).tobytes())
    h.update(np.int64([chunk_size, trace_len]).tobytes())
    if config is not None:
        import dataclasses as _dc
        h.update(repr(sorted(_dc.asdict(config).items())).encode())
    h.update(run_tag.encode())
    return np.frombuffer(h.digest(), np.uint8)


def _load_checkpoint(path: str, keys, n_theta: int, digest: np.ndarray,
                     chunk_size: int):
    """Load and VALIDATE a chunk checkpoint; returns (acc dict, chunks
    done) or (None, 0) for a missing/corrupt/incompatible file (e.g.
    written by an older version without the cov channels, a different
    channel set, or — via the run digest — different starts / N /
    chunking / iteration budget: resuming any of those would silently
    mix results of different runs, drop channels, or crash in
    np.concatenate, so they restart from scratch instead)."""
    if not os.path.exists(path):
        return None, 0
    try:
        ck = np.load(path)
        done = int(ck["chunks_done"])
        if set(ck.files) != set(keys) | {"chunks_done", "run_digest"}:
            return None, 0
        if not np.array_equal(ck["run_digest"], digest):
            return None, 0
        acc = {k: ck[k] for k in keys}
    except Exception:
        return None, 0
    n = acc["theta"].shape[0]
    shapes_ok = (
        n == done * chunk_size
        and acc["theta"].ndim == 2 and acc["theta"].shape[1] == n_theta
        and all(acc[k].shape[0] == n for k in keys))
    if not (done and shapes_ok):
        return None, 0
    return acc, done


def run_chunked(
    runner: Callable,
    theta0s: jax.Array,
    chunk_size: int,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
    trace_len: int = 0,
    channels: str = "all",
    config: Optional[FitConfig] = None,
    run_tag: str = "",
    overlap: bool = True,
    as_numpy: bool = False,
):
    """Run a persistent ``make_multistart_runner`` callable over
    sequential chunks of ``theta0s`` with per-chunk checkpointing.

    Returns ``(MultistartResult, chunks_resumed)``. With
    ``checkpoint_path``, every completed chunk is persisted ATOMICALLY;
    a re-run with ``resume=True`` continues after the last completed
    chunk. A checkpoint only resumes if it is THE SAME run: the file
    carries a digest of (starts, chunk_size, trace_len, fit config,
    run_tag) and a missing/corrupt/old-format/different-run checkpoint
    restarts cleanly from chunk 0. ``resume=False`` ignores and
    overwrites any existing file. ``trace_len`` must be the fit config's
    ``max_iter`` (part of the digest, so a changed iteration budget
    restarts too). Pass the runner's ``config`` so tolerance/eval-mode
    changes restart, and a ``run_tag`` naming the objective/model —
    the digest cannot see through the runner closure, so two different
    models with identical starts are only distinguished by the tag.

    ``channels='all'`` carries every per-member channel (the default —
    field-for-field identical with the plain path); ``'rank'`` keeps
    only the ranking channels and returns ``cov``/``param_sigma``/
    ``cost_trace`` as None — the right mode for screening phases, where
    the heavy channels are meaningless for thousands of non-converged
    members and cost real per-chunk device->host transfer time.
    """
    if channels not in ("all", "rank"):
        raise ValueError(f"unknown channels {channels!r}")
    if channels == "all" and not getattr(runner, "with_cov", True):
        raise ValueError(
            "channels='all' needs a runner built with with_cov=True")
    keys = _CHUNK_KEYS if channels == "all" else _RANK_KEYS
    N = theta0s.shape[0]
    if N % chunk_size:
        raise ValueError("chunk_size must divide the number of starts")
    n_chunks = N // chunk_size
    digest = _run_digest(theta0s, chunk_size, trace_len, config, run_tag)
    done, parts = 0, []
    if checkpoint_path and resume:
        acc, done = _load_checkpoint(checkpoint_path, keys,
                                     theta0s.shape[1], digest, chunk_size)
        if done:
            parts = [acc]
        done = min(done, n_chunks)

    def materialize(fr, c):
        # np.asarray blocks until the chunk's execution completes, then
        # pulls the result over the (slow, ~1 MB/s-class) tunnel — by the
        # time we get here the NEXT chunk is already enqueued on the
        # device, so transfer + atomic checkpoint I/O overlap its compute
        if channels == "all" and fr.cov is None:
            raise ValueError(
                "channels='all' needs a runner built with with_cov=True")
        parts.append({k: np.asarray(getattr(fr, k)) for k in keys})
        if checkpoint_path:
            acc = {k: np.concatenate([p[k] for p in parts])
                   for k in keys}
            _atomic_savez(checkpoint_path, chunks_done=c + 1,
                          run_digest=digest, **acc)
            parts[:] = [acc]

    # Software pipelining: jax dispatch is async, so chunk c+1 is launched
    # BEFORE chunk c's results are fetched/checkpointed. The device never
    # idles across chunk boundaries; crash semantics are unchanged (chunk
    # c's checkpoint is still written only after c fully materializes —
    # an in-flight c+1 is simply recomputed on resume). ``overlap=False``
    # restores strictly serial execution for debugging.
    pending = None
    for c in range(done, n_chunks):
        fr = runner(theta0s[c * chunk_size:(c + 1) * chunk_size])
        if not overlap:
            materialize(fr, c)
            continue
        if pending is not None:
            materialize(*pending)
        pending = (fr, c)
    if pending is not None:
        materialize(*pending)

    acc = {k: np.concatenate([p[k] for p in parts]) for k in keys}

    # as_numpy=True keeps the accumulated results HOST-resident: chunk
    # results arrive on the host anyway (checkpointing), and re-uploading
    # every channel to the device (~1.2 MB for a 10k screen over the
    # remote tunnel) just so a caller can rank and slice a handful of
    # rows back out is pure waste — the two-phase driver ranks in numpy.
    lift = (lambda a: a) if as_numpy else jnp.asarray

    def opt(k):
        return lift(acc[k]) if k in acc else None

    res = MultistartResult(
        theta=lift(acc["theta"]), cost=lift(acc["cost"]),
        grad_norm=lift(acc["grad_norm"]),
        status=lift(acc["status"]),
        n_iter=lift(acc["n_iter"]), theta0=theta0s,
        cov=opt("cov"), param_sigma=opt("param_sigma"),
        cost_trace=opt("cost_trace"))
    return res, done


def multistart_fit(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    theta0s: jax.Array,
    config: FitConfig = FitConfig(),
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    chunk_size: Optional[int] = None,
    iter_chunk: Optional[int] = None,
    compact: bool = False,
) -> MultistartResult:
    """Fit every row of ``theta0s`` (N, G); returns per-start results.

    With ``mesh`` (1-D, axis ``'starts'``), the batch is sharded across
    devices via ``shard_map`` — N must be divisible by the axis size. With
    ``checkpoint_path``/``chunk_size``, the batch runs in chunks and each
    completed chunk is persisted; re-running resumes after the last one.
    With ``iter_chunk``, each device call advances the (resumable) LM
    state by at most that many iterations — required on runtimes that kill
    long single executions (docs/PERFORMANCE.md "TPU runtime hazards"),
    and the hook for mid-fit checkpointing. ``compact=True`` additionally
    flushes converged members between chunks and repacks survivors into
    smaller batches — pays off for long-tailed convergence (each new batch
    size compiles once); measured counterproductive for short tails.
    """
    # check_vma=False in the mesh path: the fit is collective-free per
    # member, but its loop carries start from replicated constants, which
    # trips the varying-manual-axes static check inside lax loops.
    run = make_multistart_runner(residual_fn, residual_and_jac_fn, config,
                                 mesh=mesh, iter_chunk=iter_chunk,
                                 compact=compact)

    N = theta0s.shape[0]
    if chunk_size is None or chunk_size >= N:
        return run(theta0s)

    res, _ = run_chunked(run, theta0s, chunk_size,
                         checkpoint_path=checkpoint_path,
                         trace_len=config.max_iter, config=config)
    return res


def multistart_trf(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    theta0s: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    config: FitConfig = FitConfig(),
    mesh: Optional[Mesh] = None,
    subproblem: str = "normal",
    loss: str = "linear",
    f_scale: float = 1.0,
    iter_chunk: Optional[int] = None,
) -> MultistartResult:
    """Bounded multi-start: Coleman–Li TRF vmapped over the starts axis.

    The bounded counterpart of :func:`multistart_fit` — PEtab problems
    carry box bounds (``petab_import.PetabProblem.lb/ub``) and this is
    their natural multi-start driver; robust ``loss``/``f_scale`` pass
    straight through to every member. Bounds are replicated across the
    mesh (only the starts axis shards). The TRF state is a resumable
    pytree (optim/trf.py trf_init/trf_run), so ``iter_chunk`` bounds
    per-execution time exactly as in ``multistart_fit``; for
    screening-scale N use :class:`TwoPhaseDriver` with an LM screen and
    ``polish_bounds`` for the bounded polish.
    """
    lower = jnp.asarray(lower, theta0s.dtype)
    upper = jnp.asarray(upper, theta0s.dtype)
    run = make_multistart_runner(
        residual_fn, residual_and_jac_fn, config, mesh=mesh,
        iter_chunk=iter_chunk, bounds=(lower, upper),
        subproblem=subproblem, loss=loss, f_scale=f_scale)
    return run(theta0s)


def multistart_two_phase(
    screen_fns,
    polish_fns,
    theta0s: jax.Array,
    screen_config: FitConfig,
    polish_config: FitConfig,
    top_k: int,
    mesh: Optional[Mesh] = None,
    iter_chunk: Optional[int] = None,
    polish_iter_chunk: Optional[int] = None,
    chunk_size: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
    screen_channels: str = "rank",
    run_tag: str = "",
    polish_subbatch: Optional[int] = None,
    return_info: bool = False,
    polish_bounds=None,
    polish_subproblem: str = "normal",
    polish_loss: str = "linear",
    polish_f_scale: float = 1.0,
    presort_fn: Optional[Callable] = None,
):
    """Two-phase multi-start: wide cheap screening, then accurate polish.

    Phase 1 fits every start with ``screen_fns`` (typically a Project at
    loose tolerance with ``mixed_precision=True`` — f32 hot loop); phase 2
    re-fits the ``top_k`` ranked survivors with ``polish_fns`` (tight
    f64). This is the production shape of the 10k-member headline
    workload (BASELINE.json:5): the screening phase costs a fraction of a
    full-accuracy fit per member, and only the basin winners pay for
    reference accuracy.

    Production knobs (the crash-protected path IS the library path):
      chunk_size: screen the starts in sequential same-shape batches (the
        set is padded with clones of start 0 to a chunk multiple, so one
        compilation covers every chunk; pads are dropped before ranking).
      checkpoint_path: every completed screening chunk is persisted
        ATOMICALLY (``run_chunked``); a re-run with ``resume=True``
        continues after the last completed chunk — validated against a
        digest of (starts, chunking, config, run_tag), so a different run
        restarts instead of mixing. The polish phase (top_k members, a
        small fraction of the work) reruns after a crash-resume.
      screen_channels: 'rank' (default) keeps only ranking channels for
        the screen result — covariance is meaningless for non-converged
        screening members and costs real per-chunk device->host transfer;
        'all' carries every channel.
      polish_iter_chunk: the polish phase's per-execution iteration cap
        (defaults to ``iter_chunk``) — screening and polishing have
        different per-iteration costs, so their caps differ in production
        (bench/headline_bench.py measurements).
      presort_fn: optional jitted ``(B, G) -> (B,)`` sort-key callable
        (typically a sensitivity-free integration's step count at the
        screen config). Starts are screened in key-sorted chunks so each
        chunk's lockstep union groups members of similar step cost;
        results are returned in the caller's original order. Only pays
        when the per-start step distribution is broad relative to the
        probe's cost — measure first (bench/experiments/egfr_union_probe
        .py found EGFR-97's distribution too tight to profit: sorted/
        random union ratio 0.883 vs a probe costing ~a screen iteration).

    Returns ``(polish_result, screen_result)``; with ``return_info=True``
    additionally a dict with phase wall times and resume counts.
    """
    driver = TwoPhaseDriver(
        screen_fns, polish_fns, screen_config, polish_config, top_k,
        mesh=mesh, iter_chunk=iter_chunk,
        polish_iter_chunk=polish_iter_chunk, chunk_size=chunk_size,
        screen_channels=screen_channels, run_tag=run_tag,
        polish_subbatch=polish_subbatch, polish_bounds=polish_bounds,
        polish_subproblem=polish_subproblem, polish_loss=polish_loss,
        polish_f_scale=polish_f_scale, presort_fn=presort_fn)
    polish, screen, info = driver.run(theta0s,
                                      checkpoint_path=checkpoint_path,
                                      resume=resume)
    return (polish, screen, info) if return_info else (polish, screen)


class TwoPhaseDriver:
    """Persistent two-phase runner: builds BOTH phase runners once (jit
    caches live across calls) and exposes ``warmup`` so production
    drivers/benches can compile on representative shapes before the
    measured pass. ``multistart_two_phase`` is the one-shot facade."""

    def __init__(self, screen_fns, polish_fns, screen_config: FitConfig,
                 polish_config: FitConfig, top_k: int,
                 mesh: Optional[Mesh] = None,
                 iter_chunk: Optional[int] = None,
                 polish_iter_chunk: Optional[int] = None,
                 chunk_size: Optional[int] = None,
                 screen_channels: str = "rank",
                 run_tag: str = "",
                 polish_subbatch: Optional[int] = None,
                 polish_bounds=None,
                 polish_subproblem: str = "normal",
                 polish_loss: str = "linear",
                 polish_f_scale: float = 1.0,
                 presort_fn: Optional[Callable] = None):
        self.presort_fn = presort_fn
        self.screen_config = screen_config
        self.polish_config = polish_config
        self.top_k = top_k
        self.mesh = mesh
        self.chunk_size = chunk_size
        self.screen_channels = screen_channels
        self.run_tag = run_tag
        # Cost-sorted polish sub-batches (docs/PERFORMANCE.md roadmap #1):
        # the polish input is the RANKED screen top_k, so consecutive
        # slices group members of similar screened cost — each sub-batch's
        # lockstep union is tighter than the full batch's (one slow member
        # taxes sb-1 peers instead of top_k-1). Sub-batches are dispatched
        # back-to-back (async), so there is no per-call idle between them.
        if polish_subbatch and top_k % polish_subbatch:
            raise ValueError("polish_subbatch must divide top_k")
        self.polish_subbatch = (polish_subbatch
                                if polish_subbatch
                                and polish_subbatch < top_k else None)
        self.screen_run = make_multistart_runner(
            screen_fns[0], screen_fns[1], screen_config, mesh=mesh,
            iter_chunk=iter_chunk, with_cov=(screen_channels == "all"))
        pic = iter_chunk if polish_iter_chunk is None else polish_iter_chunk
        # a polish batch not divisible by the mesh polishes unsharded (it
        # is a small fraction of the work; uneven sharding would need pads)
        pb = self.polish_subbatch or top_k
        polish_mesh = (mesh if mesh is not None
                       and pb % mesh.devices.size == 0 else None)
        # Bounded polish (the shape multistart_trf's docstring promises):
        # the LM screen stays unbounded/cheap; the polish re-fits the
        # top_k under box bounds via the resumable TRF state — PEtab
        # problems (petab_import.PetabProblem.lb/ub) run end-to-end
        # through the two-phase driver this way.
        self.polish_run = make_multistart_runner(
            polish_fns[0], polish_fns[1], polish_config, mesh=polish_mesh,
            iter_chunk=(pic or None), bounds=polish_bounds,
            subproblem=polish_subproblem, loss=polish_loss,
            f_scale=polish_f_scale)

    def warmup(self, theta_rep: jax.Array) -> float:
        """Compile both phase jits on their production shapes: one
        screen chunk and one top_k polish batch, all rows = ``theta_rep``
        (a representative start). Returns the wall seconds spent."""
        import time as _time

        t0 = _time.perf_counter()
        G = theta_rep.shape[0]
        n = self.chunk_size or max(self.top_k, 1)
        pb = self.polish_subbatch or self.top_k
        jax.block_until_ready(
            self.screen_run(jnp.broadcast_to(theta_rep, (n, G))).cost)
        jax.block_until_ready(
            self.polish_run(jnp.broadcast_to(theta_rep, (pb, G))).cost)
        if self.presort_fn is not None:
            jax.block_until_ready(
                self.presort_fn(jnp.broadcast_to(theta_rep, (n, G))))
        return _time.perf_counter() - t0

    def run(self, theta0s: jax.Array,
            checkpoint_path: Optional[str] = None, resume: bool = True):
        """Screen all starts (chunked + checkpointed when configured),
        rank, polish the top_k. Returns (polish, screen, info)."""
        import time as _time

        N = theta0s.shape[0]
        starts = theta0s
        n_pad = 0
        t0 = _time.perf_counter()
        inv_order = None
        if (self.presort_fn is not None and self.chunk_size
                and self.chunk_size < N):
            # Probe-sorted chunking: one cheap key per start (typically a
            # sensitivity-free integration's step count at the screen
            # config) sorts the starts so each screen chunk groups members
            # of similar step cost — the chunk's lockstep union drops from
            # ~the global max toward the chunk-local max. Probe chunks are
            # enqueued back-to-back (async dispatch), results fetched after.
            cs = self.chunk_size
            probe_pad = (-N) % cs
            probe_in = (jnp.concatenate(
                [starts, jnp.broadcast_to(starts[-1:],
                                          (probe_pad, starts.shape[1]))])
                if probe_pad else starts)
            outs = [self.presort_fn(probe_in[i:i + cs])
                    for i in range(0, probe_in.shape[0], cs)]
            keys = np.concatenate([np.asarray(o) for o in outs])[:N]
            order = np.argsort(keys, kind="stable")
            inv_order = np.empty(N, np.int64)
            inv_order[order] = np.arange(N)
            starts = starts[jnp.asarray(order)]
        t_presort = _time.perf_counter() - t0
        if self.chunk_size and self.chunk_size < N:
            n_pad = (-N) % self.chunk_size
            if n_pad:
                # presorted: pad with clones of the LAST (most expensive)
                # start so pads join the chunk whose union they cannot
                # raise; unsorted keeps the first-start clone (stable
                # checkpoint digests for existing runs)
                pad_src = starts[-1:] if inv_order is not None else starts[:1]
                starts = jnp.concatenate(
                    [starts, jnp.broadcast_to(pad_src,
                                              (n_pad, starts.shape[1]))])
            screen, chunks_resumed = run_chunked(
                self.screen_run, starts, self.chunk_size,
                checkpoint_path=checkpoint_path, resume=resume,
                trace_len=self.screen_config.max_iter,
                channels=self.screen_channels,
                config=self.screen_config, run_tag=self.run_tag,
                as_numpy=True)
            if n_pad:
                screen = jax.tree.map(lambda a: a[:N], screen)
        else:
            screen = self.screen_run(starts)
            chunks_resumed = 0
        jax.block_until_ready(screen.cost)
        if inv_order is not None:
            # restore the caller's start order (ranking below is
            # order-invariant; theta0 pairing is not)
            screen = jax.tree.map(lambda a: a[inv_order], screen)
        t1 = _time.perf_counter()

        if isinstance(screen.cost, np.ndarray):
            # chunked screen results are host-resident; rank in numpy and
            # upload ONLY the top_k rows (24 KB instead of ~1.2 MB for a
            # 10k screen — measured ~24 s of the polish window on the
            # remote-tunnel runtime before this)
            bad = (screen.status < 0) | ~np.isfinite(screen.cost)
            order = np.argsort(np.where(bad, np.inf, screen.cost),
                               kind="stable")
            top = jnp.asarray(screen.theta[order[:self.top_k]])
        else:
            top = jnp.asarray(screen.ranked().theta[:self.top_k])
        if self.polish_subbatch:
            sb = self.polish_subbatch
            # async dispatch enqueues every sub-batch before the first
            # finishes — sequential on-device, zero host idle between
            frs = [self.polish_run(top[i:i + sb])
                   for i in range(0, self.top_k, sb)]
            polish = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *frs)
        else:
            polish = self.polish_run(top)
        jax.block_until_ready(polish.cost)
        t2 = _time.perf_counter()
        return polish, screen, {
            "screen_seconds": t1 - t0, "polish_seconds": t2 - t1,
            "presort_seconds": t_presort,
            "chunks_resumed": chunks_resumed, "n_pad": n_pad,
        }
