"""Utilities: sanitizer modes, mesh construction, result export.

SURVEY.md §5 mappings:
- "race detection / sanitizers" -> ``sanitizer()``: JAX has no data races
  by construction (pure functional); the equivalents are NaN trapping and
  extra runtime checks, plus determinism tests (tests/test_utils.py).
- "metrics / logging" -> ``results_to_records`` / ``save_results_json``:
  structured per-fit records from the jit-returned result pytrees.
- mesh helper for the 'starts' ensemble axis (SURVEY.md §2c).
"""

from __future__ import annotations

import contextlib
import json
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from tpusysbio.config import MeshConfig


@contextlib.contextmanager
def sanitizer(nans: bool = True, checks: bool = True):
    """Sanitizer lane: trap NaNs at op granularity and enable JAX's extra
    internal checks. Wrap a test/debug run, not production (it disables
    some fusions). Usage::

        with sanitizer():
            result = my_fit(theta0)
    """
    ctx = []
    if nans:
        ctx.append(("jax_debug_nans", True))
    if checks:
        ctx.append(("jax_enable_checks", True))
    old = {k: getattr(jax.config, k) for k, _ in ctx}
    try:
        for k, v in ctx:
            jax.config.update(k, v)
        yield
    finally:
        for k, v in old.items():
            jax.config.update(k, v)


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "starts",
              config: Optional["MeshConfig"] = None) -> Mesh:
    """1-D device mesh over the ensemble axis (all local devices by
    default). On a v5e-8 this is the 8-chip 'starts' mesh of SURVEY.md
    §3.4; under ``--xla_force_host_platform_device_count=8`` it is the
    fake CPU mesh used by the distributed tests.

    A ``MeshConfig`` (tpusysbio.config) supplies the same layout
    declaratively — the form the YAML/JSON config loader produces
    (``config.load_config``); explicit arguments override it."""
    if config is not None:
        if len(config.axis_names) != 1:
            raise ValueError("the ensemble mesh is 1-D (SURVEY.md §2c); "
                             f"got axes {config.axis_names!r}")
        axis_name = config.axis_names[0]
        if n_devices is None and config.axis_sizes is not None:
            n_devices = config.axis_sizes[0]
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def checked(fn):
    """Checkify lane (SURVEY.md §5 sanitizers): functionalize the in-jit
    assertions emitted by ``SolverConfig(debug_checks=True)`` (finite RHS
    at init, positive step — solvers/common.debug_check) plus JAX's
    automatic user checks, and RAISE on the first failure. Production
    keeps the masked-status failure contract; this wrapper is the debug
    mode where the same conditions throw with values::

        sim = utils.checked(lambda p: model.simulate(
            p, span, ts, config=SolverConfig(debug_checks=True)))
        sim(p_bad)   # -> JaxRuntimeError with the check message
    """
    from jax.experimental import checkify

    cfn = checkify.checkify(fn, errors=checkify.user_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def distributed_initialize(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> None:
    """Multi-host entry point (SURVEY.md §2c/§5 comm rows): call ONCE per
    process before any backend use; afterwards ``jax.devices()`` spans all
    processes and ``make_mesh()`` builds the GLOBAL 'starts' mesh, so the
    single-process multistart code runs unchanged — XLA routes the
    ranking collectives over ICI within a slice and DCN across slices.

    On TPU pods the three arguments are auto-detected from the runtime
    environment (pass nothing); on CPU/GPU clusters pass them explicitly.
    Thin by design: there is no custom transport layer to configure —
    JAX's PJRT runtime is the communication backend (SURVEY.md §2c).
    See tests/multihost_worker.py for the 2-process CPU recipe and
    docs/GUIDE.md §7 for the pod recipe."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def shard_starts(theta0s, mesh: Mesh):
    """Place a host-replicated (N, G) start array onto the global mesh,
    sharded along the ensemble axis. Every process must pass the SAME
    array (samplers here are deterministic in the PRNG key, so each
    process just calls the sampler with the same key); each process
    device_puts only its addressable shards."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(
        theta0s, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])))


def gather_multihost(tree):
    """All-gather a pytree of globally-sharded result arrays onto every
    host (the multi-host analogue of the final device->host gather in
    SURVEY.md §3.4) — e.g. a MultistartResult whose members live sharded
    across processes, so ``.ranked()`` / ``.best()`` work host-side."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: multihost_utils.process_allgather(a, tiled=True), tree)


def results_to_records(result) -> list:
    """MultistartResult -> list of per-start dicts (JSON-ready)."""
    n = result.cost.shape[0]
    sigma = getattr(result, "param_sigma", None)
    recs = []
    for i in range(n):
        rec = {
            "start": i,
            "cost": float(result.cost[i]),
            "status": int(result.status[i]),
            "n_iter": int(result.n_iter[i]),
            "grad_norm": float(result.grad_norm[i]),
            "theta": np.asarray(result.theta[i]).tolist(),
        }
        if sigma is not None:
            rec["param_sigma"] = np.asarray(sigma[i]).tolist()
        recs.append(rec)
    return recs


def save_results_json(result, path: str, extra: Optional[dict] = None):
    payload = {"results": results_to_records(result)}
    if extra:
        payload.update(extra)
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=2)
