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
