"""Multi-host distributed path (SURVEY.md §2c comm row, §5 distributed
backend): ``jax.distributed.initialize()`` + a GLOBAL mesh spanning
processes, exercised for real with 2 subprocesses x 4 fake CPU devices —
the same code path a multi-slice v5e deployment runs (docs/GUIDE.md §7),
minus the hardware. Collectives ride gloo here, ICI/DCN there; the
library code is identical.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusysbio.config import FitConfig
from tpusysbio.fit import multistart_fit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _rosen_r(theta):
    return jnp.stack([10.0 * (theta[1] - theta[0] ** 2), 1.0 - theta[0]])


def _rosen_rj(theta):
    return _rosen_r(theta), jax.jacfwd(_rosen_r)(theta)


@pytest.mark.slow
def test_two_process_multistart_matches_single(tmp_path):
    """2 processes x 4 fake devices: the sharded multistart must be
    member-for-member identical with this (single-process) run."""
    out = str(tmp_path / "mh.npz")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(pid), "2", str(port), out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    mh = np.load(out)
    # single-process reference with the SAME starts (same key)
    rng = np.random.default_rng(7)
    starts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(16, 2)))
    ref = multistart_fit(_rosen_r, _rosen_rj, starts,
                         FitConfig(max_iter=60))
    np.testing.assert_allclose(mh["cost"], np.asarray(ref.cost),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(mh["theta"], np.asarray(ref.theta),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(mh["status"], np.asarray(ref.status))
    np.testing.assert_allclose(mh["best_theta"], [1.0, 1.0], atol=1e-6)
