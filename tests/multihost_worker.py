"""Multi-host worker: one PROCESS of a 2-process x 4-fake-CPU-device
multistart (SURVEY.md §2c/§5 comm rows; the >1-process answer is
``jax.distributed.initialize()`` — no custom transport).

Launched by tests/test_multihost.py as two subprocesses; each process
initializes the distributed runtime, builds the SAME problem and start
set, runs the mesh-sharded multistart over the GLOBAL 8-device mesh
(each process owns 4 shards), all-gathers the results, and process 0
writes them for the parent test to compare against a single-process run.

    python tests/multihost_worker.py <pid> <nproc> <port> <out.npz>
"""

import os
import sys

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                         sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from tpusysbio import utils  # noqa: E402

utils.distributed_initialize(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=nproc, process_id=pid)
assert jax.local_device_count() == 4 and jax.device_count() == 4 * nproc

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpusysbio.config import FitConfig  # noqa: E402
from tpusysbio.fit import multistart_fit  # noqa: E402


def rosen_r(theta):
    return jnp.stack([10.0 * (theta[1] - theta[0] ** 2), 1.0 - theta[0]])


def rosen_rj(theta):
    return rosen_r(theta), jax.jacfwd(rosen_r)(theta)


mesh = utils.make_mesh()  # GLOBAL mesh: all 8 devices across 2 processes
assert mesh.devices.size == 4 * nproc

# every process builds the same start set (deterministic in the key) and
# places it onto the global mesh — each puts only its addressable shards
rng = np.random.default_rng(7)
starts = utils.shard_starts(
    jnp.asarray(rng.uniform(-1.5, 1.5, size=(16, 2))), mesh)

res = multistart_fit(rosen_r, rosen_rj, starts, FitConfig(max_iter=60),
                     mesh=mesh)
res = utils.gather_multihost(res)

if pid == 0:
    best = res.best()
    np.savez(out, cost=np.asarray(res.cost),
             theta=np.asarray(res.theta),
             status=np.asarray(res.status),
             best_theta=np.asarray(best.theta))
print(f"worker {pid}: OK", flush=True)
