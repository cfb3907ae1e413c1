"""Probe the 'TPU device error — kernel fault' execution ceiling.

One device execution of tunable duration (fori_loop of f32 matmuls) with a
TRACED iteration count — a single compilation serves every duration, so the
probe isolates execution *time* from program *size*. If the axon runtime
kills executions above some wall-time regardless of content, the
pure-matmul loop dies too -> time watchdog, not a Mosaic/program bug.

Usage: python bench/experiments/ceiling_probe.py   (TPU, no PYTHONPATH)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

N = 2048


def work(iters, x):
    def body(_, a):
        return jnp.tanh(a @ a) * 0.999
    return lax.fori_loop(0, iters, body, x)


x = (jnp.ones((N, N), jnp.float32) / N) + jnp.eye(N, dtype=jnp.float32) * 1e-3
run = jax.jit(work)


def timed(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(iters), x))
    return time.perf_counter() - t0


w1 = timed(2000)          # compile + short run
w2 = timed(20000)
per = w2 / 20000
print(f"walls: 2k={w1:.1f}s 20k={w2:.1f}s -> per-iter {per*1e6:.1f} us",
      flush=True)
for target in (30, 55, 70, 90, 120, 180, 300):
    iters = min(int(target / per), 2**31 - 1)
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(run(jnp.int32(iters), x))
        print(f"target={target}s iters={iters}: OK "
              f"wall={time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"target={target}s iters={iters}: FAIL after "
              f"{time.perf_counter()-t0:.1f}s: {str(e)[:300]}", flush=True)
        break
