"""Probe the 'TPU device error — kernel fault' execution ceiling.

One device execution of tunable duration (fori_loop of f32 matmuls).
If the axon runtime kills executions above ~60 s regardless of content,
the pure-matmul loop dies too -> time watchdog, not a Mosaic/program bug.
Usage: python bench/experiments/ceiling_probe.py   (TPU, no PYTHONPATH)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax

N = 2048

def work(iters, x):
    def body(_, a):
        return jnp.tanh(a @ a) * 0.999
    return lax.fori_loop(0, iters, body, x, unroll=False)

x = (jnp.ones((N, N), jnp.float32) / N) + jnp.eye(N, dtype=jnp.float32)*1e-3
run = jax.jit(work, static_argnums=0)

def timed(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(run(iters, x))
    return time.perf_counter() - t0

w1, w2 = timed(5000), timed(20000)
per = (w2 - w1) / 15000  # compile amortized out? separate compiles; use big run
w3 = timed(40000)
per = (w3 - w2) / 20000
print(f"walls: 5k={w1:.1f}s 20k={w2:.1f}s 40k={w3:.1f}s -> per-iter {per*1e6:.1f} us", flush=True)
if per <= 0:
    per = w3 / 40000
for target in (30, 55, 75, 100, 150, 300):
    iters = min(int(target / per), 2**31 - 1)
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(run(iters, x))
        print(f"target={target}s iters={iters}: OK wall={time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"target={target}s iters={iters}: FAIL after {time.perf_counter()-t0:.1f}s: {str(e)[:300]}", flush=True)
        break
