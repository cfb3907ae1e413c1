"""Round-2 ablations, part C: screening engine final bake-off.

  M1  screen mp (f32 storage incl. state) + inv32, b128
  M2  screen mp + inv32, b256
  M3  screen mp + pallas, b256
  S3  screen split-sens + pallas, b256   (P3 retry with 128-block kernel)
  T2  tight split-sens + pallas, b256

Usage: python bench/experiments/r2_ablate_c.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)

from tpusysbio.config import SolverConfig  # noqa: E402
from tpusysbio.model import library  # noqa: E402
from bench.experiments.r2_ablate import bench  # noqa: E402


def main():
    mapk = library.mapk_huang_ferrell()
    p = library.mapk_true_params()
    mp_i = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                        linear_solver="inv32", mixed_precision=True)
    mp_p = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                        linear_solver="pallas", mixed_precision=True)
    sp_p = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                        linear_solver="pallas", sens_precision="f32")
    ti_p = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                        linear_solver="pallas", sens_precision="f32")
    bench("M1 screen mp-f32store inv32 b128", mapk, p, 100.0, mp_i, 128)
    bench("M2 screen mp-f32store inv32 b256", mapk, p, 100.0, mp_i, 256)
    bench("M3 screen mp-f32store pallas b256", mapk, p, 100.0, mp_p, 256)
    bench("S3 screen split pallas b256", mapk, p, 100.0, sp_p, 256)
    bench("T2 tight split pallas b256", mapk, p, 100.0, ti_p, 256)


if __name__ == "__main__":
    main()
