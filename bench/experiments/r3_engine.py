"""Round-3 engine rates: screening + tight with the Newton early-exit
while_loop and (for fits) theta-mode sensitivities.

Usage: python bench/experiments/r3_engine.py   (TPU, no PYTHONPATH)
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
    mp_p = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                        linear_solver="pallas", mixed_precision=True)
    ti_p = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                        linear_solver="pallas", sens_precision="f32",
                        dense_f32=True)
    bench("R3 screen mp pallas b256", mapk, p, 100.0, mp_p, 256)
    bench("R3 tight pallas b256", mapk, p, 100.0, ti_p, 256)


if __name__ == "__main__":
    main()
