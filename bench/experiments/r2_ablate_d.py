"""Round-2 ablations, part D: screening batch-size scaling (mp + pallas).

Usage: python bench/experiments/r2_ablate_d.py
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
                        linear_solver="pallas", sens_precision="f32")
    bench("D1 screen mp pallas b512", mapk, p, 100.0, mp_p, 512)
    bench("D2 screen mp pallas b1024", mapk, p, 100.0, mp_p, 1024)
    bench("D3 tight pallas b64", mapk, p, 100.0, ti_p, 64)


if __name__ == "__main__":
    main()
