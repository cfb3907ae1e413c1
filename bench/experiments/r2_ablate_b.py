"""Round-2 ablations, part B: screening-config variants.

  B2  rtol=1e-3, split-sens (f64 state column, f32 sens storage) — the
      cheap-screening candidate that reuses the tight path's part layout
  C2  B2 at batch 256
  R2  Radau at rtol=1e-3 split-sens (fixed stage count: lockstep-friendly)

Usage: python bench/experiments/r2_ablate_b.py
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
    screen_split = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                                linear_solver="inv32",
                                sens_precision="f32")
    bench("B2 mapk screen split b128", mapk, p, 100.0, screen_split, 128)
    bench("C2 mapk screen split b256", mapk, p, 100.0, screen_split, 256)
    bench("R2 mapk screen split radau b128", mapk, p, 100.0, screen_split,
          128, stepper="radau")


if __name__ == "__main__":
    main()
