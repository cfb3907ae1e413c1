"""Round-5 engine ablations: where does the tight-path step time go?

VERDICT r4 next-round #1: the engine is flat at ~250 int/s/chip while
pipeline wins landed. Before touching the stepper, measure the three
candidate sinks on real TPU (MAPK-22, b256, rtol=1e-6 unless noted):

  T0 tight-current      bench.py contract (sens 30, 41 pts, pallas)
  T1 tight-nosens       m=0 — total cost of the 30-column sens channel
  T2 tight-NT3          3 output points — dense-output interp cost
  T3 mp-rtol1e-6        all-f32 hot loop at tight rtol — the emulated-
                        f64 tax floor probe (accuracy/nsteps recorded;
                        NOT a shippable config, a bound)
  T4 mp-rtol1e-3        screening reference point (round-4: ~1992/s)

Usage: python bench/experiments/r5_ablate.py   (TPU, no PYTHONPATH edits)
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
    tight = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=1024,
                         linear_solver="pallas", sens_precision="f32",
                         dense_f32=True)
    mp6 = SolverConfig(rtol=1e-6, atol=1e-9, max_steps=2048,
                       linear_solver="pallas", mixed_precision=True)
    mp3 = SolverConfig(rtol=1e-3, atol=1e-6, max_steps=512,
                       linear_solver="pallas", mixed_precision=True)
    bench("T0 tight-current b256", mapk, p, 100.0, tight, 256)
    bench("T1 tight-nosens b256", mapk, p, 100.0, tight, 256,
          with_sens=False)
    bench("T3 mp-rtol1e-6 b256", mapk, p, 100.0, mp6, 256)
    bench("T4 mp-rtol1e-3 b256", mapk, p, 100.0, mp3, 256)


if __name__ == "__main__":
    main()
