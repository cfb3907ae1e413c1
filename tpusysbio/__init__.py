"""tpusysbio — a TPU-native systems-biology modeling and fitting framework.

A from-scratch rebuild of the capabilities of ``FedericoV/SysBio_Modeling``
(see ``SURVEY.md`` — the reference mount is empty; the blueprint of record is
SURVEY.md, grounded in BASELINE.json and the SciPy numerical cores the
reference delegates to):

- stiff ODE integration (BDF/NDF and Rosenbrock steppers) as pure JAX
  programs under ``lax.while_loop`` — spec parity with
  ``scipy/integrate/_ivp/bdf.py`` (see SURVEY.md §2 #9),
- forward sensitivities via ``jax.jvp`` on the RHS, propagated inside the
  stepper with a shared Newton LU (CVODES staggered-corrector style,
  SURVEY.md §3.3),
- an experiment/measurement data model with static padded shapes,
- a project/objective layer: global↔local parameter mapping in log space,
  analytic scale factors for relative data, stacked weighted residuals and
  sensitivity-based Jacobians (SURVEY.md §2 #5-#7),
- a fully-jitted Levenberg–Marquardt / trust-region optimizer
  (spec: ``scipy/optimize/_lsq``; SURVEY.md §3.5),
- vmapped multi-start fitting sharded over a ``jax.sharding.Mesh``
  (SURVEY.md §2c — ensemble parallelism is the flagship strategy).

Nothing here imports from the reference; the TPU compute path is
JAX/XLA/Pallas throughout (XLA/Mosaic is the native layer on TPU).
"""

__version__ = "0.1.0"

from tpusysbio.config import SolverConfig, FitConfig, MeshConfig  # noqa: F401
