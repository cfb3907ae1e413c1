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
  (SURVEY.md §2c — ensemble parallelism is the flagship strategy),
- ecosystem IO: SBML import/export (``model.sbml_import`` /
  ``model.sbml_export``), complete PEtab problems (``petab_import``),
  tidy-CSV measurement tables (``data.io``),
- regularized/robust fitting: log-normal parameter and scale-factor
  priors (``project.priors``), scipy-parity robust losses for TRF
  (``optim.loss``), condition-group parameter sharing
  (``ParameterMap(grouped=...)``), and plotting (``viz``),
- post-fit identifiability: profile likelihood as vmapped warm-started
  chains with likelihood-ratio confidence intervals (``fit.profile``),
  and Bayesian posteriors via ensemble MCMC (``fit.mcmc`` — the emcee
  stretch move as one jitted ``lax.scan`` over lockstep walkers),
- SciPy-signature facades for zero-rewrite migration
  (``tpusysbio.compat``: solve_ivp / odeint / leastsq / least_squares).

Nothing here imports from the reference; the TPU compute path is
JAX/XLA/Pallas throughout (XLA/Mosaic is the native layer on TPU).
"""

__version__ = "0.2.0"

import jax as _jax

# TPU MXU f32 matmuls run at bfloat16 precision under JAX's DEFAULT matmul
# precision — ~3 decimal digits, which silently wrecks the f32 Newton hot
# loop: measured on MAPK-22 (bench/experiments/mp_debug.py), the
# mixed-precision screening stepper goes from 100% step-size-underflow
# failures with ~50% rejected steps to 100% convergence at the CPU step
# count (and 2.5x faster) once matmuls honor true f32. This is a numerics
# framework: bf16 contraction is never an acceptable default, and at the
# n<=128 matrix sizes of this domain the extra MXU passes are noise. f64
# (emulated) and CPU backends are unaffected by this setting. Respect an
# explicit user choice: only set the default when it is still unset (the
# jax default is None), so a value configured before import — via env var
# JAX_DEFAULT_MATMUL_PRECISION or jax.config — wins.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from tpusysbio.config import SolverConfig, FitConfig, MeshConfig  # noqa: F401,E402
