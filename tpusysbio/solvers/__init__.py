"""Stiff and non-stiff ODE integrators as pure JAX programs.

Replaces the reference's Fortran cores (ODEPACK LSODA entered at
``scipy/integrate/_odepack_py.py:252``; SURVEY.md §2b) with steppers whose
entire adaptive loop lives inside one jitted ``lax.while_loop`` — no per-step
host callbacks, fully vmappable over multi-start ensembles.

- ``bdf``        — variable-order (1-5) NDF/BDF, modified Newton with reused
                   factorization; spec parity: ``scipy/integrate/_ivp/bdf.py``.
- ``rosenbrock`` — ROS3P-family linearly-implicit stepper: no Newton
                   iteration, fixed work per step — the best lockstep-vmap
                   behavior for ensembles (SURVEY.md §7 M8).
- ``dopri5``     — explicit RK45 (Dormand-Prince) for non-stiff problems.
- ``adams``      — variable-order (2-9) Adams–Bashforth–Moulton PECE
                   multistep: 2 RHS evaluations per step, no factorizations
                   — the LSODA non-stiff phase (ODEPACK semantics,
                   ``scipy/integrate/_ivp/lsoda.py``) done TPU-native.
"""

from tpusysbio.solvers.common import (  # noqa: F401
    STATUS_RUNNING,
    STATUS_DONE,
    STATUS_TOO_SMALL_STEP,
    STATUS_NONFINITE,
    STATUS_MAX_STEPS,
    STATUS_EVENT,
    EventSpec,
    IntegrateResult,
)
from tpusysbio.solvers.adams import adams_solve  # noqa: F401
from tpusysbio.solvers.auto import auto_solve  # noqa: F401
from tpusysbio.solvers.bdf import bdf_solve  # noqa: F401
from tpusysbio.solvers.dense import OdeSolution  # noqa: F401
from tpusysbio.solvers.dopri5 import dopri5_solve  # noqa: F401
from tpusysbio.solvers.radau import radau_solve  # noqa: F401
from tpusysbio.solvers.rosenbrock import rosenbrock_solve  # noqa: F401
from tpusysbio.solvers.steady_state import steady_state  # noqa: F401

SOLVERS = {
    "adams": adams_solve,
    "auto": auto_solve,
    "bdf": bdf_solve,
    "radau": radau_solve,
    "dopri5": dopri5_solve,
    "rosenbrock": rosenbrock_solve,
}
