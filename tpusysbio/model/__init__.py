"""Model layer: ODE right-hand sides as pure JAX functions.

Replaces the reference's ``OdeModel`` wrapper + SymPy sensitivity codegen
(SURVEY.md §2 #1-#2): the RHS is a plain ``f(t, y, p)`` jittable function;
Jacobians come from ``jax.jacfwd`` and sensitivity equations from
``jax.jvp`` (tpusysbio.sens) — no generated source files, no augmented-system
codegen ("hand-coded augmented systems" are exactly what BASELINE.json:5
says to replace).
"""

from tpusysbio.model.core import OdeModel  # noqa: F401
from tpusysbio.model.massaction import MassActionNetwork  # noqa: F401
from tpusysbio.model import library  # noqa: F401
