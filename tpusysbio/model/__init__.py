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
from tpusysbio.model.sympy_import import from_sympy  # noqa: F401
from tpusysbio.model import library  # noqa: F401


def __getattr__(name):
    # lazy: sbml_import pulls in sympy at module scope (~seconds); don't
    # tax every package import for it
    if name == "from_sbml":
        from tpusysbio.model.sbml_import import from_sbml
        return from_sbml
    raise AttributeError(name)
