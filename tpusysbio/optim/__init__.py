"""Fully-jitted least-squares optimizers (SURVEY.md §1 L5, §3.5).

Replaces the reference's Fortran MINPACK ``lmdif``/``lmder`` core
(``scipy/optimize/_minpack_py.py:439-449``) with a Levenberg–Marquardt
trust-region loop inside ``lax.while_loop`` — no host callbacks, vmappable
over multi-start ensembles. Termination semantics follow
``scipy.optimize.least_squares`` (ftol/xtol/gtol,
``scipy/optimize/_lsq/common.py:705``).
"""

from tpusysbio.optim.lm import FitResult, lm_fit  # noqa: F401
from tpusysbio.optim.trf import (  # noqa: F401
    trf_fit,
    trf_finish,
    trf_init,
    trf_run,
)
