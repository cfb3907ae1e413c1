"""Project / objective assembly — the heart of the reference (SURVEY.md §1
L4, §2 #5-#7): global↔local parameter mapping in log space, analytic scale
factors for relative data, stacked weighted residuals across experiments,
and the sensitivity-based residual Jacobian with the scale-factor and
log-transform chain-rule terms.
"""

from tpusysbio.project.mapping import ParameterMap  # noqa: F401
from tpusysbio.project.scale_factors import (  # noqa: F401
    scale_factors,
    scale_factors_and_grad,
)
from tpusysbio.project.priors import Priors  # noqa: F401
from tpusysbio.project.residuals import Project  # noqa: F401
