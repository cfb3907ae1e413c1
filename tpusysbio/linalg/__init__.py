"""Dense linear algebra kernels for the Newton inner loop.

The reference's Newton solves went to LAPACK ``getrf/getrs`` via
``lu_factor``/``lu_solve`` (``scipy/integrate/_ivp/bdf.py:231-236``;
SURVEY.md §2b). On this TPU the stock XLA LU expander rejects f64
("Only F32 and C64 types are implemented in LuDecomposition"), so the
rebuild ships its own pivoted LU in plain JAX ops — verified in SURVEY.md §7
environment notes to hit full double precision on-device — plus an
explicit-inverse mode (Newton solves become MXU matmuls, the best lockstep
vmap shape) and a Pallas VMEM-resident batched kernel.
"""

from tpusysbio.linalg.lu import lu_factor, lu_solve, lu_inverse, solve  # noqa: F401
from tpusysbio.linalg.newton import make_linear_solver  # noqa: F401
from tpusysbio.linalg.pallas_lu import inverse  # noqa: F401
