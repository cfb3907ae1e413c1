from tpusysbio.sens.forward import (  # noqa: F401
    make_sens_rhs,
    make_sens_rhs_dir,
)
