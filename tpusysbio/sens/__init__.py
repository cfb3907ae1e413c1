from tpusysbio.sens.forward import make_sens_rhs  # noqa: F401
