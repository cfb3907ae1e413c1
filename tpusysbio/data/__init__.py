"""Experiment & measurement data model (SURVEY.md §1 L3, §2 #3-#4).

Pytree dataclasses with static padded shapes: ragged per-experiment
measurement sets become fixed-width arrays plus validity masks, so one jit
covers every experiment and the ensemble vmaps cleanly (SURVEY.md §7 hard
part 5).
"""

from tpusysbio.data.experiment import (  # noqa: F401
    Experiment,
    ExperimentBatch,
    Measurement,
)
from tpusysbio.data.io import experiments_from_csv  # noqa: F401
