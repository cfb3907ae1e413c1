"""Multi-start fitting — the flagship TPU parallelism strategy.

The reference ran one ``leastsq`` per start, serially or via a process pool
(SURVEY.md §3.4). Here the entire jitted LM fit is ``vmap``-ed over the
starts axis and sharded across chips with ``shard_map`` over a 1-D
``jax.sharding.Mesh`` (SURVEY.md §2c DP row): thousands of parameter sets
integrate in lockstep per chip; the only cross-chip communication is the
final cost gather (BASELINE.json:5).
"""

from tpusysbio.fit.sampling import latin_hypercube, uniform_starts  # noqa: F401
from tpusysbio.fit.mcmc import (  # noqa: F401
    MCMCResult,
    autocorr_time,
    ensemble_sample,
)
from tpusysbio.fit.profile import (  # noqa: F401
    ProfileResult,
    confidence_intervals,
    profile_likelihood,
)
from tpusysbio.fit.multistart import (  # noqa: F401
    MultistartResult,
    TwoPhaseDriver,
    make_multistart_runner,
    multistart_fit,
    multistart_trf,
    multistart_two_phase,
    run_chunked,
)
