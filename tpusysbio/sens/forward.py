"""Forward sensitivity equations derived from the RHS via ``jax.jvp``.

The reference generated the augmented system ``dS/dt = (∂f/∂y)S + ∂f/∂p``
symbolically with SymPy and emitted Python source (SURVEY.md §2 #2);
BASELINE.json:5 mandates replacing that with ``jax.jvp`` on the RHS. One JVP
per parameter column — the JVP evaluates ``J @ s + F_p`` *without ever
materializing J or F_p*, batched over columns with ``vmap``.

The columns are propagated inside the stepper (solvers/bdf.py column-block
state) sharing the Newton factorization of ``I - cJ`` — the CVODES
staggered-corrector structure (SURVEY.md §3.3) — rather than integrating a
separate (n + n·m)-state system through a generic solver.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_sens_rhs(rhs: Callable, p: jax.Array) -> Callable:
    """Build ``(t, y, S) -> dS/dt`` for ``dy/dt = rhs(t, y, p)``.

    ``S`` has shape (n, m) with column k = dy/dp_k. Each column's time
    derivative is the JVP of ``rhs`` at ``(y, p)`` along ``(S[:, k], e_k)``.
    """
    m = p.shape[0]

    def sens_rhs(t, y, S):
        # dtype-following contract: compute in the precision of y, so the
        # stepper can run its Newton iterations in f32 (mixed precision,
        # docs/PERFORMANCE.md roadmap #1) by feeding f32 states.
        pc = p.astype(y.dtype)
        E = jnp.eye(m, dtype=y.dtype)

        def col(s_col, e_col):
            return jax.jvp(lambda yy, pp: rhs(t, yy, pp),
                           (y, pc), (s_col, e_col))[1]

        return jax.vmap(col, in_axes=(1, 0), out_axes=1)(S, E)

    return sens_rhs


def make_sens_rhs_dir(rhs: Callable, p: jax.Array,
                      C: jax.Array) -> Callable:
    """Build the REDUCED ``(t, y, S) -> dS/dt`` propagating sensitivities
    only along the parameter directions ``C`` (m, G) — sensitivities
    w.r.t. G fit parameters θ with ``C = dp/dθ``, instead of all m model
    parameters. Each of the G columns is one JVP along ``(S[:, g],
    C[:, g])``; for G ≪ m (the EGFR-class configs: 13 fit parameters over
    ~150 rate constants) this shrinks the column block by m/G with no
    accuracy change (the chain rule moves inside the integrator)."""

    def sens_rhs(t, y, S):
        pc = p.astype(y.dtype)
        Cc = C.astype(y.dtype)

        def col(s_col, c_col):
            return jax.jvp(lambda yy, pp: rhs(t, yy, pp),
                           (y, pc), (s_col, c_col))[1]

        return jax.vmap(col, in_axes=(1, 1), out_axes=1)(S, Cc)

    return sens_rhs
