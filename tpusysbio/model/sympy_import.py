"""SymPy → JAX model import (SURVEY.md §7 skeleton: model/sympy_import.py).

The reference's models were SymPy expressions from which Python source was
generated — including hand-derived augmented sensitivity systems
(SURVEY.md §2 #2). Here SymPy remains supported as a *front end only*:
symbolic RHS expressions lambdify straight into jittable JAX functions and
all derivatives come from AD, so there is no codegen step and no generated
files to keep in sync.

This is also the natural SBML landing pad: SBML readers produce SymPy
expressions; feed them here.

Example::

    import sympy as sp
    t = sp.Symbol("t")
    S, C, P = sp.symbols("S C P")
    k1, km1, k2, E0 = sp.symbols("k1 km1 k2 E0")
    model = from_sympy(
        name="mm3",
        states=[S, C, P],
        params=[k1, km1, k2, E0],
        odes=[-k1*(E0-C)*S + km1*C,
              k1*(E0-C)*S - (km1+k2)*C,
              k2*C],
        y0=[1.0, 0.0, 0.0],
        t=t,
    )
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from tpusysbio.model.core import OdeModel


def from_sympy(name: str, states: Sequence, params: Sequence,
               odes: Sequence, y0, t=None,
               observables: Optional[Sequence] = None) -> OdeModel:
    """Build an ``OdeModel`` from SymPy expressions.

    Args:
      states/params: SymPy symbols, defining state/parameter order.
      odes: one expression per state (may reference ``t`` for driven
        systems).
      y0: initial condition — floats, or SymPy expressions in ``params``.
      observables: expressions in states+params; defaults to all states.
    """
    import sympy as sp

    states = list(states)
    params = list(params)
    odes = list(odes)
    if len(odes) != len(states):
        raise ValueError("need one ODE per state")
    t_sym = t if t is not None else sp.Symbol("t")

    modules = [{"ImmutableDenseMatrix": jnp.array}, jnp]
    rhs_fn = sp.lambdify((t_sym, states, params), odes, modules=modules)

    def rhs(tt, y, p):
        return jnp.stack(rhs_fn(tt, list(y), list(p)))

    y0_exprs = list(y0)
    if any(isinstance(v, sp.Basic) for v in y0_exprs):
        y0_fn = sp.lambdify((params,), y0_exprs, modules=modules)

        def y0_builder(p):
            return jnp.stack(
                [jnp.asarray(v, p.dtype) for v in y0_fn(list(p))])
    else:
        y0_const = np.asarray([float(v) for v in y0_exprs])

        def y0_builder(p):
            return jnp.asarray(y0_const, p.dtype)

    if observables is None:
        n_obs = len(states)

        def obs(y, p):
            return y
    else:
        obs_exprs = list(observables)
        n_obs = len(obs_exprs)
        obs_fn = sp.lambdify((states, params), obs_exprs, modules=modules)

        def obs(y, p):
            return jnp.stack(
                [jnp.asarray(v, y.dtype) for v in obs_fn(list(y), list(p))])

    return OdeModel(
        name=name, n_states=len(states), n_params=len(params), n_obs=n_obs,
        rhs=rhs, y0=y0_builder, observables=obs,
        param_names=tuple(str(s) for s in params),
        state_names=tuple(str(s) for s in states))
