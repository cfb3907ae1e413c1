"""Post-hoc continuous solution (scipy ``OdeSolution`` analogue).

The reference stack returns an ``OdeSolution`` evaluable at arbitrary
times after the fact (``scipy/integrate/_ivp/common.py:137`` — a list of
per-step ``BdfDenseOutput`` interpolants with bisected segment lookup).
The TPU-native stepper evaluates dense output at *static* ``t_eval``
inside the jit instead (static shapes, no host round-trips) — this
module closes the remaining API asymmetry with a thin host-side export:
``bdf_solve(..., dense_export=True)`` records each accepted step's
interpolant parameters ``(t_new, h, order, D[:order+1])`` into static
``max_steps``-capacity buffers, and :class:`OdeSolution` rebuilds the
exact same piecewise polynomial on the host (NumPy, f64).

The recorded polynomial is IDENTICAL to the in-loop dense output (same
``BdfDenseOutput`` formula, ``scipy/integrate/_ivp/bdf.py:457-479``), so
``sol(t_eval)`` reproduces ``result.ys`` to floating-point roundoff —
tested in ``tests/test_dense_solution.py``.

Intended use is single simulations / post-fit inspection: the export
buffers cost ``max_steps × (MAX_ORDER+1) × n × (1+m)`` elements per
member, which is cheap unvmapped but deliberately opt-in for ensembles
(pass ``dense_output=True`` to :meth:`OdeModel.simulate`). For a
vmapped run, slice one member first::

    res_i = jax.tree.map(lambda a: a[i], batched_result)
    sol = OdeSolution(res_i)
"""

from __future__ import annotations

import numpy as np

MAX_ORDER = 5


class OdeSolution:
    """Piecewise-polynomial continuous solution from a dense-export run.

    Built from an :class:`~tpusysbio.solvers.common.IntegrateResult`
    produced with ``dense_export=True`` (``bdf_solve``) /
    ``dense_output=True`` (``OdeModel.simulate``). Callable like the
    scipy object: ``sol(t)`` returns the state, ``sol.sens(t)`` the
    forward-sensitivity block when the run carried one.

    Segment semantics match scipy's ``OdeSolution.__call__``
    (``scipy/integrate/_ivp/common.py:186-236``): time ``t`` is mapped
    to the accepted step whose interval contains it; times outside
    ``[t0, t_final]`` evaluate the nearest segment's polynomial
    (extrapolation, like scipy's local-interpolant behavior at the
    boundary segments).
    """

    def __init__(self, result):
        if result.seg_t is None:
            raise ValueError(
                "result carries no dense-export buffers — integrate with "
                "dense_export=True (bdf_solve) / dense_output=True "
                "(OdeModel.simulate)")
        nacc = int(result.naccepted)
        if nacc == 0:
            raise ValueError("no accepted steps to interpolate")
        self.ts = np.asarray(result.seg_t, np.float64)[:nacc]
        self.hs = np.asarray(result.seg_h, np.float64)[:nacc]
        self.orders = np.asarray(result.seg_order)[:nacc]
        parts = (result.seg_D if isinstance(result.seg_D, tuple)
                 else (result.seg_D,))
        # (S, MAX_ORDER+1, n, 1+m): state column 0, sensitivity columns 1..
        self.D = np.concatenate(
            [np.asarray(p, np.float64)[:nacc] for p in parts], axis=-1)
        self.n = self.D.shape[2]
        self.n_cols = self.D.shape[3]
        self.t_max = float(self.ts[-1])

    def _eval(self, t):
        t = np.asarray(t, np.float64)
        scalar = t.ndim == 0
        t = np.atleast_1d(t)
        # first segment with t_hi >= t; clamp outside times to the
        # boundary segments (extrapolation on their polynomials)
        seg = np.clip(np.searchsorted(self.ts, t, side="left"),
                      0, len(self.ts) - 1)
        t_hi = self.ts[seg]
        h = self.hs[seg]
        k = self.orders[seg]
        # BdfDenseOutput (scipy/integrate/_ivp/bdf.py:466-479):
        # x_j = (t - (t_hi - j*h)) / ((j+1) h), p = cumprod(x), masked at
        # the segment's order; y = D[0] + sum_j p_j D[j+1]
        j = np.arange(MAX_ORDER, dtype=np.float64)[None, :]
        x = (t[:, None] - (t_hi[:, None] - h[:, None] * j)) / (
            h[:, None] * (1.0 + j))
        p = np.cumprod(x, axis=1)
        p = np.where(j + 1 <= k[:, None], p, 0.0)
        D = self.D[seg]                       # (T, MAX_ORDER+1, n, K)
        vals = D[:, 0] + np.einsum("tj,tjnk->tnk", p, D[:, 1:])
        return vals[0] if scalar else vals

    def __call__(self, t):
        """State trajectory at ``t``: (n,) for scalar ``t``, (T, n) for a
        vector — the framework's (time-major) convention."""
        return self._eval(t)[..., 0]

    def sens(self, t):
        """Forward sensitivities at ``t``: (n, m) / (T, n, m)."""
        if self.n_cols < 2:
            raise ValueError("run carried no sensitivity columns")
        return self._eval(t)[..., 1:]
