"""Profile likelihood — TPU-native identifiability analysis.

The reference workflow's companion analysis (Raue et al. 2009 style):
for each parameter θᵢ, re-optimize all *other* parameters while θᵢ is
pinned to a grid of values around the optimum; the resulting cost curve
(the "profile") gives likelihood-ratio confidence intervals and exposes
structural/practical non-identifiability (flat profiles). The reference
stack would run one ``leastsq`` per grid point per parameter, serially.

TPU-native shape: every (parameter, direction) pair is an independent
*chain* — ``vmap`` over the 2·P chains, ``lax.scan`` over the grid steps
inside each chain so every point warm-starts from the previous point's
optimum (the standard profile-walking scheme, which keeps each re-fit a
few LM iterations instead of a cold fit). One jitted program; optional
``shard_map`` over a 1-D mesh shards the chain axis across chips.

Pinning is expressed *inside* LM, not by re-indexing: the residual is
evaluated at ``pin(θ) = θ·(1−e_i) + v·e_i`` and the Jacobian column i is
masked to zero. With a zero column, ``JᵀJ`` has zero row/col i and
``g_i = 0``, so the damped-normal-equations step has δᵢ = 0 exactly
(optim/lm.py clips the Marquardt diagonal away from 0) — the pinned
coordinate never moves, and no dynamic-shape gather/scatter enters the
jitted program. This keeps one compiled fit shape for all parameters.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusysbio.config import FitConfig
from tpusysbio.optim.lm import lm_init, lm_run


class ProfileResult(NamedTuple):
    """Profile curves for P parameters on a (2·n_points+1)-point grid.

    Rows are sorted ascending in the pinned value; the center column
    (index ``n_points``) is the unconstrained optimum itself.
    """
    idx: np.ndarray        # (P,) profiled parameter indices into θ
    values: jax.Array      # (P, 2n+1) pinned θᵢ values, ascending
    costs: jax.Array       # (P, 2n+1) re-optimized 0.5·||r||² per point
    thetas: jax.Array      # (P, 2n+1, G) re-optimized full θ per point
    status: jax.Array      # (P, 2n+1) LM status per point (center = 1)
    cost_opt: jax.Array    # scalar: cost at the unconstrained optimum


def profile_likelihood(
    residual_fn: Callable,
    residual_and_jac_fn: Callable,
    theta_opt: jax.Array,
    idx=None,
    n_points: int = 8,
    span=2.0,
    config: FitConfig = FitConfig(),
    mesh: Optional[Mesh] = None,
) -> ProfileResult:
    """Profile the cost around ``theta_opt`` (a fitted optimum).

    Args:
      residual_fn / residual_and_jac_fn: the same callables a fit uses
        (``θ -> r`` and ``θ -> (r, J)``) — e.g. from ``Project``.
      theta_opt: (G,) the unconstrained optimum to profile around.
      idx: parameter indices to profile (default: all G).
      n_points: grid points per direction (total 2·n_points+1 per row).
      span: half-width of the profile window in θ units (θ is log-space
        by construction here, so a scalar span of e.g. 2.3 means
        ±1 decade around the optimum); scalar or per-parameter (P,).
      mesh: optional 1-D mesh; the 2·P chain axis shards across it
        (2·P must be divisible by the axis size).

    Returns a :class:`ProfileResult`; feed it to
    :func:`confidence_intervals` for likelihood-ratio CIs.
    """
    theta_opt = jnp.asarray(theta_opt)
    dtype = theta_opt.dtype
    G = theta_opt.shape[0]
    if idx is None:
        idx = np.arange(G)
    idx = np.asarray(idx, np.int32)
    n_p = int(idx.shape[0])
    span_arr = np.broadcast_to(np.asarray(span, dtype), (n_p,))
    delta = jnp.asarray(span_arr / n_points, dtype)          # (P,)
    onehots = jnp.asarray(np.eye(G, dtype=dtype)[idx])       # (P, G)

    def pinned_fit(theta_start, onehot, v):
        def pin(th):
            return th * (1.0 - onehot) + v * onehot

        def r_fn(th):
            return residual_fn(pin(th))

        def rj_fn(th):
            r, J = residual_and_jac_fn(pin(th))
            return r, J * (1.0 - onehot)[None, :]

        # lm_init + lm_run, NOT lm_fit: lm_finish's covariance solve
        # (JᵀJ)⁻¹ is guaranteed singular here (the pinned column is masked
        # to zero) and the scan only carries theta/cost/status, so the
        # per-grid-point G×G factor+G-RHS solve would be pure waste.
        st = lm_init(rj_fn, pin(theta_start), config)
        st = lm_run(r_fn, rj_fn, st, config)
        return pin(st.theta), st.cost, st.status

    def chain(onehot, d, sgn):
        center = jnp.sum(theta_opt * onehot)

        def step(th_prev, k):
            v = center + sgn * d * k
            theta, cost, status = pinned_fit(th_prev, onehot, v)
            return theta, (v, cost, status, theta)

        ks = jnp.arange(1, n_points + 1, dtype=dtype)
        _, out = lax.scan(step, theta_opt, ks)
        return out  # each leaf leading axis = n_points, outward order

    # chain axis: (P, 2) flattened to 2P — [+dir rows..., -dir rows...]
    sgns = jnp.concatenate([jnp.ones((n_p,), dtype), -jnp.ones((n_p,), dtype)])
    ohs = jnp.concatenate([onehots, onehots], axis=0)
    ds = jnp.concatenate([delta, delta])

    def run_chains(ohs_, ds_, sgns_):
        return jax.vmap(chain)(ohs_, ds_, sgns_)

    if mesh is not None:
        axis = mesh.axis_names[0]
        run = jax.jit(jax.shard_map(
            run_chains, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False))
    else:
        run = jax.jit(run_chains)
    values, costs, status, thetas = run(ohs, ds, sgns)

    r0 = residual_fn(theta_opt)
    cost_opt = 0.5 * jnp.sum(r0 * r0)

    # assemble ascending rows: reversed(-dir) | center | +dir
    def row(plus, minus, center_val):
        return jnp.concatenate([minus[::-1], center_val[None], plus])

    vals = jax.vmap(row)(values[:n_p], values[n_p:],
                         jnp.asarray(theta_opt)[jnp.asarray(idx)])
    cs = jax.vmap(row)(costs[:n_p], costs[n_p:],
                       jnp.broadcast_to(cost_opt, (n_p,)))
    sts = jax.vmap(row)(status[:n_p], status[n_p:],
                        jnp.ones((n_p,), status.dtype))
    ths = jnp.concatenate(
        [thetas[n_p:, ::-1], jnp.broadcast_to(theta_opt, (n_p, 1, G)),
         thetas[:n_p]], axis=1)
    return ProfileResult(idx=idx, values=vals, costs=cs, thetas=ths,
                         status=sts, cost_opt=cost_opt)


def confidence_intervals(result: ProfileResult, level: float = 0.95):
    """Likelihood-ratio CIs from profile curves (host-side).

    The profile crosses the threshold ``cost* + 0.5·χ²₁(level)`` (cost is
    0.5·||r||², so 2·Δcost is the likelihood-ratio statistic; Raue et al.
    2009 eq. 6). Crossings are located by interpolating the likelihood
    root ``w = sqrt(2·Δcost)`` — exactly linear in the pinned value for a
    quadratic profile, so near-quadratic profiles get near-exact bounds
    from coarse grids. A direction whose profile never reaches the
    threshold inside the window yields ±inf — the practical-non-
    identifiability signal (widen ``span`` to distinguish it from a
    too-narrow window).

    Returns ``(P, 2)`` array of [lower, upper] bounds in θ space.

    The LR reference is ``min(cost_opt, costs.min())`` — warm-started
    pinned re-fits can dip marginally below the nominally-optimal center
    cost, and measuring Δcost against the best cost actually seen keeps
    the profile non-negative without a clip that would hide a stale
    optimum. A ``UserWarning`` is emitted when any grid point on a crossed
    segment has LM status ≤ 0 (unconverged — the interpolated bound may be
    spuriously narrow).
    """
    import warnings

    from scipy.stats import chi2

    values = np.asarray(result.values)
    costs = np.asarray(result.costs)
    status = np.asarray(result.status)
    ref_cost = min(float(result.cost_opt), float(costs.min()))
    w = np.sqrt(2.0 * np.clip(costs - ref_cost, 0.0, None))
    w_thr = float(np.sqrt(chi2.ppf(level, df=1)))
    n_p, n_grid = costs.shape
    center = n_grid // 2
    out = np.empty((n_p, 2))

    def _check_converged(p, j0, j1, side):
        if status[p, j0] <= 0 or status[p, j1] <= 0:
            warnings.warn(
                f"profile CI for parameter row {p} ({side} bound): a grid "
                "point on the crossed segment did not converge (LM status "
                "<= 0); the interpolated bound may be spuriously narrow.",
                UserWarning, stacklevel=2)

    for p in range(n_p):
        lo, hi = -np.inf, np.inf
        # walk right from the center for the upper bound; the last grid
        # pair accepts a crossing landing exactly on the endpoint
        for j in range(center, n_grid - 1):
            w0, w1 = w[p, j], w[p, j + 1]
            last = j == n_grid - 2
            if w0 <= w_thr and (w_thr < w1 or (last and w_thr <= w1)):
                f = (w_thr - w0) / (w1 - w0) if w1 > w0 else 1.0
                hi = values[p, j] + f * (values[p, j + 1] - values[p, j])
                _check_converged(p, j, j + 1, "upper")
                break
        # walk left for the lower bound
        for j in range(center, 0, -1):
            w0, w1 = w[p, j], w[p, j - 1]
            last = j == 1
            if w0 <= w_thr and (w_thr < w1 or (last and w_thr <= w1)):
                f = (w_thr - w0) / (w1 - w0) if w1 > w0 else 1.0
                lo = values[p, j] + f * (values[p, j - 1] - values[p, j])
                _check_converged(p, j, j - 1, "lower")
                break
        out[p] = (lo, hi)
    return out
