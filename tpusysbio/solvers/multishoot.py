"""Multiple shooting: parallel-in-time integration (SURVEY.md §2c SP row).

The reference's "sequence axis" is integration time, handled strictly
serially. The TPU-native analogue of sequence parallelism is multiple
shooting: split [t0, tf] into K windows, integrate all K concurrently
(``vmap`` — or sharded across chips for very long horizons), and append
continuity defects ``y_k(t_{k+1}) − z_{k+1}`` to the least-squares system,
where the window-start states z are extra unknowns. Mathematically natural
in an LM framework (cf. time-vectorized integration, PAPERS.md:5
arXiv 2310.08649), and it also tames long-horizon lockstep divergence:
each window is short, so vmapped members stay in step.

This module provides the building blocks; ``ShootingProblem`` assembles a
joint (θ, z) residual/Jacobian pair consumable by ``optim.lm_fit``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpusysbio.config import SolverConfig
from tpusysbio.solvers.bdf import bdf_solve


def window_grid(t_span, n_windows: int, dtype=jnp.float64):
    """Equispaced window boundaries: (K+1,) times."""
    return jnp.linspace(t_span[0], t_span[1], n_windows + 1, dtype=dtype)


def integrate_windows(
    f: Callable,
    boundaries: jax.Array,       # (K+1,)
    z: jax.Array,                # (K, n) window-start states
    config: SolverConfig = SolverConfig(),
    sens_rhs: Optional[Callable] = None,
    n_params: int = 0,
):
    """Integrate all K windows in parallel.

    Returns ``(y_end, S_end, status)``:
      y_end  (K, n)      state at each window's right boundary,
      S_end  (K, n, m+n) sensitivities of the end state w.r.t.
                         [params | window-start state] (m = n_params),
      status (K,).

    The combined sensitivity block rides the stepper's column-block state:
    parameter columns use the jvp sensitivity RHS; initial-state columns
    use the same RHS with a zero parameter tangent, starting from I.
    """
    n = z.shape[1]

    if sens_rhs is None:
        def combined_rhs(t, y, S):  # pragma: no cover - placeholder
            raise AssertionError
        m_total = 0
    else:
        m = n_params

        def combined_rhs(t, y, S):
            # first m columns: dS/dt = J S + F_p ; last n: dS/dt = J S
            Sp = S[:, :m]
            Sz = S[:, m:]
            dSp = sens_rhs(t, y, Sp)
            # J @ Sz via jvp with zero parameter tangent: reuse sens_rhs's
            # machinery by noting sens_rhs(t,y,S) = J S + F_p E; we need
            # the homogeneous part — compute via jvp on y only.
            dSz = jax.vmap(
                lambda col: jax.jvp(lambda yy: f(t, yy), (y,), (col,))[1],
                in_axes=1, out_axes=1)(Sz)
            return jnp.concatenate([dSp, dSz], axis=1)

        m_total = m + n

    def one_window(z_k, t_lo, t_hi):
        t_eval = jnp.stack([t_hi])
        if sens_rhs is None:
            res = bdf_solve(f, (t_lo, t_hi), z_k, t_eval, config=config)
            return res.ys[0], jnp.zeros((n, 0), z.dtype), res.status
        s0 = jnp.concatenate(
            [jnp.zeros((n, n_params), z.dtype), jnp.eye(n, dtype=z.dtype)],
            axis=1)
        res = bdf_solve(f, (t_lo, t_hi), z_k, t_eval, config=config,
                        sens_rhs=combined_rhs, s0=s0)
        return res.ys[0], res.sens[0], res.status

    return jax.vmap(one_window)(z, boundaries[:-1], boundaries[1:])


class ShootingEval(NamedTuple):
    defects: jax.Array      # (K-1, n) continuity defects
    jac_theta: jax.Array    # (K-1, n, G) d defects / d θ-mapped params
    jac_z: jax.Array        # ((K-1)*n, (K-1)*n) sparse-as-dense d/dz block
    status: jax.Array


class ShootingProblem:
    """Joint (params, window-states) least-squares assembly.

    Unknowns: x = [θ (P params, linear space here) ; z_1..z_{K-1} (n each)].
    Residuals appended by the caller's data terms; this class contributes
    the weighted continuity defects and their exact Jacobian from the
    window sensitivities.
    """

    def __init__(self, f_p: Callable, t_span, y0_fn: Callable,
                 n_windows: int, n_params: int,
                 config: SolverConfig = SolverConfig(),
                 weight: float = 1.0):
        self.f_p = f_p            # f(t, y, p)
        self.t_span = t_span
        self.y0_fn = y0_fn        # p -> y0
        self.K = n_windows
        self.P = n_params
        self.config = config
        self.weight = weight

    def init_z(self, p: jax.Array) -> jax.Array:
        """Serial coarse initialization of window states (one cheap pass)."""
        y0 = self.y0_fn(p)
        bounds = window_grid(self.t_span, self.K, y0.dtype)
        cfg = SolverConfig(rtol=1e-3, atol=1e-6,
                           max_steps=self.config.max_steps)
        res = bdf_solve(lambda t, y: self.f_p(t, y, p), self.t_span, y0,
                        bounds[:-1], config=cfg)
        return res.ys  # (K, n) states at window starts

    def defects_and_jac(self, p: jax.Array, z_tail: jax.Array):
        """Continuity defects r (K-1, n) and Jacobians w.r.t. (p, z).

        ``z_tail`` are windows 1..K-1 start states; window 0 starts at
        y0(p).
        """
        from tpusysbio.sens import make_sens_rhs

        y0 = self.y0_fn(p)
        n = y0.shape[0]
        z = jnp.concatenate([y0[None], z_tail], axis=0)  # (K, n)
        bounds = window_grid(self.t_span, self.K, y0.dtype)
        f = lambda t, y: self.f_p(t, y, p)  # noqa: E731
        sens_rhs = make_sens_rhs(self.f_p, p)
        y_end, S_end, status = integrate_windows(
            f, bounds, z, config=self.config, sens_rhs=sens_rhs,
            n_params=self.P)

        w = self.weight
        defects = w * (y_end[:-1] - z_tail)             # (K-1, n)
        dD_dp = w * S_end[:-1, :, :self.P]              # (K-1, n, P)
        dEnd_dz = S_end[:-1, :, self.P:]                # (K-1, n, n)
        # window-0 start is y0(p): fold its chain rule into dD_dp
        dy0_dp = jax.jacfwd(self.y0_fn)(p)              # (n, P)
        dD_dp = dD_dp.at[0].add(w * dEnd_dz[0] @ dy0_dp)

        # d defect_k / d z_j: dEnd_dz[k] at j=k (k>=1), -I at j=k ... build
        # the (K-1)n x (K-1)n block: defect_k depends on z_k (start of
        # window k; z_tail index k-1) and z_{k+1} (z_tail index k).
        Km1 = self.K - 1
        Jz = jnp.zeros((Km1, n, Km1, n), y0.dtype)
        eye = jnp.eye(n, dtype=y0.dtype)
        for k in range(Km1):
            if k >= 1:
                Jz = Jz.at[k, :, k - 1, :].set(w * dEnd_dz[k])
            Jz = Jz.at[k, :, k, :].add(-w * eye)
        return defects, dD_dp, Jz.reshape(Km1 * n, Km1 * n), status
