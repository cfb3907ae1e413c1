"""Fit visualization (the reference's plotting utilities, L6).

Two standard plots for this domain:

- :func:`plot_fit` — per-experiment trajectory-vs-data panels: measured
  points with error bars against the model curve at θ, with fitted scale
  factors applied to the model side (data stays in its measured units).
- :func:`plot_waterfall` — the multi-start diagnostic: sorted final
  costs; plateaus = optimization basins, the leftmost plateau's width =
  how reproducibly the best optimum is found.

Matplotlib is imported lazily and the Agg backend is honored — nothing
here touches a display. Plotting is a host-side afterthought by design:
everything is computed from ``Project.evaluate`` results and NumPy
copies; no jit, no TPU round-trips beyond the evaluations themselves.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_fit(proj, theta, n_dense: int = 200, figsize_per_panel=(4.0, 3.0)):
    """Trajectory-vs-data panels, one per experiment.

    The model curve is dense only for experiments without timed inputs /
    pre-equilibration (it comes from a plain ``model.simulate`` on that
    experiment's parameter row); experiments using those features get the
    exact project evaluation at measurement times connected by lines —
    never a curve from the wrong dynamics.

    Returns the matplotlib Figure.
    """
    import jax.numpy as jnp

    plt = _mpl()
    b = proj.batch
    ev = proj.evaluate(jnp.asarray(theta))
    B = np.asarray(ev.scale)
    E = b.t_eval.shape[0]
    p_all = np.asarray(proj.pmap.expand(jnp.asarray(theta)))

    # exact sim values at measurement points (same gather the residuals
    # use), reconstructed from the residuals: r = (B·sim − data)/σ
    M = b.values.shape[1]
    r_data = np.asarray(ev.residuals)[:E * M].reshape(E, M)
    sim_scaled = r_data * np.asarray(b.sigmas) + np.asarray(b.values)

    simple = (b.seg_bounds is None) and (not b.has_preeq)
    ncols = min(E, 3)
    nrows = (E + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, squeeze=False,
        figsize=(figsize_per_panel[0] * ncols, figsize_per_panel[1] * nrows))

    group = np.asarray(b.group)
    mask = np.asarray(b.mask)
    is_ss = np.asarray(b.m_is_ss)
    t_meas = np.take_along_axis(np.asarray(b.t_eval),
                                np.asarray(b.m_t_idx), axis=1)
    obs_idx = np.asarray(b.m_obs)

    for e in range(E):
        ax = axes[e // ncols][e % ncols]
        valid = mask[e]
        obs_here = sorted(set(obs_idx[e][valid].tolist()))
        cmap = plt.get_cmap("tab10")
        if simple:
            t0, t1 = float(np.asarray(b.t0)[e]), float(np.asarray(b.t_end)[e])
            td = jnp.linspace(t0, t1, n_dense)
            res = proj.model.simulate(jnp.asarray(p_all[e]), (t0, t1), td,
                                      config=proj.config,
                                      solver=proj.solver)
            import jax
            otraj = np.asarray(jax.vmap(
                lambda y: proj.model.observables(y, jnp.asarray(p_all[e]))
            )(res.ys))
        for j, o in enumerate(obs_here):
            sel = valid & (obs_idx[e] == o) & ~is_ss[e]
            color = cmap(j % 10)
            if sel.any():
                # data in measured units
                ax.errorbar(t_meas[e][sel], np.asarray(b.values)[e][sel],
                            yerr=np.asarray(b.sigmas)[e][sel], fmt="o",
                            ms=3.5, lw=1, color=color, label=f"obs {o}")
                if simple:
                    # scale the model curve into the data's units
                    gsel = group[e][sel]
                    Bg = B[gsel[0]] if gsel[0] >= 0 else 1.0
                    ax.plot(np.asarray(td), Bg * otraj[:, o], "-",
                            color=color, lw=1.2)
                else:
                    order = np.argsort(t_meas[e][sel])
                    ax.plot(t_meas[e][sel][order],
                            sim_scaled[e][sel][order], "-",
                            color=color, lw=1.2)
            sel_ss = valid & (obs_idx[e] == o) & is_ss[e]
            if sel_ss.any():
                ax.errorbar([t_meas[e][sel_ss][-1]] if not sel.any()
                            else [t_meas[e][sel].max()],
                            np.asarray(b.values)[e][sel_ss][:1],
                            yerr=np.asarray(b.sigmas)[e][sel_ss][:1],
                            fmt="s", ms=5, color=color)
        ax.set_title(f"experiment {e}")
        ax.set_xlabel("t")
        ax.legend(fontsize=7)
    for k in range(E, nrows * ncols):
        axes[k // ncols][k % ncols].set_axis_off()
    fig.tight_layout()
    return fig


def plot_waterfall(results, top: Optional[int] = None, ax=None):
    """Sorted-final-cost waterfall over a multi-start result.

    Accepts anything with ``.cost`` and ``.status`` arrays (the
    ``FitResult`` batches returned by ``multistart_fit`` /
    ``TwoPhaseDriver``). Non-converged members (status <= 0 or
    non-finite cost) are drawn greyed at the tail.
    """
    plt = _mpl()
    cost = np.asarray(results.cost, dtype=float).ravel()
    status = np.asarray(results.status).ravel()
    ok = (status > 0) & np.isfinite(cost)
    good = np.sort(cost[ok])
    bad_n = int((~ok).sum())
    if top is not None:
        good = good[:top]
    if ax is None:
        fig, ax = plt.subplots(figsize=(5, 3.2))
    else:
        fig = ax.figure
    ax.semilogy(np.arange(1, len(good) + 1), good, ".-", ms=3, lw=0.7,
                label=f"{len(good)} converged")
    if bad_n and top is None:
        ax.axvspan(len(good) + 0.5, len(good) + bad_n + 0.5, color="0.85",
                   label=f"{bad_n} failed")
    ax.set_xlabel("start (sorted)")
    ax.set_ylabel("final cost")
    ax.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_profiles(prof, names=None, level: float = 0.95, ncols: int = 3):
    """Profile-likelihood panels (one per profiled parameter).

    ``prof`` is a :class:`tpusysbio.fit.ProfileResult`. Each panel draws
    the re-optimized cost curve over the pinned value, the optimum
    (center) marker, and the likelihood-ratio threshold line
    ``cost* + 0.5·χ²₁(level)`` — the curve's crossings ARE the CI bounds
    (fit/profile.py:confidence_intervals); a curve that never reaches the
    line inside the window reads as non-identifiable at a glance.

    Returns the matplotlib Figure.
    """
    from scipy.stats import chi2

    plt = _mpl()
    values = np.asarray(prof.values, dtype=float)
    costs = np.asarray(prof.costs, dtype=float)
    n_p, n_grid = costs.shape
    center = n_grid // 2
    # LR reference = best cost actually seen (matches
    # fit/profile.py:confidence_intervals — warm-started re-fits can dip
    # marginally below the nominal optimum)
    ref_cost = min(float(prof.cost_opt), float(costs.min()))
    thr = ref_cost + 0.5 * chi2.ppf(level, df=1)
    ncols = min(ncols, n_p)
    nrows = (n_p + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(3.4 * ncols, 2.6 * nrows),
                             squeeze=False)
    for p in range(n_p):
        ax = axes[p // ncols][p % ncols]
        ax.plot(values[p], costs[p], ".-", ms=4, lw=0.9)
        ax.plot(values[p, center], costs[p, center], "o", ms=6,
                mfc="none", color="C1")
        ax.axhline(thr, lw=0.8, ls="--", color="0.4")
        name = (names[p] if names is not None
                else f"theta[{int(prof.idx[p])}]")
        ax.set_title(name, fontsize=9)
        ax.set_xlabel("pinned value (log space)", fontsize=8)
        ax.tick_params(labelsize=7)
    for q in range(n_p, nrows * ncols):
        axes[q // ncols][q % ncols].axis("off")
    axes[0][0].set_ylabel("profile cost", fontsize=8)
    fig.tight_layout()
    return fig
