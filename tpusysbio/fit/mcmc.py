"""Affine-invariant ensemble MCMC (emcee-style stretch move), TPU-native.

Posterior uncertainty is the standard follow-up to a multi-start fit in
this domain (the reference's users run emcee on the same least-squares
objective; profile likelihood — fit/profile.py — is the frequentist
counterpart). The Goodman & Weare (2010) stretch move is the natural
TPU algorithm: W walkers advance in lockstep, each step is two
half-ensemble updates of pure elementwise math plus one vmapped
log-posterior evaluation — no per-walker control flow, so the whole
chain is one ``lax.scan`` inside one jit, and the walker axis vmaps
exactly like the multi-start axis.

Contract notes:
- ``log_prob_fn(theta) -> scalar`` must be JAX-traceable. For a
  least-squares Project, ``lambda th: -proj.cost(th)`` is the Gaussian
  log-likelihood up to a constant; add log-priors as extra terms.
- Non-finite log-probs are handled emcee-style: a walker proposing into
  a -inf/NaN region simply rejects (never poisons the ensemble).
- Determinism: one PRNG key in, bitwise-reproducible chain out (the
  determinism "sanitizer" lane, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class MCMCResult(NamedTuple):
    """``chain``: (n_kept, W, G) post-thinning walker positions;
    ``log_prob``: (n_kept, W); ``acceptance``: (W,) per-walker accepted
    fraction over ALL proposals (thinned or not)."""

    chain: jax.Array
    log_prob: jax.Array
    acceptance: jax.Array

    def flat(self, burn: int = 0):
        """(n_kept - burn) · W samples, (S, G) — emcee's flatchain."""
        return self.chain[burn:].reshape(-1, self.chain.shape[-1])


def _stretch_half(key, x_move, lp_move, x_other, log_prob_v, a, dtype):
    """One stretch-move update of ``x_move`` using partners drawn from
    ``x_other`` (Goodman & Weare 2010 eq. 7; emcee's default move).

    z ~ g(z) ∝ 1/√z on [1/a, a]  (inverse-CDF: z = ((a-1)u + 1)² / a)
    y = x_j + z (x_k − x_j);  accept with prob min(1, z^{G-1} e^{Δlp}).
    """
    W, G = x_move.shape
    k_pick, k_z, k_u = jax.random.split(key, 3)
    j = jax.random.randint(k_pick, (W,), 0, x_other.shape[0])
    partners = x_other[j]
    u = jax.random.uniform(k_z, (W,), dtype=dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    y = partners + z[:, None] * (x_move - partners)
    lp_y = log_prob_v(y)
    log_ratio = (G - 1) * jnp.log(z) + lp_y - lp_move
    # emcee semantics: a non-finite proposal log-prob rejects outright
    # (and a walker currently AT -inf accepts any finite proposal)
    log_ratio = jnp.where(jnp.isnan(lp_y), -jnp.inf, log_ratio)
    accept = jnp.log(jax.random.uniform(k_u, (W,), dtype=dtype)) < log_ratio
    x_new = jnp.where(accept[:, None], y, x_move)
    lp_new = jnp.where(accept, lp_y, lp_move)
    return x_new, lp_new, accept


def ensemble_sample(
    log_prob_fn: Callable,
    x0: jax.Array,
    n_steps: int,
    key: jax.Array,
    a: float = 2.0,
    thin: int = 1,
    log_prob_v: Optional[Callable] = None,
) -> MCMCResult:
    """Run W walkers for ``n_steps`` stretch-move sweeps from ``x0`` (W, G).

    One sweep = two half-ensemble updates (the standard red/black split:
    each half's partners come from the OTHER, already-updated half —
    preserves detailed balance for the ensemble). W must be even and
    should be ≥ 2·G (emcee guidance). ``thin`` keeps every thin-th sweep.

    ``log_prob_v`` optionally overrides the vmapped batch evaluator
    ``(W_half, G) -> (W_half,)`` — pass a ``shard_map``-wrapped version
    to shard walkers across a mesh (the axis is embarrassingly parallel;
    partners are gathered host-free since both halves are replicated
    inputs of each call).
    """
    x0 = jnp.asarray(x0)
    W, G = x0.shape
    if W % 2:
        raise ValueError("number of walkers must be even")
    if W < 4:
        raise ValueError("need at least 4 walkers (2 per half)")
    if n_steps % thin:
        raise ValueError("thin must divide n_steps")
    dtype = x0.dtype
    lpv = log_prob_v if log_prob_v is not None else jax.vmap(log_prob_fn)
    half = W // 2

    def sweep(carry, k):
        x, lp = carry
        k1, k2 = jax.random.split(k)
        xa, lpa, acc_a = _stretch_half(k1, x[:half], lp[:half], x[half:],
                                       lpv, a, dtype)
        xb, lpb, acc_b = _stretch_half(k2, x[half:], lp[half:], xa,
                                       lpv, a, dtype)
        x_new = jnp.concatenate([xa, xb])
        lp_new = jnp.concatenate([lpa, lpb])
        acc = jnp.concatenate([acc_a, acc_b])
        return (x_new, lp_new), (x_new, lp_new, acc)

    def run(x0, key):
        lp0 = lpv(x0)
        keys = jax.random.split(key, n_steps)
        (_, _), (xs, lps, accs) = lax.scan(sweep, (x0, lp0), keys)
        return (xs[thin - 1::thin], lps[thin - 1::thin],
                jnp.mean(accs.astype(dtype), axis=0))

    xs, lps, acc = jax.jit(run)(x0, key)
    return MCMCResult(chain=xs, log_prob=lps, acceptance=acc)


def autocorr_time(chain: jax.Array, c: float = 5.0) -> jax.Array:
    """Integrated autocorrelation time per parameter (emcee's
    ``autocorr`` method: FFT autocorrelation averaged over walkers,
    Sokal's self-consistent window M ≥ c·τ). ``chain``: (S, W, G);
    returns (G,). Host-side numpy (diagnostics, not a hot path)."""
    import numpy as np

    x = np.asarray(chain, np.float64)
    S, W, G = x.shape
    taus = np.empty(G)
    for g in range(G):
        d = x[:, :, g] - x[:, :, g].mean(axis=0, keepdims=True)
        n = 1 << (2 * S - 1).bit_length()
        f = np.fft.fft(d, n=n, axis=0)
        acf = np.fft.ifft(f * np.conj(f), axis=0)[:S].real
        acf = acf.mean(axis=1)
        acf /= acf[0] if acf[0] > 0 else 1.0
        tau_cum = 2.0 * np.cumsum(acf) - 1.0
        window = np.arange(len(tau_cum)) >= c * tau_cum
        idx = np.argmax(window) if window.any() else len(tau_cum) - 1
        taus[g] = tau_cum[idx]
    return taus
