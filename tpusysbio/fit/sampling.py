"""Start-point samplers in log-parameter space (SURVEY.md §2 #16).

Latin hypercube (stratified, one stratum per start per dimension) and plain
uniform sampling over log-space boxes, driven by JAX PRNG keys — seeded and
deterministic, so multi-start runs are bitwise reproducible (the
determinism "sanitizer" lane, SURVEY.md §5).
"""

from __future__ import annotations

import jax



def uniform_starts(key: jax.Array, n: int, lower: jax.Array,
                   upper: jax.Array) -> jax.Array:
    """n starts uniform in the box [lower, upper] (log space), (n, G)."""
    G = lower.shape[0]
    u = jax.random.uniform(key, (n, G), dtype=lower.dtype)
    return lower + (upper - lower) * u


def latin_hypercube(key: jax.Array, n: int, lower: jax.Array,
                    upper: jax.Array) -> jax.Array:
    """Latin hypercube sample of n starts in [lower, upper], (n, G)."""
    G = lower.shape[0]
    k_perm, k_u = jax.random.split(key)
    perm_keys = jax.random.split(k_perm, G)
    # one independent permutation of strata per dimension
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(perm_keys)  # (G, n)
    u = jax.random.uniform(k_u, (n, G), dtype=lower.dtype)
    strata = (perms.T.astype(lower.dtype) + u) / n  # (n, G) in [0, 1)
    return lower + (upper - lower) * strata
