"""Mass-action reaction-network engine, matmul-shaped for the MXU.

Systems-biology pathway models (the reference's domain) are overwhelmingly
mass-action networks. Instead of hand-writing each RHS as scalar Python (the
reference style, SURVEY.md §2 #1), a network is two small static integer
matrices:

- ``reactants`` (n_reactions, n_species): stoichiometric exponents of the
  rate monomials,
- ``stoich``    (n_species, n_reactions): net stoichiometry.

The RHS is then ``S @ (k * prod(y ** R))`` — a product reduction plus one
matmul, which XLA tiles onto the MXU and which batches perfectly under
``vmap`` over ensembles. ``jax.jacfwd``/``jax.jvp`` through it give exact
Jacobians/sensitivities with no symbolic codegen (BASELINE.json:5).

Used to build the Huang–Ferrell MAPK cascade (22 species / 30 elementary
reactions, BASELINE.json:9) and the ~100-state EGFR-scale network
(BASELINE.json:11) in ``model/library.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MassActionNetwork:
    """Static description of a mass-action network.

    ``reactants[j, i]`` = exponent of species i in reaction j's rate law;
    ``stoich[i, j]``    = net change of species i in reaction j.
    Rate constant of reaction j is ``p[j]`` (one parameter per reaction).
    """

    species: Tuple[str, ...]
    reaction_names: Tuple[str, ...]
    reactants: np.ndarray   # (n_reactions, n_species) small ints
    stoich: np.ndarray      # (n_species, n_reactions) small ints

    @property
    def n_species(self) -> int:
        return len(self.species)

    @property
    def n_reactions(self) -> int:
        return self.reactants.shape[0]

    def _terms(self):
        R = jnp.asarray(self.reactants)
        S = jnp.asarray(self.stoich)

        def term_of(y):
            yb = jnp.broadcast_to(y[None, :], R.shape)
            one = jnp.ones((), y.dtype)
            return jnp.where(R == 0, one,
                             jnp.where(R == 1, yb,
                                       jnp.where(R == 2, yb * yb,
                                                 yb * yb * yb)))

        def dterm_of(y):
            # d/dy_i of y_i^R: 0, 1, 2y, 3y^2
            yb = jnp.broadcast_to(y[None, :], R.shape)
            zero = jnp.zeros((), y.dtype)
            one = jnp.ones((), y.dtype)
            return jnp.where(R == 0, zero,
                             jnp.where(R == 1, one,
                                       jnp.where(R == 2, 2.0 * yb,
                                                 3.0 * yb * yb)))

        return R, S, term_of, dterm_of

    def rate_grad(self) -> Callable:
        """``(y, p) -> (monomials, M)`` with ``M[j, i] = ∂rate_j/∂y_i``.

        The exclusive product over the other species uses forward/backward
        cumulative products — exact at zero concentrations (no division).
        Everything downstream (J, Fp, sensitivity RHS) is then matmuls:

            J = S @ M                 (state Jacobian)
            Fp = S * monomials[None]  (∂f/∂p, one column per rate constant)
            dSens/dt = S @ (M @ Sens + diag(monomials))

        This replaces the per-column jvp evaluation of the sensitivity RHS
        (~2m RHS-equivalents per call) with two MXU matmuls — the
        mass-action fast path (docs/PERFORMANCE.md).
        """
        R, S, term_of, dterm_of = self._terms()

        def grads(y, p):
            term = term_of(y)                       # (rx, n)
            dterm = dterm_of(y)
            n_sp = term.shape[1]
            ones = jnp.ones((term.shape[0], 1), y.dtype)
            fwd = jnp.concatenate(
                [ones, jnp.cumprod(term, axis=1)[:, :-1]], axis=1)
            bwd = jnp.concatenate(
                [jnp.cumprod(term[:, ::-1], axis=1)[:, ::-1][:, 1:], ones],
                axis=1)
            prod_exc = fwd * bwd                    # Π_{l≠i} term[j,l]
            mono = jnp.prod(term, axis=1)           # (rx,)
            M = p[:, None] * dterm * prod_exc       # (rx, n)
            return mono, M

        return grads

    def jac(self) -> Callable:
        """Closed-form state Jacobian ``(t, y, p) -> (n, n)``."""
        _, S, _, _ = self._terms()
        grads = self.rate_grad()

        def j(t, y, p):
            del t
            _, M = grads(y, p.astype(y.dtype))
            return S.astype(y.dtype) @ M

        return j

    def sens_rhs(self) -> Callable:
        """Closed-form forward-sensitivity RHS ``(t, y, Sens, p) -> (n, m)``
        for sensitivities w.r.t. ALL rate constants (m = n_reactions)."""
        _, S, _, _ = self._terms()
        grads = self.rate_grad()

        def fs(t, y, Sens, p):
            del t
            pc = p.astype(y.dtype)
            mono, M = grads(y, pc)
            inner = M @ Sens + jnp.diag(mono)       # (rx, m)
            return S.astype(y.dtype) @ inner

        return fs

    def sens_rhs_dir(self) -> Callable:
        """Closed-form REDUCED forward-sensitivity RHS
        ``(t, y, Sens, p, C) -> (n, G)`` propagating sensitivities along
        the parameter directions ``C`` (m, G) — i.e. w.r.t. G fit
        parameters θ with ``C = dp/dθ`` — instead of all m rate constants.

        Since ``∂rate_j/∂p_j = mono_j`` (rates are ``p_j·mono_j``), the
        direction-projected parameter term is just ``mono[:, None] * C``:
        the column block shrinks from m to G with zero extra cost. This is
        what makes the ~150-rate EGFR config fit-scale on TPU (13 columns
        instead of 147) — SURVEY.md §3.3's staggered corrector with only
        the columns the optimizer actually uses."""
        _, S, _, _ = self._terms()
        grads = self.rate_grad()

        def fs_dir(t, y, Sens, p, C):
            del t
            pc = p.astype(y.dtype)
            mono, M = grads(y, pc)
            inner = M @ Sens + mono[:, None] * C.astype(y.dtype)  # (rx, G)
            return S.astype(y.dtype) @ inner

        return fs_dir

    def rhs(self) -> Callable:
        """Return ``f(t, y, p) -> dy/dt`` (p = rate constants, one per
        reaction).

        Exponents are tiny static integers, so the monomials use branchless
        repeated multiplication instead of ``jnp.power`` — TPU lowers pow
        to ``exp(e·log(b))``, which turns the mass-action convention
        ``0^0 = 1`` into NaN (and costs transcendentals). Elementary
        reactions never exceed exponent 2; 3 is allowed for safety.
        """
        max_exp = int(self.reactants.max()) if self.reactants.size else 0
        if max_exp > 3:
            raise ValueError("reaction order > 3 not supported")
        R = jnp.asarray(self.reactants)
        S = jnp.asarray(self.stoich)

        def f(t, y, p):
            del t
            yb = jnp.broadcast_to(y[None, :], R.shape)
            one = jnp.ones((), y.dtype)
            term = jnp.where(R == 0, one,
                             jnp.where(R == 1, yb,
                                       jnp.where(R == 2, yb * yb,
                                                 yb * yb * yb)))
            rates = p * jnp.prod(term, axis=1)
            return S.astype(y.dtype) @ rates.astype(y.dtype)

        return f


class NetworkBuilder:
    """Incrementally assemble a MassActionNetwork by named reactions."""

    def __init__(self):
        self._species: List[str] = []
        self._index = {}
        self._rows_R: List[dict] = []
        self._rows_S: List[dict] = []
        self._names: List[str] = []

    def species(self, name: str) -> int:
        if name not in self._index:
            self._index[name] = len(self._species)
            self._species.append(name)
        return self._index[name]

    def reaction(self, name: str, reactants: Sequence[str],
                 products: Sequence[str]):
        """Add elementary reaction ``sum(reactants) -> sum(products)`` with
        mass-action rate ``k * prod(reactant concentrations)``; repeated
        names give stoichiometry/exponent 2, etc."""
        r_cnt: dict = {}
        s_cnt: dict = {}
        for sp in reactants:
            i = self.species(sp)
            r_cnt[i] = r_cnt.get(i, 0) + 1
            s_cnt[i] = s_cnt.get(i, 0) - 1
        for sp in products:
            i = self.species(sp)
            s_cnt[i] = s_cnt.get(i, 0) + 1
        self._rows_R.append(r_cnt)
        self._rows_S.append(s_cnt)
        self._names.append(name)

    def catalytic(self, enzyme: str, substrate: str, product: str,
                  tag: str = ""):
        """Michaelis-Menten mechanism as 3 elementary reactions
        (bind / unbind / catalyze) — 3 rate constants in order (a, d, k)."""
        complex_name = f"{enzyme}:{substrate}"
        tag = tag or f"{enzyme}+{substrate}"
        self.reaction(f"{tag}.bind", [enzyme, substrate], [complex_name])
        self.reaction(f"{tag}.unbind", [complex_name], [enzyme, substrate])
        self.reaction(f"{tag}.cat", [complex_name], [enzyme, product])

    def build(self) -> MassActionNetwork:
        n_sp = len(self._species)
        n_rx = len(self._rows_R)
        R = np.zeros((n_rx, n_sp), dtype=np.int32)
        S = np.zeros((n_sp, n_rx), dtype=np.int32)
        for j, (rc, sc) in enumerate(zip(self._rows_R, self._rows_S)):
            for i, v in rc.items():
                R[j, i] = v
            for i, v in sc.items():
                S[i, j] = v
        return MassActionNetwork(
            species=tuple(self._species), reaction_names=tuple(self._names),
            reactants=R, stoich=S)
