"""Canonical model families (BASELINE.json:7-11; SURVEY.md §2 #17).

1. ``michaelis_menten``  — 3-state enzyme kinetics (config 1)
2. ``lotka_volterra``    — 2-state predator/prey with fitted initial
                           conditions (exercises dy0/dp sensitivities)
3. ``repressilator``     — 6-state genetic oscillator (config 2)
4. ``mapk_huang_ferrell``— 22-species / 30-reaction mass-action MAPK
                           cascade, stiff (config 3)
5. ``jak_stat``          — 4-state STAT5 model with a time-dependent input
                           and relative observables needing scale factors
                           (config 4)
6. ``egfr_like``         — generated ~100-species receptor-cascade
                           mass-action network at EGFR scale (config 5).
                           The reference mount is empty (SURVEY.md §0), so
                           this is an honest synthetic stand-in with the
                           right size/stiffness, built deterministically.

All RHS are pure ``(t, y, p) -> dy/dt`` jittable functions; golden
trajectories for tests come from SciPy on the *same* RHS (tests/golden).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from tpusysbio.model.core import OdeModel
from tpusysbio.model.massaction import NetworkBuilder

# Constructors are memoized: OdeModel is a frozen dataclass whose identity
# (including the rhs/y0/observables closures) keys every downstream
# jax.jit cache, so handing the SAME instance to repeat callers turns
# cross-module re-compiles into cache hits (a large fraction of test-suite
# and notebook wall time on this 1-core host). The models are immutable;
# variants go through dataclasses.replace as before.
_memo = functools.lru_cache(maxsize=None)


# ----------------------------------------------------------------------
# 1. Michaelis-Menten (3 states: S, C, P; params k1, km1, k2, E0)
# ----------------------------------------------------------------------

@_memo
def michaelis_menten() -> OdeModel:
    def rhs(t, y, p):
        del t
        s, c, prod = y
        k1, km1, k2, e0 = p
        e_free = e0 - c
        bind = k1 * e_free * s
        return jnp.stack([
            -bind + km1 * c,
            bind - (km1 + k2) * c,
            k2 * c,
        ])

    def y0(p):
        return jnp.array([1.0, 0.0, 0.0], dtype=p.dtype)

    def observables(y, p):
        return y  # all states observable

    return OdeModel(
        name="michaelis_menten", n_states=3, n_params=4, n_obs=3,
        rhs=rhs, y0=y0, observables=observables,
        param_names=("k1", "km1", "k2", "E0"),
        state_names=("S", "C", "P"))


MM_TRUE_PARAMS = np.array([10.0, 1.0, 1.5, 0.5])


# ----------------------------------------------------------------------
# 2. Lotka-Volterra (2 states; params a, b, c, d, x0, y0)
# ----------------------------------------------------------------------

@_memo
def lotka_volterra() -> OdeModel:
    def rhs(t, y, p):
        del t
        x, z = y
        a, b, c, d = p[:4]
        return jnp.stack([a * x - b * x * z, -c * z + d * x * z])

    def y0(p):
        return jnp.stack([p[4], p[5]])

    def observables(y, p):
        return y

    return OdeModel(
        name="lotka_volterra", n_states=2, n_params=6, n_obs=2,
        rhs=rhs, y0=y0, observables=observables,
        param_names=("a", "b", "c", "d", "x0", "z0"),
        state_names=("prey", "predator"))


LV_TRUE_PARAMS = np.array([1.5, 1.0, 3.0, 1.0, 1.0, 1.0])


# ----------------------------------------------------------------------
# 3. Repressilator (6 states; params alpha, alpha0, beta, n)
# ----------------------------------------------------------------------

@_memo
def repressilator() -> OdeModel:
    def rhs(t, y, p):
        del t
        m = y[:3]
        prot = y[3:]
        alpha, alpha0, beta, n = p
        repressor = jnp.roll(prot, 1)  # protein i-1 represses gene i
        dm = -m + alpha / (1.0 + repressor ** n) + alpha0
        dp = -beta * (prot - m)
        return jnp.concatenate([dm, dp])

    def y0(p):
        return jnp.array([0.2, 0.1, 0.3, 0.1, 0.4, 0.5], dtype=p.dtype)

    def observables(y, p):
        return y[3:]  # proteins (e.g. fluorescent reporters)

    return OdeModel(
        name="repressilator", n_states=6, n_params=4, n_obs=3,
        rhs=rhs, y0=y0, observables=observables,
        param_names=("alpha", "alpha0", "beta", "n"),
        state_names=("m1", "m2", "m3", "p1", "p2", "p3"))


REPRESSILATOR_TRUE_PARAMS = np.array([50.0, 1.0, 5.0, 2.0])


# ----------------------------------------------------------------------
# 4. Huang-Ferrell MAPK cascade: 22 species, 30 elementary reactions
# ----------------------------------------------------------------------

@_memo
def _mapk_network():
    b = NetworkBuilder()
    # ensure canonical species ordering
    for sp in ["E1", "E2", "KKK", "KKKs", "KK", "KKP", "KKPP", "KKPase",
               "K", "KP", "KPP", "KPase"]:
        b.species(sp)
    b.catalytic("E1", "KKK", "KKKs")          # MAPKKK activation
    b.catalytic("E2", "KKKs", "KKK")          # MAPKKK deactivation
    b.catalytic("KKKs", "KK", "KKP")          # MAPKK phosphorylation 1
    b.catalytic("KKPase", "KKP", "KK")
    b.catalytic("KKKs", "KKP", "KKPP")        # MAPKK phosphorylation 2
    b.catalytic("KKPase", "KKPP", "KKP")
    b.catalytic("KKPP", "K", "KP")            # MAPK phosphorylation 1
    b.catalytic("KPase", "KP", "K")
    b.catalytic("KKPP", "KP", "KPP")          # MAPK phosphorylation 2
    b.catalytic("KPase", "KPP", "KP")
    return b.build()


@_memo
def mapk_huang_ferrell() -> OdeModel:
    """Huang & Ferrell (1996)-style ultrasensitive MAPK cascade.

    22 species, 30 mass-action rate constants (a, d, k per catalytic
    mechanism). Stiff at the standard enzyme/substrate separations —
    BASELINE.json:9 benchmark config.
    """
    net = _mapk_network()
    rhs = net.rhs()
    rhs_jac = net.jac()
    rhs_sens = net.sens_rhs()
    n = net.n_species
    idx = {sp: i for i, sp in enumerate(net.species)}

    totals = {
        "E1": 3e-5, "E2": 3e-4, "KKK": 3e-3,
        "KK": 1.2, "KKPase": 3e-4,
        "K": 1.2, "KPase": 0.12,
    }

    def y0(p):
        y = np.zeros(n)
        for sp, v in totals.items():
            y[idx[sp]] = v
        return jnp.asarray(y, dtype=p.dtype)

    obs_rows = np.array([idx["KKKs"], idx["KKPP"], idx["KPP"]])

    def observables(y, p):
        return y[obs_rows]

    return OdeModel(
        name="mapk_huang_ferrell", n_states=n, n_params=net.n_reactions,
        n_obs=3, rhs=rhs, y0=y0, observables=observables,
        param_names=net.reaction_names, state_names=net.species,
        rhs_jac=rhs_jac, rhs_sens=rhs_sens,
        rhs_sens_dir=net.sens_rhs_dir())


def mapk_true_params() -> np.ndarray:
    """Plausible rate set: diffusion-limited-ish binding, moderate
    unbinding/catalysis — gives the stiff time-scale separation."""
    net = _mapk_network()
    p = np.zeros(net.n_reactions)
    for j, name in enumerate(net.reaction_names):
        if name.endswith(".bind"):
            p[j] = 1000.0
        elif name.endswith(".unbind"):
            p[j] = 150.0
        else:  # .cat
            p[j] = 150.0
    return p


# ----------------------------------------------------------------------
# 5. JAK-STAT (Swameye/Timmer-style, 4 states, driven input, relative obs)
# ----------------------------------------------------------------------

@_memo
def jak_stat() -> OdeModel:
    """STAT5 cycling model with a pulse input u(t) (EpoR activity).

    Params: k1..k4 kinetics (shared across experiments), amp/tau input
    shape (experiment-local in the ensemble config). Observables are
    *relative* (arbitrary units) — the scale-factor machinery
    (project/scale_factors.py) is exercised by this model
    (BASELINE.json:10).
    """

    def input_u(t, amp, tau):
        x = t / tau
        return amp * x * jnp.exp(1.0 - x)  # smooth pulse peaking at t=tau

    def rhs(t, y, p):
        x1, x2, x3, x4 = y
        k1, k2, k3, k4, amp, tau = p
        u = input_u(t, amp, tau)
        r1 = k1 * u * x1
        r2 = k2 * x2 * x2
        r3 = k3 * x3
        r4 = k4 * x4
        return jnp.stack([
            -r1 + 2.0 * r4,
            r1 - 2.0 * r2,
            r2 - r3,
            r3 - r4,
        ])

    def y0(p):
        return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=p.dtype)

    def observables(y, p):
        x1, x2, x3, _ = y
        return jnp.stack([
            x2 + 2.0 * x3,        # total phosphorylated STAT (relative)
            x1 + x2 + 2.0 * x3,   # total cytoplasmic STAT (relative)
        ])

    return OdeModel(
        name="jak_stat", n_states=4, n_params=6, n_obs=2,
        rhs=rhs, y0=y0, observables=observables,
        param_names=("k1", "k2", "k3", "k4", "amp", "tau"),
        state_names=("STAT", "pSTAT", "pSTAT_dimer", "nSTAT"))


JAKSTAT_TRUE_PARAMS = np.array([2.5, 4.0, 0.3, 0.6, 1.0, 6.0])


# ----------------------------------------------------------------------
# 6. EGFR-scale generated network (~100 species)
# ----------------------------------------------------------------------

@_memo
def _egfr_network(n_layers: int = 12):
    """Receptor-activated dual-phosphorylation cascade.

    Layer l: kinase (doubly-phosphorylated form of layer l-1; layer 0 uses
    the receptor module) drives A0->A1->A2; a per-layer phosphatase reverses.
    Each layer adds 8 species (A0, A1, A2, Pase, 4 complexes) and 12 rate
    constants; 12 layers + receptor module ≈ 100 species.
    """
    b = NetworkBuilder()
    b.species("L")      # ligand
    b.species("Rec")    # receptor
    b.reaction("L+Rec.bind", ["L", "Rec"], ["LR"])
    b.reaction("L+Rec.unbind", ["LR"], ["L", "Rec"])
    kinase = "LR"
    for l in range(n_layers):
        a0, a1, a2, pase = (f"A{l}_0", f"A{l}_1", f"A{l}_2", f"P{l}")
        b.catalytic(kinase, a0, a1)
        b.catalytic(kinase, a1, a2)
        b.catalytic(pase, a1, a0)
        b.catalytic(pase, a2, a1)
        kinase = a2
    return b.build(), n_layers


@_memo
def egfr_like(n_layers: int = 12) -> OdeModel:
    net, n_layers = _egfr_network(n_layers)
    rhs = net.rhs()
    rhs_jac = net.jac()
    rhs_sens = net.sens_rhs()
    n = net.n_species
    idx = {sp: i for i, sp in enumerate(net.species)}

    def y0(p):
        y = np.zeros(n)
        y[idx["L"]] = 0.5
        y[idx["Rec"]] = 0.2
        for l in range(n_layers):
            y[idx[f"A{l}_0"]] = 1.0
            y[idx[f"P{l}"]] = 0.3
        return jnp.asarray(y, dtype=p.dtype)

    obs_rows = np.array([idx[f"A{l}_2"] for l in range(n_layers)])

    def observables(y, p):
        return y[obs_rows]

    return OdeModel(
        name=f"egfr_like_{n}", n_states=n, n_params=net.n_reactions,
        n_obs=len(obs_rows), rhs=rhs, y0=y0, observables=observables,
        param_names=net.reaction_names, state_names=net.species,
        rhs_jac=rhs_jac, rhs_sens=rhs_sens,
        rhs_sens_dir=net.sens_rhs_dir())


def egfr_true_params(n_layers: int = 12, seed: int = 0) -> np.ndarray:
    net, _ = _egfr_network(n_layers)
    rng = np.random.default_rng(seed)
    p = np.zeros(net.n_reactions)
    for j, name in enumerate(net.reaction_names):
        if name.endswith(".bind"):
            p[j] = 10.0 ** rng.uniform(1.0, 2.5)
        elif name.endswith(".unbind"):
            p[j] = 10.0 ** rng.uniform(-0.5, 1.0)
        else:
            p[j] = 10.0 ** rng.uniform(-0.5, 1.5)
    return p
