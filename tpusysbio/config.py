"""Frozen, hashable configuration dataclasses (jit-static).

The reference passed solver tolerances as plain kwargs into
``scipy.integrate.odeint`` / ``scipy.optimize.leastsq``
(SURVEY.md §5 "Config / flag system"). Here configs are frozen dataclasses so
they can be closed over by ``jax.jit`` as static values with no global flag
state. Defaults mirror the SciPy cores the reference delegates to:

- BDF: MAX_ORDER=5, NEWTON_MAXITER=4, MIN_FACTOR=0.2, MAX_FACTOR=10
  (``scipy/integrate/_ivp/bdf.py:12-16``),
- leastsq tolerances ftol=xtol=1.49012e-8 (``scipy/optimize/_minpack_py.py:292``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Configuration for the stiff/non-stiff integrators.

    ``max_steps`` bounds the ``lax.while_loop`` so a vmapped batch with one
    pathological member always terminates (SURVEY.md §7 hard part 1); a
    member that exhausts the budget is flagged ``STATUS_MAX_STEPS`` and
    masked out downstream, never aborting the batch (SURVEY.md §5 failure
    detection).
    """

    rtol: float = 1e-6
    atol: float = 1e-9
    max_steps: int = 4096
    max_order: int = 5            # BDF/NDF maximum order (bdf.py:12)
    newton_maxiter: int = 4       # modified-Newton cap (bdf.py:14)
    min_factor: float = 0.2       # step shrink floor (bdf.py:15)
    max_factor: float = 10.0      # step growth cap (bdf.py:16)
    safety: float = 0.9
    first_step: Optional[float] = None  # None -> Hairer heuristic (common.py:68)
    max_step: float = float("inf")
    # Include sensitivity columns in the local error norm (CVODES errconS).
    sens_error_control: bool = False
    # Mixed-precision hot loop (docs/PERFORMANCE.md roadmap #1): evaluate
    # the RHS/JVP columns, the Jacobian, and the Newton linear solves in
    # f32 while keeping state accumulation, step control, and error norms
    # in f64. VALIDITY: mass-action RHS have large cancelling fluxes, so
    # f32 evaluation noise is ~1e-7x the flux magnitude — adequate down to
    # rtol~1e-4 (verified: identical step counts and errors vs f64 on
    # stiff MAPK-22 at rtol 1e-3/1e-4) but NOT for rtol=1e-6 reference
    # accuracy. Intended use: the screening phase of two-phase multi-start
    # (fit.multistart_two_phase) — screen wide in mixed/loose, polish the
    # top fraction in f64/tight.
    mixed_precision: bool = False
    # Precision of the SENSITIVITY columns only ('full' or 'f32'): the
    # state trajectory keeps full f64 error control, while the 30+ jvp
    # columns — the bulk of the per-step work — evaluate and solve in f32.
    # LM only needs ~1e-3-relative Jacobians (quasi-Newton tolerance), so
    # this preserves rtol=1e-6 trajectories AND fit optima while moving
    # ~90% of the FLOPs to fast f32. Gate: sensitivity tests at 'full';
    # fit-optimum tests at 'f32'.
    sens_precision: str = "full"
    # 'lu'    : pivoted LU factor + triangular solves (pure JAX, f64-safe on TPU)
    # 'inv'   : explicit inverse via LU, each Newton solve becomes one matmul
    #           (best lockstep-vmap throughput on the MXU)
    # 'inv32' : f32 LU inverse + two f64 Newton-Schulz refinements — the
    #           O(n^3) elimination runs in fast f32, solves stay f64 matmuls
    # 'pallas': Pallas VMEM-resident batched factor+solve kernel
    # 'banded': banded LU (no pivoting) exploiting a (kl, ku) Jacobian
    #           bandwidth (chain-structured pathways) — O(n·b²) instead
    #           of O(n³); requires ``jac_bandwidth``
    linear_solver: str = "inv"
    # (kl, ku) bandwidth of the state Jacobian, for linear_solver='banded'
    jac_bandwidth: tuple = None
    # Evaluate the dense-output interpolation CORRECTION (on top of the
    # exact D[0] anchor) in f32 even for f64 state parts: costs
    # ~eps32·‖correction‖ ≈ 1e-7 relative on output trajectories — well
    # inside the rtol=1e-6 bar — and removes the largest per-accepted-step
    # block of emulated-f64 MACs on TPU (+5% tight-path throughput).
    # OFF by default because finite-DIFFERENCE consumers of the outputs
    # (dsim/dp ≈ Δy/1e-6) amplify the f32 noise by 1/eps; in-solver
    # forward sensitivities — the framework's own Jacobian source — are
    # unaffected either way.
    dense_f32: bool = False
    # Dense-output windowing (0 = off): per accepted step, evaluate the
    # interpolant only on a ``dense_window``-point dynamic slice of
    # ``t_eval`` instead of all T points, and write back just that slice.
    # Correct by construction: the step size is additionally capped at
    # the (dense_window-1)-th next ``t_eval`` point, so a step can never
    # cover more points than the slice holds. For dense output grids
    # (T ≫ typical points-per-step — the benchmark contract's 41-point
    # grid sees ≲1 point/step) this removes the dominant per-step
    # dense-output cost: the (T × order × n·k) interpolation einsum and
    # the full-accumulator rewrite shrink by T/dense_window with bitwise
    # identical outputs as long as the cap never binds (it binds only
    # when a single step would skip ≥ dense_window grid points, which
    # costs extra steps, never correctness). BDF only; other steppers
    # evaluate the full grid.
    dense_window: int = 0
    # In-jit assertion lane (SURVEY.md §5 sanitizers): emit
    # ``checkify.check`` assertions (finite RHS at init, positive step)
    # inside the steppers. STATIC flag — zero cost when off. Wrap the
    # entry point with ``tpusysbio.utils.checked`` to raise on failure
    # (production runs instead mask failed members via status codes).
    debug_checks: bool = False

    def __post_init__(self):
        if self.linear_solver not in ("lu", "inv", "inv32", "pallas",
                                      "banded"):
            raise ValueError(f"unknown linear_solver {self.linear_solver!r}")
        if self.linear_solver == "banded" and self.jac_bandwidth is None:
            raise ValueError("linear_solver='banded' requires "
                             "jac_bandwidth=(kl, ku)")
        if self.sens_precision not in ("full", "f32"):
            raise ValueError(
                f"unknown sens_precision {self.sens_precision!r}")
        if self.dense_window != 0 and self.dense_window < 2:
            raise ValueError("dense_window must be 0 (off) or >= 2")


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Levenberg–Marquardt / trust-region fit configuration.

    Tolerance semantics follow ``scipy.optimize.least_squares``
    (``scipy/optimize/_lsq/common.py:705`` termination): relative cost
    reduction (ftol), relative step size (xtol), scaled gradient norm (gtol).
    """

    ftol: float = 1e-8
    xtol: float = 1e-8
    gtol: float = 1e-8
    max_iter: int = 100
    # initial LM damping and its adaptation bounds
    lam0: float = 1e-3
    lam_min: float = 1e-12
    lam_max: float = 1e12
    # Trial-point evaluation strategy:
    # 'economical': residual-only trial integration; Jacobian recomputed
    #   only on acceptance (fewest evaluations — best for single fits).
    # 'lockstep': evaluate residual+Jacobian together at every trial. Under
    #   vmap, lax.cond runs both branches anyway, so the economical mode
    #   pays trial + sens integrations per iteration; lockstep pays only
    #   the sens one — ~2x faster for ensembles whose integration time is
    #   step-bound rather than column-bound.
    eval_mode: str = "economical"

    def __post_init__(self):
        if self.eval_mode not in ("economical", "lockstep"):
            raise ValueError(f"unknown eval_mode {self.eval_mode!r}")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-start ensemble parallelism.

    The only mesh axis is ``starts`` — multi-start members shard across
    chips; integration itself is collective-free lockstep (SURVEY.md
    §2c/§3.4). Consumed by ``tpusysbio.utils.make_mesh(config=...)`` and
    produced by the YAML/JSON loader below.
    """

    axis_names: Tuple[str, ...] = ("starts",)
    axis_sizes: Optional[Tuple[int, ...]] = None  # None -> all local devices


# ---------------------------------------------------------------------------
# YAML/JSON config loader (SURVEY.md §5 "Config / flag system": frozen
# jit-static dataclasses, YAML/JSON loadable for the 5 canonical configs).
# ``configs/`` at the repo root ships one file per BASELINE.json:7-11 config;
# the CLI consumes them via ``tpusysbio multistart --config file.yaml``.

@dataclasses.dataclass(frozen=True)
class RunSpec:
    """One declarative fit run: model + solver/fit configs + run settings.

    ``run`` holds the driver-level knobs (starts, top_k, iteration splits,
    data synthesis settings) — plain values, validated by the consumer.
    """

    model: str
    solver: SolverConfig = SolverConfig()
    screen_solver: Optional[SolverConfig] = None
    fit: FitConfig = FitConfig()
    screen_fit: Optional[FitConfig] = None
    mesh: Optional[MeshConfig] = None
    run: dict = dataclasses.field(default_factory=dict)


def _build(cls, d: dict):
    """Construct a frozen config dataclass from a mapping, rejecting
    unknown keys (a typo in a YAML file must fail loudly, not silently
    fall back to a default) and coercing list-valued fields to tuples
    (YAML has no tuple literal; the dataclasses are hashable/jit-static
    only with tuples)."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(
            f"unknown {cls.__name__} keys: {sorted(unknown)}; "
            f"valid keys: {sorted(names)}")
    coerced = {k: tuple(v) if isinstance(v, list) else v
               for k, v in d.items()}
    return cls(**coerced)


def load_config(source) -> RunSpec:
    """Load a ``RunSpec`` from a YAML/JSON file path or an already-parsed
    mapping.

    File format (sections all optional except ``model``)::

        model: mapk22
        solver:        {rtol: 1.0e-6, linear_solver: pallas}
        screen_solver: {rtol: 1.0e-3, mixed_precision: true}
        fit:           {max_iter: 20, eval_mode: lockstep}
        screen_fit:    {max_iter: 8, ftol: 1.0e-4}
        mesh:          {axis_names: [starts]}
        run:           {starts: 1024, top_k: 64, seed: 0}

    JSON files (same structure) load through ``json`` so the loader has
    zero hard dependency on PyYAML; ``.yaml``/``.yml`` files require it.
    """
    if isinstance(source, dict):
        raw = dict(source)
    else:
        path = str(source)
        with open(path) as fh:
            text = fh.read()
        if path.endswith((".yaml", ".yml")):
            import yaml

            raw = yaml.safe_load(text)
        else:
            import json

            raw = json.loads(text)
    if not isinstance(raw, dict):
        raise ValueError(f"config must be a mapping, got {type(raw)}")
    known = {"model", "solver", "screen_solver", "fit", "screen_fit",
             "mesh", "run"}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config sections: {sorted(unknown)}; "
                         f"valid: {sorted(known)}")
    if "model" not in raw:
        raise ValueError("config requires a 'model' entry")

    def section(key, cls):
        if key not in raw or raw[key] is None:
            return None
        return _build(cls, dict(raw[key]))

    return RunSpec(
        model=str(raw["model"]),
        solver=section("solver", SolverConfig) or SolverConfig(),
        screen_solver=section("screen_solver", SolverConfig),
        fit=section("fit", FitConfig) or FitConfig(),
        screen_fit=section("screen_fit", FitConfig),
        mesh=section("mesh", MeshConfig),
        run=dict(raw.get("run") or {}))
