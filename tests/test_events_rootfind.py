"""State-dependent event root-finding (EventSpec) vs SciPy solve_ivp.

Spec: ``scipy/integrate/_ivp/ivp.py:29-158`` — sign-change detection per
accepted step honoring ``direction``, root location on the dense output,
``terminal`` stop, t_events/y_events reporting. Parity bar: event times to
1e-6 (SURVEY.md §4 accuracy bar). The vmapped heterogeneous-threshold test
is the TPU-native capability the reference (serial solve_ivp) lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from tpusysbio.config import SolverConfig
from tpusysbio.solvers import (
    STATUS_DONE,
    STATUS_EVENT,
    EventSpec,
    bdf_solve,
)

CFG = SolverConfig(rtol=1e-8, atol=1e-10)


def _decay(k=0.7):
    return lambda t, y: -k * y


def test_threshold_crossing_vs_scipy_and_analytic():
    """Falling crossing of y = 0.4 on exponential decay (exact root known)."""
    k = 0.7
    f = _decay(k)
    y0 = jnp.array([1.0])
    t_eval = jnp.linspace(0.0, 5.0, 11)
    ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - 0.4]))
    res = jax.jit(lambda: bdf_solve(f, (0.0, 5.0), y0, t_eval,
                                    config=CFG, events=ev))()
    t_exact = np.log(1.0 / 0.4) / k

    assert int(res.event_count[0]) == 1
    assert abs(float(res.event_t[0, 0]) - t_exact) < 1e-6
    # recorded state is on the threshold
    assert abs(float(res.event_y[0, 0, 0]) - 0.4) < 1e-6
    # unfilled slots stay +inf
    assert np.isinf(np.asarray(res.event_t)[0, 1:]).all()
    # integration ran to t_bound (non-terminal)
    assert int(res.status) == STATUS_DONE

    def g(t, y):
        return y[0] - 0.4

    sp = solve_ivp(lambda t, y: -k * y, (0.0, 5.0), [1.0], method="BDF",
                   rtol=1e-8, atol=1e-10, events=g)
    assert abs(float(res.event_t[0, 0]) - sp.t_events[0][0]) < 1e-6


def test_terminal_event_stops_at_root():
    k = 0.7
    f = _decay(k)
    y0 = jnp.array([1.0])
    t_eval = jnp.linspace(0.0, 5.0, 21)
    ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - 0.4]),
                   terminal=(True,))
    res = jax.jit(lambda: bdf_solve(f, (0.0, 5.0), y0, t_eval,
                                    config=CFG, events=ev))()
    t_exact = np.log(1.0 / 0.4) / k

    assert int(res.status) == STATUS_EVENT
    assert bool(res.success)  # terminal stop is a success (scipy status=1)
    assert abs(float(res.t_final) - t_exact) < 1e-6
    # y_final is the interpolated state AT the event time
    assert abs(float(res.y_final[0, 0]) - 0.4) < 1e-6
    # t_eval points past the event stay unfilled (zeros)
    te = np.asarray(t_eval)
    ys = np.asarray(res.ys)[:, 0]
    filled = te <= float(res.t_final)
    assert np.allclose(ys[filled][1:],
                       np.exp(-k * te[filled][1:]), rtol=1e-6)
    assert np.all(ys[~filled] == 0.0)


def test_direction_semantics_oscillator():
    """y'' = -y  =>  y = sin(t); sin(t) = 0.5 rising at pi/6 + 2pi k,
    falling at 5pi/6 + 2pi k (threshold 0.5 avoids the g(t0) = 0 corner,
    where scipy too fires an event at t0)."""
    def f(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = jnp.array([0.0, 1.0])
    t_eval = jnp.linspace(0.0, 7.0, 8)
    # tighter tolerance: BDF order <= 5 phase error over 7 time units
    cfg = SolverConfig(rtol=1e-10, atol=1e-12)

    def run(direction):
        ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - 0.5]),
                       direction=(direction,))
        return jax.jit(lambda: bdf_solve(f, (0.0, 7.0), y0, t_eval,
                                         config=cfg, events=ev))()

    res_down = run(-1)   # falling: 5pi/6 only (in (0, 7))
    assert int(res_down.event_count[0]) == 1
    assert abs(float(res_down.event_t[0, 0]) - 5 * np.pi / 6) < 1e-6

    res_up = run(+1)     # rising: pi/6 and 13pi/6
    assert int(res_up.event_count[0]) == 2
    assert np.allclose(np.asarray(res_up.event_t)[0, :2],
                       [np.pi / 6, 13 * np.pi / 6], atol=1e-6)

    res_any = run(0)     # either: all three
    assert int(res_any.event_count[0]) == 3
    assert np.allclose(np.asarray(res_any.event_t)[0, :3],
                       [np.pi / 6, 5 * np.pi / 6, 13 * np.pi / 6],
                       atol=1e-6)


def test_multiple_occurrences_and_capacity():
    def f(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = jnp.array([0.0, 1.0])
    t_eval = jnp.linspace(0.0, 20.0, 5)
    cfg = SolverConfig(rtol=1e-10, atol=1e-12)
    # sin(t) = 0.5 crossings in (0, 20): pi/6, 5pi/6, 13pi/6, 17pi/6,
    # 25pi/6, 29pi/6, 37pi/6 — 7 total; capacity 4 stores the first 4
    ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - 0.5]), capacity=4)
    res = jax.jit(lambda: bdf_solve(f, (0.0, 20.0), y0, t_eval,
                                    config=cfg, events=ev))()
    assert int(res.event_count[0]) == 7   # counted beyond capacity
    assert np.allclose(np.asarray(res.event_t)[0],
                       np.pi / 6 * np.array([1, 5, 13, 17]), atol=1e-5)


def test_two_events_terminal_discards_later():
    """scipy handle_events: when a terminal event fires, occurrences after
    the termination time are discarded, ones at/before it are kept."""
    k = 0.7
    f = _decay(k)
    y0 = jnp.array([1.0])
    t_eval = jnp.linspace(0.0, 5.0, 11)
    # event 0: y = 0.6 (non-terminal, earlier); event 1: y = 0.5 terminal;
    # y = 0.4 would fire later in the same run but must be discarded
    ev = EventSpec(
        fn=lambda t, y: jnp.array([y[0] - 0.6, y[0] - 0.5, y[0] - 0.4]),
        terminal=(False, True, False))
    res = jax.jit(lambda: bdf_solve(f, (0.0, 5.0), y0, t_eval,
                                    config=CFG, events=ev))()
    t6 = np.log(1.0 / 0.6) / k
    t5 = np.log(1.0 / 0.5) / k
    assert int(res.status) == STATUS_EVENT
    assert abs(float(res.t_final) - t5) < 1e-6
    assert int(res.event_count[0]) == 1
    assert abs(float(res.event_t[0, 0]) - t6) < 1e-6
    assert int(res.event_count[1]) == 1
    assert int(res.event_count[2]) == 0   # after the terminal stop

    def g6(t, y):
        return y[0] - 0.6

    def g5(t, y):
        return y[0] - 0.5

    g5.terminal = True
    sp = solve_ivp(lambda t, y: -k * y, (0.0, 5.0), [1.0], method="BDF",
                   rtol=1e-8, atol=1e-10, events=(g6, g5))
    assert abs(float(res.event_t[0, 0]) - sp.t_events[0][0]) < 1e-6
    assert abs(float(res.t_final) - sp.t_events[1][0]) < 1e-6


def test_vmapped_heterogeneous_thresholds():
    """Each ensemble member has its own threshold (closure over a vmapped
    parameter) — per-member event times match the analytic roots."""
    k = 0.7
    y0 = jnp.array([1.0])
    t_eval = jnp.linspace(0.0, 5.0, 5)
    thresholds = jnp.array([0.2, 0.35, 0.5, 0.65])

    def integrate(c):
        ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - c]),
                       terminal=(True,))
        res = bdf_solve(_decay(k), (0.0, 5.0), y0, t_eval,
                        config=CFG, events=ev)
        return res.event_t[0, 0], res.status

    t_ev, status = jax.jit(jax.vmap(integrate))(thresholds)
    expect = np.log(1.0 / np.asarray(thresholds)) / k
    assert np.all(np.asarray(status) == STATUS_EVENT)
    assert np.allclose(np.asarray(t_ev), expect, atol=1e-6)


def test_no_event_within_span():
    """An event that never fires: empty buffers, normal completion."""
    f = _decay(2.0)
    y0 = jnp.array([1.0])
    t_eval = jnp.linspace(0.0, 1.0, 3)
    ev = EventSpec(fn=lambda t, y: jnp.array([y[0] - 2.0]))  # y < 1 always
    res = jax.jit(lambda: bdf_solve(f, (0.0, 1.0), y0, t_eval,
                                    config=CFG, events=ev))()
    assert int(res.status) == STATUS_DONE
    assert int(res.event_count[0]) == 0
    assert np.isinf(np.asarray(res.event_t)).all()


def test_model_simulate_events_kwarg():
    """OdeModel.simulate(events=...) routes the spec to the BDF solver."""
    from tpusysbio.model import library

    model = library.michaelis_menten()
    p = jnp.asarray([2.0, 1.0, 1.5, 1.0])  # k1, km1, k2, E0
    ev = EventSpec(fn=lambda t, y: jnp.array([y[-1] - 0.1]))
    res = jax.jit(lambda pp: model.simulate(
        pp, (0.0, 10.0), jnp.linspace(0.0, 10.0, 5), config=CFG,
        events=ev))(p)
    # product P rises through 0.1 exactly once on this config
    assert int(res.event_count[0]) >= 1
