"""Driver-gate regression tests for ``__graft_entry__``.

The driver validates multi-chip sharding by calling
``dryrun_multichip(8)`` in an environment with ONE real device; the
function must self-provision a virtual 8-device CPU mesh (VERDICT.md
round-1 item 1). Under the test conftest 8 fake devices already exist,
so the in-process path runs; the subprocess respawn path is covered by
a direct unit check of the dispatch condition.
"""

import jax

import __graft_entry__ as graft


def test_dryrun_multichip_in_process():
    assert len(jax.devices()) >= 8, "conftest must provision 8 fake devices"
    graft.dryrun_multichip(8)


def test_dryrun_dispatches_to_respawn_when_short(monkeypatch):
    calls = {}

    def fake_respawn(n):
        calls["n"] = n

    monkeypatch.setattr(graft, "_respawn_on_virtual_cpu_mesh", fake_respawn)
    monkeypatch.setattr(graft.jax, "devices", lambda: [object()])
    graft.dryrun_multichip(8)
    assert calls["n"] == 8
