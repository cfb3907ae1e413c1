"""YAML/JSON config loader + MeshConfig plumbing (SURVEY.md §5 config row).

The 5 canonical configs (BASELINE.json:7-11) ship as ``configs/*.yaml``;
``load_config`` parses them into frozen jit-static dataclasses, and the CLI
consumes them via ``multistart --config``.
"""

import json
import os

import numpy as np
import pytest

from tpusysbio.config import (FitConfig, MeshConfig, RunSpec, SolverConfig,
                              load_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")


def test_all_canonical_configs_load():
    names = sorted(os.listdir(CONFIG_DIR))
    assert {"mm3.yaml", "repressilator.yaml", "mapk22.yaml",
            "jakstat.yaml", "egfr.yaml"} <= set(names)
    for name in names:
        spec = load_config(os.path.join(CONFIG_DIR, name))
        assert isinstance(spec, RunSpec)
        assert isinstance(spec.solver, SolverConfig)
        assert isinstance(spec.fit, FitConfig)
        assert spec.run["starts"] >= 1
        # frozen + hashable: usable as a jit-static argument
        hash(spec.solver), hash(spec.fit)


def test_json_and_dict_sources(tmp_path):
    raw = {"model": "mm3",
           "solver": {"rtol": 1e-4, "linear_solver": "inv32"},
           "fit": {"max_iter": 7},
           "mesh": {"axis_names": ["starts"], "axis_sizes": [4]},
           "run": {"starts": 8}}
    spec = load_config(raw)
    assert spec.solver.rtol == 1e-4 and spec.fit.max_iter == 7
    # YAML lists coerce to tuples so the dataclasses stay hashable
    assert spec.mesh == MeshConfig(axis_names=("starts",), axis_sizes=(4,))
    path = tmp_path / "spec.json"
    path.write_text(json.dumps(raw))
    assert load_config(str(path)) == spec


def test_unknown_keys_fail_loudly():
    with pytest.raises(ValueError, match="unknown SolverConfig keys"):
        load_config({"model": "mm3", "solver": {"rtoll": 1e-4}})
    with pytest.raises(ValueError, match="unknown config sections"):
        load_config({"model": "mm3", "solvers": {}})
    with pytest.raises(ValueError, match="requires a 'model'"):
        load_config({"solver": {}})


def test_make_mesh_from_meshconfig():
    import jax

    from tpusysbio.utils import make_mesh

    mesh = make_mesh(config=MeshConfig(axis_names=("starts",),
                                       axis_sizes=(4,)))
    assert mesh.axis_names == ("starts",)
    assert mesh.devices.size == 4
    # explicit arg overrides the config size
    mesh2 = make_mesh(n_devices=2, config=MeshConfig())
    assert mesh2.devices.size == 2
    assert make_mesh().devices.size == len(jax.devices())
    with pytest.raises(ValueError, match="1-D"):
        make_mesh(config=MeshConfig(axis_names=("a", "b")))


def test_cli_multistart_with_config_file(tmp_path, capsys):
    """--config drives the two-phase pipeline end-to-end (tiny sizes)."""
    from tpusysbio import cli

    raw = {"model": "mm3",
           "solver": {"rtol": 1e-6, "atol": 1e-9, "max_steps": 512,
                      "linear_solver": "inv32", "sens_precision": "f32"},
           "screen_solver": {"rtol": 1e-3, "atol": 1e-6, "max_steps": 128,
                             "linear_solver": "inv32",
                             "mixed_precision": True},
           "fit": {"max_iter": 4, "eval_mode": "lockstep"},
           "screen_fit": {"max_iter": 2, "eval_mode": "lockstep",
                          "ftol": 1e-4, "xtol": 1e-4},
           "run": {"starts": 4, "top_k": 2, "iter_chunk": 4,
                   "spread": 0.3, "t_end": 10.0, "n_times": 6}}
    path = tmp_path / "tiny.json"
    path.write_text(json.dumps(raw))
    cli.main(["multistart", "--config", str(path)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["model"] == "mm3" and rec["starts"] == 4
    assert np.isfinite(rec["best_cost"])


def test_cli_config_rejects_unknown_run_key(tmp_path):
    from tpusysbio import cli

    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"model": "mm3",
                                "run": {"startz": 4}}))
    with pytest.raises(SystemExit, match="startz"):
        cli.main(["multistart", "--config", str(path)])
