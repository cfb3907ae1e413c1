"""CLI smoke tests (L6): subcommands drive the real stack end-to-end."""

import json
import os

import numpy as np

from tpusysbio import cli


def test_simulate_writes_npz(tmp_path, capsys):
    out = str(tmp_path / "traj.npz")
    cli.main(["simulate", "--model", "mm3", "--t-end", "5", "--n-times",
              "6", "--solver", "dopri5", "--out", out])
    captured = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(captured[-1])
    assert rec["status"] == 1
    data = np.load(out)
    assert data["ys"].shape == (6, 3)
    assert np.all(np.isfinite(data["ys"]))


def test_sens_reports_counters(capsys):
    cli.main(["sens", "--model", "lotka", "--t-end", "3", "--n-times", "4",
              "--solver", "bdf"])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[0])
    assert rec["status"] == 1
    assert rec["nlu"] > 0
    assert "sens shape (4, 2, 6)" in out


def test_multistart_two_phase_pipeline(tmp_path, capsys):
    """The end-to-end production pipeline (screen -> rank -> polish ->
    covariance report) through the CLI, tiny sizes (verdict L6 item)."""
    out = str(tmp_path / "fits.npz")
    cli.main(["multistart", "--model", "mm3", "--starts", "4",
              "--top-k", "2", "--screen-iters", "2", "--polish-iters",
              "4", "--iter-chunk", "4", "--t-end", "10", "--n-times",
              "6", "--spread", "0.3", "--linear-solver", "inv32",
              "--out", out, "--plot", str(tmp_path / "ms")])
    captured = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(captured[0])
    assert rec["model"] == "mm3" and rec["top_k"] == 2
    assert np.isfinite(rec["best_cost"])
    data = np.load(out)
    assert data["theta"].shape == (2, 4)
    assert data["param_sigma"].shape == (2, 4)
    assert np.all(np.isfinite(data["cost"]))
    for suffix in ("ms_waterfall.png", "ms_fit.png"):
        assert os.path.getsize(str(tmp_path / suffix)) > 2000


def test_multistart_config_yaml_drives_pipeline(tmp_path, capsys):
    """--config on a model whose _FREE_PARAMS entry is a prefix STRING
    (mapk22) — regression for the round-4 bug where the loaded RunSpec
    was clobbered by the free-params lookup and the YAML's solver/fit
    sections were silently ignored (caught by the first TPU CLI drive)."""
    cfg = tmp_path / "tiny_mapk.yaml"
    cfg.write_text("""
model: mapk22
solver:
  rtol: 1.0e-5
  atol: 1.0e-8
  max_steps: 512
  linear_solver: inv32
screen_solver:
  rtol: 1.0e-3
  atol: 1.0e-6
  max_steps: 128
  linear_solver: inv32
  mixed_precision: true
fit:
  max_iter: 4
  eval_mode: lockstep
screen_fit:
  max_iter: 2
  ftol: 1.0e-4
  xtol: 1.0e-4
  eval_mode: lockstep
run:
  starts: 4
  top_k: 2
  iter_chunk: 4
  spread: 0.3
  noise: 0.02
  seed: 0
  t_end: 40.0
  n_times: 6
""")
    cli.main(["multistart", "--config", str(cfg)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["model"] == "mapk22"
    assert rec["starts"] == 4 and rec["top_k"] == 2
    assert rec["free_params"] == 12          # the prefix-string free set
    assert np.isfinite(rec["best_cost"])


def test_profile_cli_reports_cis(tmp_path, capsys):
    """profile subcommand: fit + profile every free parameter, CI table,
    .npz curves (fit/profile.py through the CLI)."""
    out = str(tmp_path / "prof.npz")
    cli.main(["profile", "--model", "mm3", "--n-points", "3", "--span",
              "0.5", "--t-end", "10", "--n-times", "6", "--fit-iters",
              "60", "--linear-solver", "inv32", "--out", out,
              "--plot", str(tmp_path / "pl")])
    captured = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(captured[0])
    assert rec["model"] == "mm3" and rec["grid_points"] == 7
    assert np.isfinite(rec["fit_cost"])
    data = np.load(out)
    assert data["costs"].shape == (4, 7)
    # the center column is the unconstrained optimum; warm-started refits
    # may dip marginally below it (the fit terminates at ftol), never far
    assert np.all(np.isfinite(data["costs"]))
    center = data["costs"][:, 3]
    assert np.all(data["costs"].min(axis=1) >= center * (1 - 1e-4))
    assert os.path.exists(str(tmp_path / "pl_profiles.png"))
    assert data["ci"].shape == (4, 2)


def test_sample_cli_reports_posterior(tmp_path, capsys):
    """sample subcommand: fit + ensemble MCMC, posterior table, .npz
    chain (fit/mcmc.py through the CLI)."""
    out = str(tmp_path / "chain.npz")
    cli.main(["sample", "--model", "mm3", "--walkers", "16", "--steps",
              "60", "--burn", "20", "--t-end", "10", "--n-times", "6",
              "--fit-iters", "60", "--linear-solver", "inv32",
              "--out", out])
    captured = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(captured[0])
    assert rec["model"] == "mm3" and rec["walkers"] == 16
    assert rec["kept_samples"] == (60 - 20) * 16
    assert 0.0 < rec["mean_acceptance"] < 1.0
    assert np.isfinite(rec["fit_cost"])
    data = np.load(out)
    assert data["chain"].shape == (60, 16, 4)
    assert np.all(np.isfinite(data["log_prob"]))
