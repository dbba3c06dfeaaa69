"""CLI smoke tests: recipe loading, train mode, infer mode (restore
latest + on-device decode), and config overrides."""

import glob
import json
import os
import subprocess
import sys

import pytest

from uasr.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["UASR_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "uasr.cli", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )


def test_all_recipes_parse():
    for path in glob.glob(os.path.join(REPO, "configs", "*.yaml")):
        cfg = load_config(path)
        assert cfg.name, path


@pytest.mark.slow
def test_cli_train_then_infer(tmp_path):
    model_dir = str(tmp_path / "exp")
    r = _run_cli(
        ["-c", "configs/synthetic_smoke.yaml", "--mode", "train",
         "--set", f"model_dir={model_dir}",
         "--set", "train.total_steps=40"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # metrics written
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        recs = [json.loads(ln) for ln in f]
    assert any(rec["tag"] == "train" for rec in recs)
    # checkpoint exists
    assert os.path.isdir(os.path.join(model_dir, "ckpt"))

    r2 = _run_cli(
        ["-c", "configs/synthetic_smoke.yaml", "--mode", "infer",
         "--set", f"model_dir={model_dir}"],
        tmp_path,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "PER=" in r2.stdout
    assert os.path.exists(os.path.join(model_dir, "hyp.txt"))
