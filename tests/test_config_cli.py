"""Config system + CLI subcommands + telemetry.

≙ reference runmat-config (loader/schema/env precedence), runmat-logging
spans, ProviderTelemetry snapshot, CLI root commands."""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["RUNMAT_TPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "runmat_tpu.cli", *args],
                       capture_output=True, text=True, cwd=cwd or "/root/repo",
                       env=env, timeout=120)
    return r


def test_version_info():
    assert "runmat-tpu" in run_cli("version").stdout
    out = run_cli("info").stdout
    assert "builtins:" in out and int(out.split("builtins:")[1].split()[0]) > 400


def test_check_good_and_bad():
    with tempfile.TemporaryDirectory() as d:
        good = os.path.join(d, "g.m")
        bad = os.path.join(d, "b.m")
        open(good, "w").write("x = 1 + 2;\n")
        open(bad, "w").write("x = 1 +;\n")
        r = run_cli("check", good)
        assert "OK" in r.stdout and r.returncode == 0
        r = run_cli("check", bad)
        assert "parseError" in r.stdout and r.returncode == 1


def test_accel_info_json():
    r = run_cli("accel-info", "--json")
    data = json.loads(r.stdout)
    assert data["provider"]["platform"] == "cpu"
    assert "dispatches" in data["provider"]


def test_config_file_and_env_precedence(tmp_path):
    cfg = tmp_path / "runmat.toml"
    cfg.write_text("[accelerate]\noffload_threshold = 999\n")
    from runmat_tpu.config import load
    old = os.environ.pop("RUNMAT_TPU_OFFLOAD_THRESHOLD", None)
    try:
        c = load(start=str(tmp_path))
        assert c.get("accelerate", "offload_threshold") == 999
        os.environ["RUNMAT_TPU_OFFLOAD_THRESHOLD"] = "123"
        c = load(start=str(tmp_path))
        assert c.get("accelerate", "offload_threshold") == 123
        assert "RUNMAT_TPU_OFFLOAD_THRESHOLD" in c.overrides
    finally:
        os.environ.pop("RUNMAT_TPU_OFFLOAD_THRESHOLD", None)
        if old is not None:
            os.environ["RUNMAT_TPU_OFFLOAD_THRESHOLD"] = old


def test_config_generate(tmp_path):
    from runmat_tpu.config import generate_default
    p = generate_default(str(tmp_path / "runmat.toml"))
    txt = open(p).read()
    assert "[accelerate]" in txt and "[logging]" in txt


def test_telemetry_spans():
    from runmat_tpu import telemetry
    from runmat_tpu.session import Session
    telemetry.enable(True)
    try:
        s = Session(accelerate=False)
        s.run_source("x = 1 + 1;", "t")
        names = [sp["span"] for sp in telemetry.spans()]
        assert "runtime.lower" in names and "runtime.execute" in names
        snap = telemetry.snapshot(s)
        assert snap["session"]["workspace_vars"] >= 1
    finally:
        telemetry.enable(False)


def test_cli_eval_and_script():
    r = run_cli("-e", "disp(6 * 7)")
    assert "42" in r.stdout
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.m")
        open(p, "w").write("fprintf('%d\\n', sum(1:10));\n")
        assert "55" in run_cli(p).stdout
