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


def test_search_path_function_and_class(tmp_path):
    (tmp_path / "dbl.m").write_text("function y = dbl(x)\ny = 2 * x;\nend\n")
    (tmp_path / "Q.m").write_text(
        "classdef Q\nproperties\nw = 0\nend\nmethods\nfunction o = Q(a)\n"
        "o.w = a;\nend\nend\nend\n")
    from runmat_tpu.session import Session
    s = Session(accelerate=False)
    s.run_source(f"addpath('{tmp_path}'); a = dbl(21); q = Q(3); b = q.w;", "t")
    assert float(s.get("a").host()[0, 0]) == 42.0
    assert float(s.get("b").host()[0, 0]) == 3.0


def test_workspace_replay(tmp_path):
    from runmat_tpu.session import Session
    p = str(tmp_path / "ws.mat")
    s = Session(accelerate=False)
    s.run_source("a = magic(3); b = 'txt';", "t")
    s.export_workspace(p)
    s2 = Session(accelerate=False)
    s2.import_workspace(p)
    assert float(s2.get("a").host()[1, 1]) == 5.0
    assert s2.get("b").to_str() == "txt"
