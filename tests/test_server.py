"""Session server: execute_request ABI over JSON lines (in-process + via a
spawned `serve` subprocess, the transport the TS bindings use)."""

import json
import os
import subprocess
import sys

from helpers import run
from runmat_tpu.server import handle_request
from runmat_tpu.session import Session


def _sess():
    return Session(accelerate=False)


def test_execute_ok_and_error():
    s = _sess()
    r = handle_request(s, {"id": 1, "op": "execute", "source": "x = 2 + 3; disp(x)"})
    assert r["ok"] and "5" in r["output"]
    r2 = handle_request(s, {"id": 2, "op": "execute", "source": "undefined_fn_xyz()"})
    assert not r2["ok"]
    assert "identifier" in r2["error"]


def test_workspace_and_get():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute", "source": "a = [1 2; 3 4]; msg = 'hi';"})
    ws = handle_request(s, {"id": 2, "op": "workspace"})["workspace"]
    assert ws["a"]["class"] == "double" and ws["a"]["size"] == [2, 2]
    assert ws["msg"]["value"] == "hi"
    v = handle_request(s, {"id": 3, "op": "get", "name": "a"})["value"]
    assert v["value"] == [[1.0, 2.0], [3.0, 4.0]]
    missing = handle_request(s, {"id": 4, "op": "get", "name": "zz"})
    assert not missing["ok"]


def test_reset_accel_info_unknown():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute", "source": "q = 1;"})
    handle_request(s, {"id": 2, "op": "reset"})
    assert handle_request(s, {"id": 3, "op": "workspace"})["workspace"] == {}
    info = handle_request(s, {"id": 4, "op": "accel_info"})["accel"]
    assert "available" in info
    bad = handle_request(s, {"id": 5, "op": "nope"})
    assert not bad["ok"]


def test_serve_subprocess_roundtrip():
    env = dict(os.environ)
    env["RUNMAT_TPU_PLATFORM"] = "cpu"
    p = subprocess.Popen(
        [sys.executable, "-m", "runmat_tpu.cli", "serve"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    reqs = [
        {"id": 1, "op": "execute", "source": "x = sum(1:10);"},
        {"id": 2, "op": "get", "name": "x"},
        {"id": 3, "op": "shutdown"},
    ]
    out, _ = p.communicate("\n".join(json.dumps(r) for r in reqs) + "\n",
                           timeout=120)
    lines = [json.loads(l) for l in out.strip().split("\n")]
    assert lines[0]["ok"]
    assert lines[1]["value"]["value"] == [[55.0]]
    assert lines[2]["shutdown"]


def test_fusion_plans_op():
    s = Session(accelerate=True)
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "x = gpuArray(ones(64)); y = gather(sum(sin(x) + 1, 'all'));"})
    r = handle_request(s, {"id": 2, "op": "fusion_plans"})
    assert r["ok"]
    assert isinstance(r["plans"], list)
    if r["plans"]:
        assert "ops" in r["plans"][0] and "kind" in r["plans"][0]
