"""Session server: the execute_request ABI over JSON lines (stdio or TCP).

Reference parity: runmat-core's `execute_request(ExecutionRequest) ->
ExecutionResponse` host ABI (crates/runmat-core/src/session/run.rs:330) plus
the wasm/TS host transport (crates/runmat-wasm/src/api/session.rs,
bindings/ts) and the remote-execution surface (runmat-server-client +
openapi/runmat-public.yaml). One protocol serves all hosts: each request is
one JSON object per line; each response is one JSON object per line.

Request:
  {"id": 1, "op": "execute", "source": "x = 1 + 1"}
  {"id": 2, "op": "workspace"}               — variable names + previews
  {"id": 3, "op": "get", "name": "x"}        — full value of one variable
  {"id": 4, "op": "accel_info"}              — provider telemetry snapshot
  {"id": 5, "op": "reset"}                   — clear the workspace
  {"id": 6, "op": "shutdown"}

Response:
  {"id": 1, "ok": true, "output": "...", "wall_ms": 1.2}
  {"id": 1, "ok": false, "error": {"identifier": "...", "message": "..."}}
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _preview(v) -> dict:
    from .values import MatArray, CellArray, StringArray, StructArray, class_name
    d: dict = {"class": class_name(v)}
    shape = getattr(v, "shape", None)
    if shape is not None:
        d["size"] = list(shape)
    if isinstance(v, MatArray) and not v.on_device and v.size <= 16 and \
            v.mclass != "char":
        h = v.host()
        d["value"] = np.real(h).astype(float).tolist()
    if isinstance(v, MatArray) and v.mclass == "char":
        d["value"] = v.to_str()
    if isinstance(v, MatArray):
        d["on_device"] = bool(v.on_device)
    return d


def _full_value(v) -> dict:
    from .values import MatArray, StringArray, class_name
    if isinstance(v, MatArray):
        h = v.host()
        out = {"class": class_name(v), "size": list(v.shape)}
        if v.mclass == "char":
            out["value"] = v.to_str()
        elif h.dtype.kind == "c":
            out["real"] = np.real(h).tolist()
            out["imag"] = np.imag(h).tolist()
        else:
            out["value"] = h.astype(float).tolist()
        return out
    if isinstance(v, StringArray):
        return {"class": "string", "size": list(v.shape),
                "value": [s for s in v.data.reshape(-1, order="F")]}
    return {"class": type(v).__name__}


def handle_request(sess, req: dict) -> dict:
    rid = req.get("id")
    op = req.get("op", "execute")
    try:
        if op == "execute":
            r = sess.execute(req.get("source", ""), req.get("name", "<remote>"))
            if r.error is not None:
                return {"id": rid, "ok": False,
                        "error": {"identifier": r.error.identifier,
                                  "message": r.error.message},
                        "output": r.output}
            return {"id": rid, "ok": True, "output": r.output,
                    "wall_ms": round(r.wall_time * 1000, 3)}
        if op == "workspace":
            names = sess.workspace_names()
            return {"id": rid, "ok": True,
                    "workspace": {n: _preview(sess.get(n)) for n in names}}
        if op == "get":
            v = sess.get(req.get("name", ""))
            if v is None:
                return {"id": rid, "ok": False,
                        "error": {"identifier": "RunMat:server:NoVariable",
                                  "message": f"No variable '{req.get('name')}'."}}
            return {"id": rid, "ok": True, "value": _full_value(v)}
        if op == "accel_info":
            from .accel import active_engine
            eng = active_engine()
            info = {"available": eng is not None}
            if eng is not None:
                info.update({"platform": eng.platform, "stats": dict(eng.stats)})
            return {"id": rid, "ok": True, "accel": info}
        if op == "fusion_plans":
            from .accel import active_engine
            eng = active_engine()
            return {"id": rid, "ok": True,
                    "plans": eng.fusion_snapshot() if eng is not None else []}
        if op == "reset":
            sess.clear()
            return {"id": rid, "ok": True}
        if op == "shutdown":
            return {"id": rid, "ok": True, "shutdown": True}
        return {"id": rid, "ok": False,
                "error": {"identifier": "RunMat:server:UnknownOp",
                          "message": f"Unknown op '{op}'."}}
    except Exception as e:  # never kill the server on a request
        ident = getattr(e, "identifier", "RunMat:server:InternalError")
        return {"id": rid, "ok": False,
                "error": {"identifier": ident, "message": str(e)}}


def serve_stdio(sess) -> int:
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            sys.stdout.write(json.dumps({
                "id": None, "ok": False,
                "error": {"identifier": "RunMat:server:BadJson",
                          "message": str(e)}}) + "\n")
            sys.stdout.flush()
            continue
        resp = handle_request(sess, req)
        sys.stdout.write(json.dumps(resp) + "\n")
        sys.stdout.flush()
        if resp.get("shutdown"):
            break
    return 0


def serve_tcp(sess, host: str, port: int) -> int:
    import socket
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    actual = srv.getsockname()[1]
    print(f"runmat-tpu server listening on {host}:{actual}", file=sys.stderr)
    while True:
        conn, _addr = srv.accept()
        f = conn.makefile("rw", encoding="utf-8")
        shutdown = False
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = handle_request(sess, req)
            f.write(json.dumps(resp) + "\n")
            f.flush()
            if resp.get("shutdown"):
                shutdown = True
                break
        conn.close()
        if shutdown:
            return 0
