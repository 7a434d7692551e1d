"""FEA evidence/governance chain (≙ scripts/fea/{governance,
thermo_artifacts}: content-hashed artifacts, trust chain, replay
validation)."""

import json

import numpy as np

from helpers import run


def test_evidence_write_and_verify_roundtrip(tmp_path):
    ev = tmp_path / "run1.evidence.json"
    s = run("g = struct('box', [1 1 1], 'resolution', 3); "
            "m = fea.model(g); st = fea.study(m, 'static'); "
            "r = fea.run(st); "
            f"e = fea.evidence(r, '{ev}'); h = e.hash; "
            f"v = fea.verifyEvidence('{ev}'); ok = v.ok;")
    assert ev.exists()
    doc = json.loads(ev.read_text())
    assert doc["schema"] == "runmat-tpu.fea.evidence/1"
    assert doc["physics"] in ("static", "linear_static")
    assert "displacement" in doc["fields"]
    assert len(doc["chain"]["hash"]) == 64
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0]), \
        "replay must reproduce the recorded digests"


def test_evidence_tamper_detection(tmp_path):
    ev = tmp_path / "run2.evidence.json"
    s = run("g = struct('box', [1 1 1], 'resolution', 3); "
            "m = fea.model(g); st = fea.study(m, 'thermal'); "
            "r = fea.run(st); "
            f"e = fea.evidence(r, '{ev}');")
    doc = json.loads(ev.read_text())
    doc["fields"]["temperature"]["digest"] = "0" * 64
    ev.write_text(json.dumps(doc, indent=1))
    s2 = run(f"v = fea.verifyEvidence('{ev}'); ok = v.ok; "
             "np = numel(v.problems);")
    assert not bool(np.asarray(s2.get("ok").host()).reshape(-1)[0])
    assert float(np.asarray(s2.get("np").host()).reshape(-1)[0]) >= 2
    # both the chain hash (artifact modified) and the field digest fail


def test_evidence_chain_links(tmp_path):
    e1 = tmp_path / "a.json"
    e2 = tmp_path / "b.json"
    run("g = struct('box', [1 1 1], 'resolution', 3); "
        "m = fea.model(g); st = fea.study(m, 'static'); r = fea.run(st); "
        f"fea.evidence(r, '{e1}'); fea.evidence(r, '{e2}');")
    d1 = json.loads(e1.read_text())
    d2 = json.loads(e2.read_text())
    assert d2["chain"]["parent"] == d1["chain"]["hash"]


def test_evidence_verifies_nondefault_material(tmp_path):
    ev = tmp_path / "alu.evidence.json"
    s = run("g = struct('box', [1 1 1], 'resolution', 3); "
            "mat = fea.material('E', 70e9, 'nu', 0.33); "
            "m = fea.model(g, mat); st = fea.study(m, 'static'); "
            "r = fea.run(st); "
            f"fea.evidence(r, '{ev}'); v = fea.verifyEvidence('{ev}'); "
            "ok = v.ok;")
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0]), \
        "non-default material must verify against its own evidence"
