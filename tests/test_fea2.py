"""fea.* study-document API, geometry.*, finance/signal/image leaf fns,
subsref/subsasgn function forms."""

import numpy as np

from helpers import run_get


def _study_src(physics="linear_static", res=3):
    return (
        "geom.box = [1 0.2 0.2]; geom.resolution = %d;"
        "mat = fea.material('E', 210e9, 'nu', 0.3);"
        "bc = fea.boundaryCondition('fixed', 'x==0');"
        "model = fea.model(geom, mat, bc);"
        "study = fea.study(model, '%s');" % (res, physics))


def test_fea_author_validate_plan():
    v = run_get(_study_src() +
                "val = fea.validate(study); ok = val.valid;"
                "p = fea.plan(study); ne = p.numElements; nd = p.dofs;",
                "ok", "ne", "nd")
    assert v["ok"].host()[0, 0]
    assert v["ne"].host()[0, 0] > 0
    assert v["nd"].host()[0, 0] > 0


def test_fea_run_linear_static_and_field():
    v = run_get(_study_src() +
                "r = fea.run(study);"
                "u = fea.field(r, 'displacement');"
                "mx = max(abs(u(:)));"
                "rid = r.runId;", "u", "mx", "rid")
    u = v["u"].host()
    assert u.shape[1] == 3
    assert v["mx"].host()[0, 0] > 0      # the beam deflects
    assert len(v["rid"].to_str()) == 12


def test_fea_run_modal_thermal():
    v = run_get(_study_src("modal", 2) + "r = fea.run(study);"
                "f = fea.field(r, 'frequencies');", "f")
    f = v["f"].host().reshape(-1)
    assert (f >= 0).all() and f.size == 4
    v2 = run_get(_study_src("thermal", 2) + "r = fea.run(study);"
                 "T = fea.field(r, 'temperature');", "T")
    assert np.isfinite(v2["T"].host()).all()


def test_fea_sweep_compare_trends():
    v = run_get(_study_src("linear_static", 2) +
                "sw = fea.sweep(study, study); rs = fea.run(sw);"
                "runs = rs.runs; a = runs{1}.runId; b = runs{2}.runId;"
                "cmp = fea.compare(a, b); same = cmp.samePhysics;"
                "tr = fea.trends(5);", "same", "tr")
    assert v["same"].host()[0, 0]
    assert v["tr"].shape[0] >= 2


def test_fea_load_document(tmp_path):
    p = tmp_path / "beam.fea"
    p.write_text('{"box": [1, 0.1, 0.1], "resolution": 2, '
                 '"physics": "linear_static"}')
    v = run_get(f"study = fea.load('{p}'); ph = study.physics;", "ph")
    assert v["ph"].to_str() == "linear_static"


def test_geometry_namespace(tmp_path):
    p = tmp_path / "g.json"
    p.write_text('{"box": [2, 1, 1], "resolution": 2}')
    v = run_get(f"g = geometry.load('{p}'); info = geometry.inspect(g);"
                "vol = info.volume; regions = geometry.listRegions(g);"
                "m = geometry.meshes(g); n = size(m.nodes, 1);",
                "vol", "regions", "n")
    assert v["vol"].host()[0, 0] == 2.0
    assert v["regions"].size == 1
    assert v["n"].host()[0, 0] == 27.0    # 3^3 grid


def test_blsimpv_macd():
    v = run_get("p = blsprice(100, 100, 0.05, 1, 0.2);"
                "iv = blsimpv(100, 100, 0.05, 1, p);"
                "[line, sig] = macd(cumsum(ones(1, 50)));",
                "iv", "line", "sig")
    assert abs(v["iv"].host()[0, 0] - 0.2) < 1e-4
    assert v["line"].size == 50 and v["sig"].size == 50


def test_lassoglm():
    v = run_get("rng(0); X = [randn(40,1); randn(40,1)+3];"
                "y = [zeros(40,1); ones(40,1)];"
                "B = lassoglm([X randn(80,1)], y, 'Lambda', 0.001);", "B")
    b = v["B"].host().reshape(-1)
    assert b[0] > 0.5          # informative feature kept
    assert abs(b[1]) < 0.3     # noise feature shrunk


def test_imfinfo(tmp_path):
    p = tmp_path / "img.png"
    v = run_get(f"imwrite(uint8(zeros(4, 6, 3)), '{p}');"
                f"info = imfinfo('{p}'); w = info.Width; h = info.Height;",
                "w", "h")
    assert v["w"].host()[0, 0] == 6.0
    assert v["h"].host()[0, 0] == 4.0


def test_zplane_data():
    v = run_get("[z, p] = zplane([1 -0.5], [1 0.25]);", "z", "p")
    assert abs(v["z"].host()[0, 0] - 0.5) < 1e-12
    assert abs(v["p"].host()[0, 0] + 0.25) < 1e-12


def test_subsref_subsasgn():
    v = run_get("A = [1 2; 3 4];"
                "x = subsref(A, substruct('()', {1, 2}));"
                "B = subsasgn(A, substruct('()', {2, 2}), 9);"
                "s.f.g = 5; y = subsref(s, substruct('.', 'f', '.', 'g'));"
                "s2 = subsasgn(s, substruct('.', 'f', '.', 'g'), 7);"
                "z = s2.f.g;", "x", "B", "y", "z")
    assert v["x"].host()[0, 0] == 2.0
    assert v["B"].host()[1, 1] == 9.0
    assert v["y"].host()[0, 0] == 5.0
    assert v["z"].host()[0, 0] == 7.0
