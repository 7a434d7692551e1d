"""data.* dataset persistence: manifests, chunked payloads, transactions."""

import json

import numpy as np

from helpers import fails, run, run_get


def test_create_open_read(tmp_path):
    root = tmp_path / "ds1"
    v = run_get(
        "schema.arrays.temps.dtype = 'f64';"
        "schema.arrays.temps.shape = [4 3];"
        f"ds = data.create('{root}', schema);"
        f"ds2 = data.open('{root}');"
        "a = ds2.array('temps'); sh = a.shape; d = a.dtype;"
        "M = a.read(); ex = data.exists('" + str(root) + "');"
        "nx = data.exists('/nope');",
        "sh", "d", "M", "ex", "nx")
    assert v["sh"].host().tolist() == [[4.0, 3.0]]
    assert v["d"].to_str() == "f64"
    assert v["M"].host().shape == (4, 3)
    assert (v["M"].host() == 0).all()
    assert v["ex"].host()[0, 0] and not v["nx"].host()[0, 0]
    m = json.loads((root / "manifest.json").read_text())
    assert m["schema_version"] == 1 and "temps" in m["arrays"]


def test_transaction_write_commit(tmp_path):
    root = tmp_path / "ds2"
    v = run_get(
        "schema.arrays.x.shape = [2 2];"
        f"ds = data.create('{root}', schema);"
        "tx = ds.begin(); tx.write('x', [1 2; 3 4]); tx.set_attr('units', 'm');"
        "st0 = tx.status; tx.commit(); st = tx.status;"
        "ds.refresh(); M = ds.array('x').read(); ver = ds.version;"
        "u = ds.get_attr('units');",
        "st0", "st", "M", "ver", "u")
    assert v["st0"].to_str() == "open"
    assert v["st"].to_str() == "committed"
    assert v["M"].host().tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert v["ver"].host()[0, 0] == 1.0
    assert v["u"].to_str() == "m"


def test_transaction_abort_create_delete(tmp_path):
    root = tmp_path / "ds3"
    v = run_get(
        "schema.arrays.a.shape = [2 2];"
        f"ds = data.create('{root}', schema);"
        "tx = ds.begin(); tx.write('a', ones(2)); tx.abort(); st = tx.status;"
        "ds.refresh(); M = ds.array('a').read();"
        "tx2 = ds.begin();"
        "meta.shape = [3 1]; meta.dtype = 'f32';"
        "tx2.create_array('b', meta); tx2.delete_array('a'); tx2.commit();"
        "ds.refresh(); names = ds.arrays(); hb = ds.has_array('b');"
        "ha = ds.has_array('a');",
        "st", "M", "names", "hb", "ha")
    assert v["st"].to_str() == "aborted"
    assert (v["M"].host() == 0).all()      # aborted write never applied
    assert [e.to_str() for e in v["names"].data.reshape(-1)] == ["b"]
    assert v["hb"].host()[0, 0] and not v["ha"].host()[0, 0]


def test_resize_fill_chunked(tmp_path):
    root = tmp_path / "ds4"
    v = run_get(
        "schema.arrays.m.shape = [4 4]; schema.arrays.m.chunk_shape = [2 2];"
        f"ds = data.create('{root}', schema);"
        "tx = ds.begin(); tx.write('m', magic(4)); tx.commit();"
        "ds.refresh(); M = ds.array('m').read();"
        "tx2 = ds.begin(); tx2.resize('m', [2 6]); tx2.commit();"
        "ds.refresh(); R = ds.array('m').read();"
        "tx3 = ds.begin(); tx3.fill('m', 7); tx3.commit();"
        "ds.refresh(); F = ds.array('m').read();",
        "M", "R", "F")
    assert v["M"].host()[0, 0] == 16.0   # magic(4)
    # chunk files exist
    assert (root / "arrays" / "m" / "c_0_0.bin").exists()
    assert v["R"].host().shape == (2, 6)
    assert v["R"].host()[0, 0] == 16.0 and v["R"].host()[0, 5] == 0.0
    assert (v["F"].host() == 7).all()


def test_list_copy_move_inspect(tmp_path):
    v = run_get(
        "schema.arrays.z.shape = [1 1];"
        f"data.create('{tmp_path}/one', schema);"
        f"L = data.list('{tmp_path}');"
        f"data.copy('{tmp_path}/one', '{tmp_path}/two');"
        f"L2 = data.list('{tmp_path}');"
        f"info = data.inspect('{tmp_path}/two');"
        f"data.delete('{tmp_path}/one');"
        f"L3 = data.list('{tmp_path}');",
        "L", "L2", "info", "L3")
    assert [e.to_str() for e in v["L"].data.reshape(-1)] == ["one"]
    assert [e.to_str() for e in v["L2"].data.reshape(-1)] == ["one", "two"]
    assert [e.to_str() for e in v["L3"].data.reshape(-1)] == ["two"]
    assert "z" in v["info"].get_scalar_field("arrays").fields


def test_export_import_roundtrip(tmp_path):
    v = run_get(
        "s.x = [1 2; 3 4]; s.y = 5;"
        f"ds = data.import('{tmp_path}/imp', s);"
        "M = ds.array('x').read();"
        f"data.export('{tmp_path}/imp', '{tmp_path}/out.mat');"
        f"w = load('{tmp_path}/out.mat'); X = w.x;",
        "M", "X")
    assert v["M"].host().tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert v["X"].host().tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_snapshot(tmp_path):
    root = tmp_path / "snap"
    v = run_get(
        "schema.arrays.v.shape = [1 2];"
        f"ds = data.create('{root}', schema);"
        "p = ds.snapshot();", "p")
    snap = v["p"].to_str()
    assert (json.loads(open(snap + "/manifest.json").read())["schema_version"]) == 1
