"""Table batch 2: categorical, dictionary, timetable, conversions, grouping."""

import numpy as np

from helpers import run, run_get, val
from runmat_tpu.values import CellArray


def test_categorical_basic():
    v = run_get("c = categorical({'red', 'blue', 'red'});"
                "isc = iscategorical(c); cats = categories(c);"
                "m = c == 'red';", "isc", "cats", "m")
    assert v["isc"].host()[0, 0]
    assert [e.to_str() for e in v["cats"].data.reshape(-1)] == ["blue", "red"]
    assert v["m"].host().reshape(-1).tolist() == [True, False, True]


def test_ordinal_compare():
    v = run_get("o = ordinal([1 3 2]); q = isordinal(o); m = o >= 2;",
                "q", "m")
    assert v["q"].host()[0, 0]
    assert v["m"].host().reshape(-1).tolist() == [False, True, True]


def test_dictionary():
    v = run_get("d = dictionary([\"a\" \"b\"], [1 2]);"
                "x = d(\"a\"); d(\"c\") = 9; y = d(\"c\");"
                "n = d.numEntries; k = d.isKey(\"b\");", "x", "y", "n", "k")
    assert v["x"].host()[0, 0] == 1.0
    assert v["y"].host()[0, 0] == 9.0
    assert v["n"].host()[0, 0] == 3.0
    assert v["k"].host()[0, 0]


def test_timetable_roundtrip():
    v = run_get("tt = timetable((1:3)', [10;20;30], 'VariableNames', {'x'});"
                "q = istimetable(tt); t = timetable2table(tt);"
                "tt2 = table2timetable(t); q2 = istimetable(tt2);",
                "q", "q2", "t")
    assert v["q"].host()[0, 0] and v["q2"].host()[0, 0]
    assert v["t"].varnames == ["Time", "x"]


def test_cell2table_table2cell():
    v = run_get("t = cell2table({1, 'a'; 2, 'b'}, 'VariableNames', {'n', 's'});"
                "c = table2cell(t); h = height(t);", "c", "h")
    assert v["h"].host()[0, 0] == 2.0
    assert isinstance(v["c"], CellArray)
    assert v["c"].data[1, 0].host()[0, 0] == 2.0
    assert v["c"].data[0, 1].to_str() == "a"


def test_readcell(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("1,hello\n2,world\n")
    v = run_get(f"c = readcell('{p}');", "c")
    assert v["c"].data[0, 0].host()[0, 0] == 1.0
    assert v["c"].data[1, 1].to_str() == "world"


def test_groupsummary_table():
    v = run_get("t = table([1;1;2;2], [10;20;30;50], 'VariableNames', {'g','x'});"
                "s = groupsummary(t, 'g', 'mean');", "s")
    s = v["s"]
    assert "mean_x" in s.varnames
    col = s.cols[s.varnames.index("mean_x")].host().reshape(-1)
    assert col.tolist() == [15.0, 40.0]
    counts = s.cols[s.varnames.index("GroupCount")].host().reshape(-1)
    assert counts.tolist() == [2.0, 2.0]


def test_grpstats_array():
    v = run_get("m = grpstats([1 2 3 4]', [1 1 2 2]');", "m")
    assert v["m"].host().reshape(-1).tolist() == [1.5, 3.5]


def test_pivot():
    v = run_get("t = table({'a';'a';'b'}, {'x';'y';'x'},"
                "'VariableNames', {'r', 'c'});"
                "p = pivot(t, 'Rows', 'r', 'Columns', 'c');", "p")
    p = v["p"]
    assert p.varnames == ["r", "x", "y"]
    assert p.cols[1].host().reshape(-1).tolist() == [1.0, 1.0]
    assert p.cols[2].host().reshape(-1).tolist() == [1.0, 0.0]


def test_array_datastore():
    v = run_get("ds = arrayDatastore([1 2; 3 4]);"
                "a = ds.read(); h = ds.hasdata(); b = ds.read(); h2 = ds.hasdata();"
                "ds.reset(); all_ = ds.readall();", "a", "h", "b", "h2", "all_")
    assert v["a"].host().tolist() == [[1.0, 2.0]]
    assert v["h"].host()[0, 0]
    assert v["b"].host().tolist() == [[3.0, 4.0]]
    assert not v["h2"].host()[0, 0]
    assert v["all_"].shape == (2, 1)


def test_file_datastore(tmp_path):
    (tmp_path / "a.txt").write_text("A")
    (tmp_path / "b.txt").write_text("B")
    v = run_get(f"ds = fileDatastore('{tmp_path}/*.txt', 'ReadFcn', @fileread);"
                "x = ds.read(); y = ds.read();", "x", "y")
    assert v["x"].to_str() == "A"
    assert v["y"].to_str() == "B"


def test_detect_import_options():
    v = run_get("o = detectImportOptions('f.csv'); t = o.Type;", "t")
    assert v["t"].to_str() == "delimitedtext"


def test_sortrows_matrix_descend_stable():
    """ADVICE r3: plain-matrix sortrows 'descend' must keep tied rows in
    original order (MATLAB sortrows is stable both directions)."""
    v = val("x = sortrows([2 1; 1 9; 2 3; 2 7], 1, 'descend');")
    np.testing.assert_allclose(v, [[2, 1], [2, 3], [2, 7], [1, 9]])


def test_table_varnames_not_stale_through_feval():
    """ADVICE r3: caller arg-names from a previous RESOLVE_CALL must not
    leak into an indirect (feval/handle) table() call."""
    s = run("alpha = [1;2]; beta = [3;4]; t1 = table(alpha, beta); "
            "t2 = feval('table', [5;6]); "
            "h = @table; t3 = h([7;8]);")
    t1 = s.get("t1")
    assert t1.varnames == ["alpha", "beta"]
    # indirect calls carry no identifier names -> default VarN names
    assert s.get("t2").varnames == ["Var1"]
    assert s.get("t3").varnames == ["Var1"]
