"""Dictionary R2023b API (configureDictionary/insert/lookup/entries/types),
scatteredInterpolant, and zpk models.

Reference parity: runmat-runtime/src/builtins/table/ dictionary builtins and
control tf family (tf.plus/tf.mtimes/... dotted registrations).
"""

import numpy as np

from helpers import run, run_get


def test_configure_insert_lookup():
    out = run_get(
        "d = configureDictionary('string','double');"
        "d = insert(d,'a',1); d = insert(d,[\"b\" \"c\"],[2 3]);"
        "n = numEntries(d); x = lookup(d,'b');"
        "y = lookup(d,'zz','FallbackValue',-1);",
        "n", "x", "y")
    assert float(out["n"].host()) == 3.0
    assert float(out["x"].host()) == 2.0
    assert float(out["y"].host()) == -1.0


def test_lookup_vectorized():
    out = run_get(
        "d = dictionary([\"a\" \"b\"],[1 2]); v = lookup(d,[\"b\" \"a\"]);",
        "v")
    assert list(np.asarray(out["v"].host()).reshape(-1)) == [2.0, 1.0]


def test_lookup_missing_raises():
    from runmat_tpu.errors import MatError
    import pytest
    with pytest.raises(MatError):
        run("d = dictionary('a',1); lookup(d,'nope');")


def test_types_and_isconfigured():
    out = run_get(
        "d = dictionary('a',1); [kt,vt] = types(d);"
        "c1 = isConfigured(d); c0 = isConfigured(dictionary());",
        "kt", "vt", "c1", "c0")
    assert out["kt"].data.reshape(-1)[0] == "string"
    assert out["vt"].data.reshape(-1)[0] == "double"
    assert bool(out["c1"].host())
    assert not bool(out["c0"].host())


def test_char_key_and_value_become_string():
    out = run_get("d = dictionary('a','xy'); ok = isKey(d,\"a\");"
                  "v = lookup(d,'a');", "ok", "v")
    assert bool(out["ok"].host())
    assert v_str(out["v"]) == "xy"


def v_str(v):
    d = getattr(v, "data", None)
    if d is not None:
        return d.reshape(-1)[0]
    return v.to_str()


def test_remove_value_semantics():
    out = run_get("d = dictionary('a',1); d2 = remove(d,'a');"
                  "n1 = numEntries(d); n2 = numEntries(d2);", "n1", "n2")
    assert float(out["n1"].host()) == 1.0
    assert float(out["n2"].host()) == 0.0


def test_entries_table_struct_cell():
    out = run_get(
        "d = dictionary(); d('x') = 5; e = entries(d); k = e.Key; v = e.Value;"
        "s = entries(d,'struct'); sv = s(1).Value;"
        "c = entries(d,'cell'); cv = c{1,2};",
        "k", "v", "sv", "cv")
    assert v_str(out["k"]) == "x"
    assert float(out["v"].host()) == 5.0
    assert float(out["sv"].host()) == 5.0
    assert float(out["cv"].host()) == 5.0


def test_insert_no_overwrite():
    out = run_get("d = dictionary('a',1);"
                  "d = insert(d,'a',9,'Overwrite',false); v = lookup(d,'a');"
                  "d = insert(d,'a',9); w = lookup(d,'a');", "v", "w")
    assert float(out["v"].host()) == 1.0
    assert float(out["w"].host()) == 9.0


def test_typed_dictionary_coerces_values():
    out = run_get("d = configureDictionary('double','int32');"
                  "d(1) = 7.9; v = lookup(d,1); c = class(v);", "v", "c")
    assert out["c"].to_str() == "int32"
    assert float(out["v"].host()) == 8.0  # int32 rounds


# ---------------------------------------------------- scatteredInterpolant --


def test_scattered_interpolant_linear():
    out = run_get(
        "F = scatteredInterpolant([0;1;0;1],[0;0;1;1],[0;1;1;2]);"
        "v = F(0.5,0.5); m = F.Method;", "v", "m")
    assert abs(float(out["v"].host()) - 1.0) < 1e-12
    assert out["m"].to_str() == "linear"


def test_scattered_interpolant_values_update_and_grid_eval():
    out = run_get(
        "F = scatteredInterpolant([0;1;0;1],[0;0;1;1],[0;1;1;2]);"
        "F.Values = [0;2;2;4]; v = F([0.5 0.25],[0.5 0.25]);", "v")
    r = np.asarray(out["v"].host()).reshape(-1)
    assert abs(r[0] - 2.0) < 1e-12 and abs(r[1] - 1.0) < 1e-12


def test_scattered_interpolant_nearest_and_none_extrap():
    out = run_get(
        "F = scatteredInterpolant([0;1;0;1],[0;0;1;1],[0;1;1;2],'nearest');"
        "a = F(0.9,0.1);"
        "G = scatteredInterpolant([0;1;0;1],[0;0;1;1],[0;1;1;2],'linear','none');"
        "b = G(5,5); c = G(0.5,0.5);", "a", "b", "c")
    assert float(out["a"].host()) == 1.0
    assert np.isnan(float(out["b"].host()))
    assert abs(float(out["c"].host()) - 1.0) < 1e-12


def test_scattered_interpolant_3d_and_matrix_points():
    out = run_get(
        "P = [0 0 0; 1 0 0; 0 1 0; 0 0 1; 1 1 1];"
        "F = scatteredInterpolant(P,[0;1;2;3;6]);"
        "v = F(0.25,0.25,0.25);", "v")
    assert np.isfinite(float(out["v"].host()))


# ------------------------------------------------------------------- zpk ----


def test_zpk_construct_and_gain():
    out = run_get("G = zpk([],[-1 -2],3); c = class(G); g = dcgain(G);"
                  "p = pole(G);", "c", "g", "p")
    assert out["c"].to_str() == "zpk"
    assert abs(float(out["g"].host()) - 1.5) < 1e-12
    p = sorted(np.asarray(out["p"].host()).reshape(-1).real)
    assert abs(p[0] + 2) < 1e-9 and abs(p[1] + 1) < 1e-9


def test_zpk_tf_roundtrip_and_arithmetic():
    out = run_get("G = zpk(tf([1 3],[1 5 6])); g = dcgain(G);"
                  "H = G * zpk([],[-1],2); hp = pole(H);"
                  "T = tf(G); tc = class(T);", "g", "hp", "tc")
    assert abs(float(out["g"].host()) - 0.5) < 1e-12
    assert out["tc"].to_str() == "tf"
    hp = sorted(np.asarray(out["hp"].host()).reshape(-1).real)
    assert abs(hp[0] + 3) < 1e-6 and abs(hp[2] + 1) < 1e-6


def test_zpk_s_variable():
    out = run_get("s = zpk('s'); G = 1/(s+1); g = dcgain(G);", "g")
    assert abs(float(out["g"].host()) - 1.0) < 1e-12
