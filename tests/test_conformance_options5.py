"""Tier D5: container/text/bit edge semantics regression battery (these
surfaces all work today — pin exact values so they stay working)."""

import numpy as np

from runmat_tpu.session import Session
from runmat_tpu.values import CellArray, StringArray, text_of


_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=False)
    return _SESS


def run_src(src):
    r = sess().execute(src)
    assert r.error is None, (src, r.error)


def num(expr):
    s = sess()
    v = s.get(expr)
    if v is None:                      # expression, not a variable
        r = s.execute(f"__d5 = {expr};")
        assert r.error is None, (expr, r.error)
        v = s.get("__d5")
    return np.asarray(v.host())


def test_struct_array_growth_and_cs_list():
    run_src("clear st; st(2).a = 5;")
    assert float(num("numel(st)").reshape(-1)[0]) == 2.0
    run_src("s3 = struct('a', {1, 2, 3});")
    assert float(num("numel(s3)").reshape(-1)[0]) == 3.0
    assert float(num("s3(2).a").reshape(-1)[0]) == 2.0


def test_char_matrix_and_strvcat_padding():
    run_src("v = ['ab'; 'cd'];")
    assert num("size(v)").reshape(-1).tolist() == [2, 2]
    run_src("sv = strvcat('ab', 'wxyz');")
    assert num("size(sv)").reshape(-1).tolist() == [2, 4]
    # padded with spaces
    run_src("pad_ok = strcmp(sv(1, :), 'ab  ');")
    assert bool(num("pad_ok").reshape(-1)[0])


def test_string_array_ops():
    run_src('j = join(["a" "bb"], \'-\');')
    v = sess().get("j")
    assert (v.item() if isinstance(v, StringArray) else v.to_str()) == "a-bb"
    run_src('sc = "x" + "y";')
    v = sess().get("sc")
    assert (v.item() if isinstance(v, StringArray) else v.to_str()) == "xy"
    run_src("cm = compose('%d-%d', [1 2; 3 4]);")
    cm = sess().get("cm")
    texts = [text_of(e) if not isinstance(e, str) else e
             for e in np.asarray(cm.data).reshape(-1, order="F")]
    assert "1-2" in texts[0] or texts[0] == "1-2"


def test_containers_map_lifecycle():
    run_src("m = containers.Map({'x', 'y'}, {1, 2}); "
            "okx = isKey(m, 'x'); vx = m('x'); n1 = m.Count; "
            "remove(m, 'x'); okx2 = isKey(m, 'x'); n2 = m.Count;")
    assert bool(num("okx").reshape(-1)[0])
    assert float(num("vx").reshape(-1)[0]) == 1.0
    assert float(num("n1").reshape(-1)[0]) == 2.0
    assert not bool(num("okx2").reshape(-1)[0])
    assert float(num("n2").reshape(-1)[0]) == 1.0


def test_bit_and_typecast_values():
    run_src("bg = double(bitget(uint8(5), 1:3)); bs = double(bitset(uint8(0), 3));")
    np.testing.assert_allclose(num("bg").reshape(-1), [1, 0, 1])
    assert float(num("bs").reshape(-1)[0]) == 4.0
    run_src("tc = typecast(single(1), 'uint32');")
    assert float(num("double(tc)").reshape(-1)[0]) == 1065353216.0
    assert sess().execute("cl = class(tc);").error is None
    run_src("cl = class(tc);")
    assert sess().get("cl").to_str() == "uint32"


def test_switch_cell_case_and_mexception():
    run_src("switch 'abc', case {'a', 'abc'}, w = 1; "
            "otherwise, w = 2; end")
    assert float(num("w").reshape(-1)[0]) == 1.0
    run_src("try, error('My:id', 'boom %d', 7); catch e, "
            "msg = e.message; rid = e.identifier; end")
    assert sess().get("msg").to_str() == "boom 7"
    assert sess().get("rid").to_str() == "My:id"


def test_handle_composition_and_end_arith():
    run_src("f = @(x) x + 1; g = @(x) f(x) * 2; gv = g(3);")
    assert float(num("gv").reshape(-1)[0]) == 8.0
    run_src("A = magic(4); A(end, end-1) = 0; t = A(4, 3);")
    assert float(num("t").reshape(-1)[0]) == 0.0
    run_src("c = {1, 'two', [3 4]}; lv = c{end}; l2 = lv(2);")
    assert float(num("l2").reshape(-1)[0]) == 4.0


def test_single_class_propagates_through_linalg():
    run_src("dt = det(single(magic(2))); cls = class(dt);")
    assert sess().get("cls").to_str() == "single"
    run_src("eo = eye(0);")
    assert num("size(eo)").reshape(-1).tolist() == [0, 0]
