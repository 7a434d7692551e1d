"""Symbolic toolbox + extended io (HDF5, textscan, archives).

≙ reference builtins/math/symbolic (runmat-builtins/src/symbolic.rs) and
builtins/io/{hdf5,textscan,archives}."""

import os
import tempfile

import numpy as np

from helpers import run, scalar


def test_sym_diff_subs():
    assert scalar("syms x; x = double(subs(diff(x^3 + 2*x, x), x, 2));") == 14.0


def test_sym_integral():
    assert scalar("syms x; x = double(int(x^2, x, 0, 3));") == 9.0


def test_sym_solve():
    s = run("syms x; s = solve(x^2 - 4, x); n = numel(s); "
            "v = double(s(1)) + double(s(2));")
    assert float(s.get("n").host()[0, 0]) == 2.0
    assert float(s.get("v").host()[0, 0]) == 0.0


def test_sym_simplify_trig_identity():
    assert scalar("syms t; x = double(simplify(sin(t)^2 + cos(t)^2));") == 1.0


def test_sym_expand_factor_roundtrip():
    assert scalar("syms a b; e = expand((a + b)^2); f = factor(e); "
                  "x = double(subs(subs(f, a, 3), b, 4));") == 49.0


def test_sym_vpa_rational():
    assert scalar("x = double(abs(double(vpa(sym(1)/3, 20)) - 1/3) < 1e-15);") == 1.0


def test_sym_class_issym():
    s = run("k = class(sym('z')); t = issym(sym('z'));")
    assert s.get("k").to_str() == "sym"
    assert bool(s.get("t").host()[0, 0])


def test_h5_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        assert scalar(f"h5write('{d}/a.h5', '/g/x', [1 2; 3 4]); "
                      f"r = h5read('{d}/a.h5', '/g/x'); x = r(2,1);") == 3.0


def test_textscan_columns():
    s = run("c = textscan(sprintf('1 a\\n2 b\\n3 c'), '%f %s'); "
            "nums = c{1}; names = c{2}; v = nums(2);")
    assert float(s.get("v").host()[0, 0]) == 2.0
    assert s.get("names").data[2, 0].to_str() == "c"


def test_zip_unzip_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        assert scalar(
            f"fid = fopen('{d}/f.txt', 'w'); fwrite(fid, 'data'); fclose(fid); "
            f"zip('{d}/z.zip', '{d}/f.txt'); unzip('{d}/z.zip', '{d}/o'); "
            f"x = exist('{d}/o/f.txt', 'file');") == 2.0


def test_webread_file_json():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.json")
        open(p, "w").write('{"a": 5, "b": [1, 2]}')
        assert scalar(f"r = webread('file://{p}'); x = r.a;") == 5.0


def test_sym_concat_and_multisubs():
    from helpers import run_get
    v = run_get("syms a b; e = expand((a+b)^2);"
                "y = double(subs(e, [a b], [1 2]));"
                "m = [a b; b a]; s = size(m);"
                "d = double(subs(m(1,2), b, 7));", "y", "s", "d")
    assert v["y"].host()[0, 0] == 9.0
    assert v["s"].host().tolist() == [[2.0, 2.0]]
    assert v["d"].host()[0, 0] == 7.0
