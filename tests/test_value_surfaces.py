"""Method-style value surfaces the reference registers as dotted builtins:
datetime/duration indexing (datetime.subsref/subsasgn), builtin-class
`.empty` static constructors (string.empty), NaT/isnat, and triangulation
queries with per-coordinate inputs (≙ runmat-runtime/src/builtins/
datetime/mod.rs:2850+, string.empty in the registry name list)."""

import numpy as np

from helpers import run


def r_of(src, name="r"):
    return float(run(src).get(name).host().reshape(-1)[0])


# ------------------------------------------------- datetime/duration indexing

def test_datetime_read_slice_colon_end():
    assert r_of("t = datetime(2024,1,1) + days(0:4); v = datevec(t(3)); "
                "r = v(3);") == 3.0
    assert r_of("t = datetime(2024,1,1) + days(0:4); r = numel(t(2:3));") == 2.0
    assert r_of("t = datetime(2024,1,1) + days(0:4); r = size(t(:), 1);") == 5.0
    assert r_of("t = datetime(2024,1,1) + days(0:4); "
                "v = datevec(t(end)); r = v(3);") == 5.0


def test_datetime_logical_indexing():
    assert r_of("t = datetime(2024,1,1) + days(0:4); "
                "r = numel(t(logical([1 0 1 0 1])));") == 3.0


def test_datetime_write_and_grow_with_nat():
    assert r_of("t = datetime(2024,1,1) + days(0:4); "
                "t(2) = datetime(2030,6,1); v = datevec(t(2)); "
                "r = v(1);") == 2030.0
    # growth fills NaT
    assert r_of("t = datetime(2024,1,1) + days(0:2); "
                "t(5) = datetime(2024,2,1); "
                "r = double(sum(isnat(t)));") == 1.0
    # NaN numeric coerces to NaT
    assert r_of("t = datetime(2024,1,1) + days(0:2); t(2) = NaN; "
                "r = double(sum(isnat(t)));") == 1.0


def test_datetime_delete_element():
    assert r_of("t = datetime(2024,1,1) + days(0:4); t(2) = []; "
                "r = numel(t);") == 4.0


def test_datetime_write_class_mismatch_errors():
    s = run("ok = 0; t = datetime(2024,1,1) + days(0:2); "
            "try, t(2) = 5; catch, ok = 1; end")
    assert float(s.get("ok").host()) == 1.0


def test_duration_index_write_end():
    assert r_of("d = hours(1:5); r = hours(d(2));") == 2.0
    assert r_of("d = hours(1:5); d(1) = minutes(30); r = hours(d(1));") == 0.5
    assert r_of("d = hours(1:5); r = hours(d(end));") == 5.0
    assert r_of("d = hours(1:5); d(2) = []; r = numel(d);") == 4.0


def test_nat_builtin():
    assert r_of("t = NaT(2, 3); r = double(sum(isnat(t(:))));") == 6.0
    assert r_of("t = NaT; r = double(isdatetime(t));") == 1.0


# ------------------------------------------------- builtin-class .empty

def test_class_empty_statics():
    assert r_of("e = string.empty; r = numel(e);") == 0.0
    assert r_of("e = string.empty(0, 3); r = size(e, 2);") == 3.0
    assert r_of("e = double.empty; r = double(isa(e, 'double')) "
                "+ numel(e);") == 1.0
    assert r_of("e = int8.empty(2, 0); r = double(isa(e, 'int8')) "
                "+ size(e, 1);") == 3.0
    assert r_of("e = cell.empty; r = double(iscell(e));") == 1.0
    assert r_of("e = datetime.empty; r = double(isdatetime(e)) "
                "+ numel(e);") == 1.0


def test_class_empty_rejects_nonempty_dims():
    s = run("ok = 0; try, e = double.empty(2, 2); catch, ok = 1; end")
    assert float(s.get("ok").host()) == 1.0


def test_variable_shadows_class_name():
    # a variable named 'string' wins over the static-access interpretation
    assert r_of("string = struct('empty', 7); r = string.empty;") == 7.0


# ------------------------------------------------- triangulation queries

def test_point_location_coordinate_form():
    assert r_of("pts = [0 0; 1 0; 0 1; 1 1]; "
                "dt = delaunayTriangulation(pts); "
                "r = double(~isnan(pointLocation(dt, 0.2, 0.2)));") == 1.0
    assert r_of("pts = [0 0; 1 0; 0 1; 1 1]; "
                "dt = delaunayTriangulation(pts); "
                "id = pointLocation(dt, [0.2 0.2; 5 5]); "
                "r = double(isnan(id(2)));") == 1.0


def test_nearest_neighbor_coordinate_and_method_form():
    assert r_of("pts = [0 0; 1 0; 0 1]; dt = delaunayTriangulation(pts); "
                "r = nearestNeighbor(dt, 0.9, 0.1);") == 2.0
    assert r_of("pts = [0 0; 1 0; 0 1]; dt = delaunayTriangulation(pts); "
                "r = dt.nearestNeighbor(0.9, 0.1);") == 2.0


# ------------------------------------- timelike shim: numeric library access

def test_datetime_sort_min_max_unique():
    assert r_of("t = datetime(2024,1,1) + days([3 1 2]); "
                "v = datevec(sort(t)); r = v(1, 3);") == 2.0
    assert r_of("t = datetime(2024,1,1) + days([3 1 2]); "
                "v = datevec(sort(t, 'descend')); r = v(1, 3);") == 4.0
    assert r_of("t = datetime(2024,1,1) + days([3 1 2]); "
                "v = datevec(max(t)); r = v(3);") == 4.0
    assert r_of("t = datetime(2024,1,1) + days([3 1 2]); "
                "[m, i] = max(t); r = i;") == 1.0
    assert r_of("t = datetime(2024,1,1) + days([2 1 2]); "
                "r = numel(unique(t));") == 2.0
    # NaT is omitted by default, like omitnan for numerics
    assert r_of("t = [NaT, datetime(2024,1,5)]; v = datevec(max(t)); "
                "r = v(3);") == 5.0


def test_datetime_diff_and_mean():
    assert r_of("t = datetime(2024,1,1) + days([1 3 6]); d = diff(t); "
                "r = hours(d(1)) + 10 * double(isduration(d));") == 58.0
    assert r_of("t = datetime(2024,1,1) + days([0 2]); "
                "v = datevec(mean(t)); r = v(3);") == 2.0


def test_duration_sum_cummax_abs():
    assert r_of("r = hours(sum(hours([1 2 3])));") == 6.0
    assert r_of("c = cummax(hours([1 3 2])); r = hours(c(3));") == 3.0
    assert r_of("r = hours(abs(hours(-3))) + hours(-hours(1));") == 2.0


def test_datetime_sum_is_undefined():
    s = run("ok = 0; try, s = sum([datetime(2024,1,1)]); catch, ok = 1; end")
    assert float(s.get("ok").host()) == 1.0


def test_datetime_structural_and_sets():
    assert r_of("t = [datetime(2024,1,1), datetime(2024,1,2)]; "
                "r = numel(t);") == 2.0
    assert r_of("t = (datetime(2024,1,1) + days(0:2))'; "
                "r = size(t, 1);") == 3.0
    assert r_of("t = datetime(2024,1,1) + days(0:5); "
                "r = size(reshape(t, 2, 3), 2);") == 3.0
    assert r_of("a = datetime(2024,1,1) + days(0:3); "
                "b = datetime(2024,1,1) + days(2:5); "
                "r = numel(intersect(a, b));") == 2.0
    assert r_of("t = datetime(2024,1,1) + days(0:3); "
                "r = double(ismember(datetime(2024,1,3), t)) "
                "+ double(issorted(t));") == 2.0
    assert r_of("t = linspace(datetime(2024,1,1), datetime(2024,1,11), 11); "
                "r = numel(t);") == 11.0


def test_timelike_class_mixing_errors():
    s = run("ok = 0; try, x = sort([hours(1), datetime(2024,1,1)]); "
            "catch, ok = 1; end")
    assert float(s.get("ok").host()) == 1.0


def test_datetime_colon_forms():
    assert r_of("t = datetime(2024,1,1):datetime(2024,1,5); "
                "r = numel(t);") == 5.0
    assert r_of("t = datetime(2024,1,1):hours(6):datetime(2024,1,2); "
                "r = numel(t);") == 5.0
    # calendar stepping clamps month ends: Jan 31 + 1 month -> Feb 29
    assert r_of("t = datetime(2024,1,31):calmonths(1):datetime(2024,4,30); "
                "v = datevec(t(2)); r = v(3) + numel(t)/100;") == 29.04
    assert r_of("t = datetime(2024,1,5):datetime(2024,1,1); "
                "r = numel(t);") == 0.0


# ----------------------------------- table metadata writes + string() coverage

def test_table_properties_variablenames_write():
    assert r_of("T = table([1;2], [10;20]); "
                "T.Properties.VariableNames = {'k','a'}; "
                "r = T.a(2);") == 20.0
    assert r_of("T = table([1;2]); T.Properties.RowNames = {'r1','r2'}; "
                "r = height(T);") == 2.0
    # wrong count errors
    s = run("ok = 0; T = table([1;2], [3;4]); "
            "try, T.Properties.VariableNames = {'only'}; catch, ok = 1; end")
    assert float(s.get("ok").host()) == 1.0


def test_string_of_timelike():
    assert r_of("r = double(string(hours(1.5)) == \"01:30:00\");") == 1.0
    assert r_of("r = double(string(datetime(2024,3,15)) "
                "== \"15-Mar-2024\");") == 1.0
    assert r_of("r = double(string(datetime(2024,3,15,13,5,7)) "
                "== \"15-Mar-2024 13:05:07\");") == 1.0
    assert r_of("r = double(ismissing(string(NaT)));") == 1.0
    assert r_of("r = double(string(-minutes(90)) == \"-01:30:00\");") == 1.0


# --------------------------------------------- joins / countcats / dateshift

def test_innerjoin_outerjoin():
    assert r_of("A = table([1;2], [10;20]); B = table([2;3], [200;300]); "
                "A.Properties.VariableNames = {'k','a'}; "
                "B.Properties.VariableNames = {'k','b'}; "
                "J = innerjoin(A, B); r = height(J) * 100 + J.b(1);") == 300.0
    assert r_of("A = table([1;2], [10;20]); B = table([2;3], [200;300]); "
                "A.Properties.VariableNames = {'k','a'}; "
                "B.Properties.VariableNames = {'k','b'}; "
                "J = outerjoin(A, B); "
                "r = height(J) * 100 + double(isnan(J.b(1)));") == 301.0
    assert r_of("A = table([1;2], [7;8]); B = table([2;1], [5;6]); "
                "A.Properties.VariableNames = {'id','x'}; "
                "B.Properties.VariableNames = {'id','y'}; "
                "J = innerjoin(A, B, 'Keys', 'id'); r = J.y(1);") == 6.0


def test_countcats():
    assert r_of("c = categorical({'a','b','a'}); "
                "r = max(countcats(c));") == 2.0
    assert r_of("c = categorical({'a','b','a'}); "
                "n = countcats(c); r = numel(n);") == 2.0


def test_dateshift_rule_argument():
    assert r_of("t = dateshift(datetime(2024,1,1,10,0,0), 'start', 'day', "
                "'next'); v = datevec(t); r = v(3) * 100 + v(4);") == 200.0
    assert r_of("t = dateshift(datetime(2024,3,15), 'start', 'month', "
                "'previous'); v = datevec(t); r = v(2);") == 2.0
    assert r_of("t = dateshift(datetime(2024,3,15), 'end', 'year', 'next'); "
                "v = datevec(t); r = v(1) * 100 + v(2);") == 202512.0


def test_retime_methods():
    base = ("tt = timetable(datetime(2024,1,1)+hours(0:2:4)', [1;2;3]); ")
    assert r_of(base + "t2 = retime(tt, 'hourly'); "
                "r = height(t2) * 10 + double(isnan(t2.Var1(2)));") == 51.0
    assert r_of(base + "t2 = retime(tt, 'hourly', 'linear'); "
                "r = t2.Var1(2);") == 1.5
    assert r_of("tt = timetable(datetime(2024,1,1)+hours([0 3])', [5;9]); "
                "t2 = retime(tt, 'hourly', 'previous'); "
                "r = t2.Var1(3);") == 5.0
    assert r_of("tt = timetable(datetime(2024,1,1)+hours([1 2 25])', "
                "[2;4;10]); t2 = retime(tt, 'daily', 'mean'); "
                "r = t2.Var1(1);") == 3.0
    assert r_of("tt = timetable(datetime(2024,1,1)+minutes([0 30 60])', "
                "[1;2;3]); t2 = retime(tt, 'regular', 'TimeStep', "
                "minutes(30)); r = height(t2);") == 3.0


def test_rowfun():
    assert r_of("T = table([1;2], [3;4]); U = rowfun(@plus, T); "
                "r = U.Var1(2);") == 6.0


# ------------------------------------------ getmethod / classref / getcallinfo

def test_getmethod_binds_classdef_and_builtin_objects():
    from runmat_tpu.session import Session
    s = run("m = containers.Map(); m('a') = 1; f = getmethod(m, 'keys'); "
            "k = f(); r = numel(k);")
    assert float(s.get("r").host()) == 1.0
    sess = Session(accelerate=False)
    r0 = sess.execute("classdef PtX\n properties\n  v\n end\n methods\n"
                      "  function o = PtX(v), o.v = v; end\n"
                      "  function y = dbl(o), y = 2 * o.v; end\n end\nend")
    assert r0.error is None
    r1 = sess.execute("obj = PtX(3); f = getmethod(obj, 'dbl'); "
                      "a = f(); b = feval(f);")
    assert r1.error is None
    assert float(sess.get("a").host()) == 6.0
    assert float(sess.get("b").host()) == 6.0


def test_getcallinfo_and_classref():
    s = run("info = getcallinfo; "
            "ok = double(ischar(info.name)) + double(iscell(info.stack));")
    assert float(s.get("ok").host()) == 2.0
    assert r_of("c = classref('double'); e = c.empty; r = numel(e);") == 0.0


def test_explicit_empty_parens_invoke_callables():
    assert r_of("g = @() 42; r = g();") == 42.0
    assert r_of("A = [1 2 3]; r = numel(A());") == 3.0   # A() is A
