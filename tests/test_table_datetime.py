"""table / datetime / duration conformance.

≙ reference builtins/table (12k LoC) + builtins/{datetime,duration}."""

import os
import tempfile

import numpy as np

from helpers import run, scalar, val


def test_table_construct_and_dot_access():
    assert scalar("t = table([1;2;3], [4;5;6], 'VariableNames', {'a','b'}); "
                  "x = t.a(2);") == 2.0


def test_table_default_varnames():
    assert scalar("t = table([1;2], [3;4]); x = t.Var2(2);") == 4.0


def test_height_width_istable():
    s = run("t = table([1;2;3], [4;5;6]); h = height(t); w = width(t); "
            "z = istable(t); k = class(t);")
    assert float(s.get("h").host()[0, 0]) == 3
    assert float(s.get("w").host()[0, 0]) == 2
    assert bool(s.get("z").host()[0, 0])
    assert s.get("k").to_str() == "table"


def test_table_paren_subscript_returns_table():
    assert scalar("t = table([1;2;3], [4;5;6]); t2 = t(2:3, :); "
                  "x = double(istable(t2)) * 10 + t2.Var2(1);") == 15.0


def test_table_brace_extract():
    h = val("t = table([1;2;3], [4;5;6]); x = t{:, :};")
    np.testing.assert_allclose(h, [[1, 4], [2, 5], [3, 6]])


def test_table_var_write_and_add():
    assert scalar("t = table([1;2;3]); t.Var1 = [7;8;9]; t.c = [1;1;1]; "
                  "x = t.Var1(1) + width(t);") == 9.0


def test_array2table_table2array_roundtrip():
    h = val("x = table2array(array2table([1 2; 3 4]));")
    np.testing.assert_allclose(h, [[1, 2], [3, 4]])


def test_struct_table_roundtrip():
    assert scalar("t = struct2table(struct('x', 5, 'y', 6)); s = table2struct(t); "
                  "x = s.y;") == 6.0


def test_sortrows_head_tail():
    assert scalar("t = table([3;1;2], [10;20;30]); s2 = sortrows(t, 'Var1'); "
                  "x = s2.Var2(1);") == 20.0
    assert scalar("t = table((1:10)'); x = height(head(t, 3));") == 3.0
    assert scalar("t = table((1:10)'); h = tail(t, 2); x = h.Var1(2);") == 10.0


def test_add_remove_rename_vars():
    assert scalar("t = table([1;2]); t = addvars(t, [5;6], 'NewVariableNames', "
                  "{'z'}); x = t.z(2);") == 6.0
    assert scalar("t = table([1;2], [3;4]); x = width(removevars(t, 'Var1'));") == 1.0
    assert scalar("t = renamevars(table([1;2]), {'Var1'}, {'q'}); x = t.q(1);") == 1.0


def test_readtable_writetable_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.csv")
        s = run(f"t = table([1;2], [3.5;4.5], 'VariableNames', {{'id','v'}}); "
                f"writetable(t, '{p}'); r = readtable('{p}'); x = r.v(2);")
        assert float(s.get("x").host()[0, 0]) == 4.5


def test_datetime_components():
    s = run("d = datetime(2026, 8, 16, 13, 45, 30); y = year(d); m = month(d); "
            "dd = day(d); h = hour(d); mi = minute(d); se = second(d);")
    vals = [float(s.get(k).host()[0, 0]) for k in ("y", "m", "dd", "h", "mi", "se")]
    assert vals == [2026, 8, 16, 13, 45, 30]


def test_datetime_plus_duration():
    assert scalar("x = day(datetime(2026, 8, 30) + days(3));") == 2.0


def test_datetime_difference_is_duration():
    assert scalar("d = datetime(2026, 1, 1) - datetime(2025, 1, 1); x = days(d);") == 365.0


def test_duration_arithmetic():
    assert scalar("x = minutes(hours(2) + minutes(30));") == 150.0
    assert scalar("x = seconds(minutes(2) * 3);") == 360.0


def test_datetime_compare():
    assert scalar("x = double(datetime(2026,8,16) > datetime(2026,8,15));") == 1.0


def test_isdatetime_isduration_class():
    s = run("d = datetime(2026,1,1); u = hours(1); a = isdatetime(d); "
            "b = isduration(u); k = class(d);")
    assert bool(s.get("a").host()[0, 0]) and bool(s.get("b").host()[0, 0])
    assert s.get("k").to_str() == "datetime"


def test_datenum_datestr():
    s = run("n = datenum(datetime(2026, 8, 16)); t = datestr(datetime(2026, 8, 16));")
    assert "Aug-2026" in s.get("t").to_str()
    assert float(s.get("n").host()[0, 0]) == 740210.0


def test_table_row_delete_and_assign():
    from helpers import run_get
    v = run_get("t = table([1;2;3], [4;5;6]); t(2,:) = []; h = height(t);"
                "t(1,:) = table(9, 8); a = t{1,1}; b = t{1,2};"
                "s = struct2table(struct('a', {1; 2})); hs = height(s);"
                "sa = s.a(2);", "h", "a", "b", "hs", "sa")
    assert v["h"].host()[0, 0] == 2.0
    assert v["a"].host()[0, 0] == 9.0
    assert v["b"].host()[0, 0] == 8.0
    assert v["hs"].host()[0, 0] == 2.0
    assert v["sa"].host()[0, 0] == 2.0


def test_calendar_durations():
    from helpers import run_get
    v = run_get("t = datetime(2024,1,31) + calmonths(1); [y,m,d] = ymd(t);"
                "t2 = datetime(2023,5,10) + calyears(1) + caldays(3);"
                "[y2,m2,d2] = ymd(t2);", "y", "m", "d", "y2", "m2", "d2")
    assert (v["y"].host()[0,0], v["m"].host()[0,0], v["d"].host()[0,0]) == (2024, 2, 29)
    assert (v["y2"].host()[0,0], v["m2"].host()[0,0], v["d2"].host()[0,0]) == (2024, 5, 13)


def test_dateshift_between_epochs():
    from helpers import run_get
    import numpy as np
    v = run_get("s = dateshift(datetime(2024,3,15), 'start', 'month');"
                "[~, sm, sd] = ymd(s);"
                "e = dateshift(datetime(2024,2,10), 'end', 'month');"
                "[~, em, ed] = ymd(e);"
                "c = between(datetime(2024,1,15), datetime(2024,3,20));"
                "cm = c.months; cd = c.days;"
                "p = posixtime(datetime(1970,1,2));"
                "j = juliandate(datetime(2000,1,1,12,0,0));"
                "x = exceltime(datetime(1900,1,1));"
                "b = isbetween(datetime(2024,2,1), datetime(2024,1,1), datetime(2024,3,1));",
                "sm", "sd", "em", "ed", "cm", "cd", "p", "j", "x", "b")
    assert (v["sm"].host()[0,0], v["sd"].host()[0,0]) == (3, 1)
    assert (v["em"].host()[0,0], v["ed"].host()[0,0]) == (2, 29)
    assert v["cm"].host()[0,0] == 2 and v["cd"].host()[0,0] == 5
    assert v["p"].host()[0,0] == 86400.0
    assert v["j"].host()[0,0] == 2451545.0   # J2000 epoch
    assert v["x"].host()[0,0] == 2.0
    assert v["b"].host()[0,0]


def test_hms_week():
    from helpers import run_get
    v = run_get("[h, m, s] = hms(datetime(2024,1,1,13,45,30));"
                "w = week(datetime(2024,1,10));", "h", "m", "s", "w")
    assert v["h"].host()[0,0] == 13 and v["m"].host()[0,0] == 45
    assert abs(v["s"].host()[0,0] - 30) < 1e-9
    assert v["w"].host()[0,0] == 2.0


def test_day_kinds_and_datestr_formats():
    from helpers import run_get
    v = run_get("t = datetime(2024,3,15,14,30,0);"
                "doy = day(t, 'dayofyear'); nm = day(t, 'name');"
                "s1 = datestr(t, 'yyyy-mm-dd HH:MM'); s2 = datestr(t, 29);"
                "mn = month(t, 'shortname');",
                "doy", "nm", "s1", "s2", "mn")
    assert v["doy"].host()[0, 0] == 75.0
    assert v["nm"].item() == "Friday"
    assert v["s1"].to_str() == "2024-03-15 14:30"
    assert v["s2"].to_str() == "2024-03-15"
    assert v["mn"].item() == "Mar"


def test_datetime_text_parsing():
    from helpers import run_get
    v = run_get("a = datetime('2024-03-15', 'InputFormat', 'yyyy-MM-dd');"
                "b = datetime('15-Mar-2024'); c = datetime('03/15/2024');"
                "ya = year(a); mb = month(b); dc = day(c);", "ya", "mb", "dc")
    assert v["ya"].host()[0, 0] == 2024.0
    assert v["mb"].host()[0, 0] == 3.0
    assert v["dc"].host()[0, 0] == 15.0
