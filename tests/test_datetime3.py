"""Datetime batch 3: calendarDuration constructors, datevec/eomday/today,
and the exchange-calendar business-day family (≙ runmat-runtime/src/builtins/
datetime/mod.rs:1560-2848). Expectations are literal-pinned from documented
MATLAB behavior (NYSE-style market calendar)."""

import os

import numpy as np

from helpers import run
from runmat_tpu.session import Session


def val(src, name="r"):
    return run(src).get(name).host()


# --------------------------------------------------------------------------- #
# calendarDuration family
# --------------------------------------------------------------------------- #

def test_calendarduration_components():
    s = run("cd = calendarDuration(1, 2, 0); m = calmonths(cd); "
            "q = calquarters(calendarDuration(0, 6, 0)); "
            "w = caldays(calweeks(2)); ok = iscalendarduration(cd); "
            "nk = iscalendarduration(5);")
    assert float(s.get("m").host()) == 14.0      # 1y 2mo = 14 months
    assert float(s.get("q").host()) == 2.0
    assert float(s.get("w").host()) == 14.0
    assert s.get("ok").host().all() and not s.get("nk").host().any()


def test_calendarduration_days_only_and_passthrough():
    s = run("a = calendarDuration(5); d = caldays(a); "
            "b = calendarDuration(a); e = caldays(b);")
    assert float(s.get("d").host()) == 5.0
    assert float(s.get("e").host()) == 5.0


def test_calendarduration_hms_fold_into_days():
    # 1 day + 12 hours -> 1.5 calendar days
    s = run("d = caldays(calendarDuration(0, 0, 1, 12, 0, 0));")
    assert float(s.get("d").host()) == 1.5


def test_datetime_plus_calendarduration_clamps_month_end():
    s = run("t = datetime(2024, 1, 31) + calmonths(1); v = datevec(t);")
    assert s.get("v").host()[0, :3].tolist() == [2024.0, 2.0, 29.0]


def test_years_weeks_fixed_durations():
    s = run("a = days(years(1)); b = hours(weeks(1)); c = years(days(365.2425));")
    assert abs(float(s.get("a").host()) - 365.2425) < 1e-9
    assert float(s.get("b").host()) == 168.0
    assert abs(float(s.get("c").host()) - 1.0) < 1e-12


# --------------------------------------------------------------------------- #
# datevec / eomday / today
# --------------------------------------------------------------------------- #

def test_datevec_matrix_roundtrip():
    v = val("r = datevec(datenum(2024, 3, 15) + 0.25 + 30/86400);")
    assert v.shape == (1, 6)
    assert v[0, :5].tolist() == [2024.0, 3.0, 15.0, 6.0, 0.0]
    # seconds carry the serial's float quantum (~10 us at datenum scale);
    # the reference's nanosecond rounding has the same behavior
    assert abs(v[0, 5] - 30.0) < 1e-4


def test_datevec_multi_output():
    s = run("[y, mo, d, h, mi, sec] = datevec(datenum(1999, 12, 31) + 0.5);")
    assert float(s.get("y").host()) == 1999.0
    assert float(s.get("mo").host()) == 12.0
    assert float(s.get("d").host()) == 31.0
    assert float(s.get("h").host()) == 12.0
    assert float(s.get("mi").host()) == 0.0
    assert float(s.get("sec").host()) == 0.0


def test_datevec_of_datetime_vector():
    v = val("r = datevec(datetime(2020, 2, 29));")
    assert v[0, :3].tolist() == [2020.0, 2.0, 29.0]


def test_eomday_broadcast_and_leap():
    v = val("r = eomday(2024, 2);")
    assert float(v) == 29.0
    v = val("r = eomday(2023, [1 2 4 12]);")
    assert v.reshape(-1).tolist() == [31.0, 28.0, 30.0, 31.0]
    v = val("r = eomday([2023; 2024], 2);")
    assert v.reshape(-1).tolist() == [28.0, 29.0]


def test_today_is_midnight_datetime():
    s = run("t = today; v = datevec(t); h = v(4:6);")
    assert s.get("t").mclass == "datetime"
    assert s.get("h").host().reshape(-1).tolist() == [0.0, 0.0, 0.0]


def test_datetick_is_accepted_noop():
    s = run("plot(1:3, 1:3); datetick('x'); ok = 1;")
    assert float(s.get("ok").host()) == 1.0


# --------------------------------------------------------------------------- #
# business-day calendar (NYSE-style market holidays)
# --------------------------------------------------------------------------- #

def test_holidays_2024_market_calendar():
    s = run("h = holidays(2024); v = datevec(h); n = size(h, 1);")
    assert float(s.get("n").host()) == 10.0
    md = s.get("v").host()[:, 1:3].astype(int).tolist()
    # NYSE 2024: NewYear, MLK, Washington, GoodFri, Memorial, Juneteenth,
    # July4, Labor, Thanksgiving, Christmas
    assert md == [[1, 1], [1, 15], [2, 19], [3, 29], [5, 27],
                  [6, 19], [7, 4], [9, 2], [11, 28], [12, 25]]
    assert s.get("h").mclass == "datetime"


def test_holidays_range_form():
    s = run("h = holidays(datenum(2024, 6, 1), datenum(2024, 7, 31)); "
            "v = datevec(h);")
    md = s.get("v").host()[:, 1:3].astype(int).tolist()
    assert md == [[6, 19], [7, 4]]


def test_isbusday_weekends_and_holidays():
    s = run("a = isbusday(datenum(2024, 7, 4)); "     # Thu, holiday
            "b = isbusday(datenum(2024, 7, 5)); "     # Fri
            "c = isbusday(datenum(2024, 7, 6)); "     # Sat
            "d = isbusday(datenum(2024, 7, 4), []);")  # custom empty cal
    assert not s.get("a").host().any()
    assert s.get("b").host().all()
    assert not s.get("c").host().any()
    assert s.get("d").host().all()       # no holidays supplied -> busday


def test_busdays_skips_christmas():
    v = val("r = datevec(busdays(datenum(2024, 12, 23), datenum(2024, 12, 27)));")
    days = v[:, 2].astype(int).tolist()
    assert days == [23, 24, 26, 27]      # Dec 25 (Wed) is a market holiday


def test_days252bus_inclusive_count_and_sign():
    s = run("a = days252bus(datenum(2024, 12, 23), datenum(2024, 12, 27)); "
            "b = days252bus(datenum(2024, 12, 27), datenum(2024, 12, 23));")
    assert float(s.get("a").host()) == 4.0
    assert float(s.get("b").host()) == -4.0


def test_fbusdate_lbusdate():
    s = run("f = datevec(fbusdate(2024, 9)); "     # Labor Day Mon Sep 2
            "l = datevec(lbusdate(2024, 11));")    # Thanksgiving + weekend
    assert s.get("f").host()[0, :3].tolist() == [2024.0, 9.0, 3.0]
    assert s.get("l").host()[0, :3].tolist() == [2024.0, 11.0, 29.0]


def test_daysdif_actual_and_30_360():
    s = run("a = daysdif(datenum(2023, 1, 1), datenum(2024, 1, 1)); "
            "b = daysdif(datenum(2024, 1, 31), datenum(2024, 3, 31), 1); "
            "c = daysdif(datenum(2024, 1, 15), datenum(2024, 2, 20), 1);")
    assert float(s.get("a").host()) == 365.0
    assert float(s.get("b").host()) == 60.0       # 30/360: 31st clamps to 30
    assert float(s.get("c").host()) == 35.0       # 30 + (20-15)


# --------------------------------------------------------------------------- #
# mfilename / localfunctions / nargoutchk
# --------------------------------------------------------------------------- #

def test_mfilename_in_script_file(tmp_path):
    p = tmp_path / "my_script_name.m"
    p.write_text("nm = mfilename; full = mfilename('fullpath');\n")
    s = Session(accelerate=False)
    s.run_file(str(p))
    from runmat_tpu.values import text_of
    assert text_of(s.get("nm")) == "my_script_name"
    full = text_of(s.get("full"))
    assert full.endswith(os.path.join(str(tmp_path), "my_script_name"))


def test_mfilename_empty_at_prompt():
    from runmat_tpu.values import text_of
    s = run("nm = mfilename;")
    assert text_of(s.get("nm")) == ""


def test_localfunctions_lists_unit_functions():
    s = run("hs = localfunctions; n = numel(hs); "
            "a = hs{1}; r = a(3);\n"
            "function y = trip(x)\n y = 3 * x;\nend\n"
            "function y = quad(x)\n y = 4 * x;\nend\n")
    assert float(s.get("n").host()) == 2.0
    assert float(s.get("r").host()) == 9.0


def test_nargoutchk_rejects_wrong_output_counts():
    src = ("[a, b] = two_out();\n"
           "function varargout = two_out()\n"
           "  nargoutchk(1, 1);\n"
           "  varargout{1} = 1; varargout{2} = 2;\nend\n")
    s = Session(accelerate=False)
    r = s.execute(src)
    assert r.error is not None
    assert "nargoutchk" in r.error.identifier
    ok = ("x = one_out();\n"
          "function y = one_out()\n  nargoutchk(0, 1);\n  y = 5;\nend\n")
    s2 = Session(accelerate=False)
    r2 = s2.execute(ok)
    assert r2.error is None
    assert float(s2.get("x").host()) == 5.0
