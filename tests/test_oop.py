"""classdef OOP conformance: value/handle semantics, dispatch, inheritance,
statics, events/listeners, introspection.

≙ reference OOP tests (runmat-vm/tests/classes*.rs; object resolve at
runmat-vm/src/object/resolve.rs)."""

import numpy as np
import pytest

from helpers import run
from runmat_tpu.errors import MatError
from runmat_tpu.session import Session


POINT = """classdef Point
properties
x = 0
y = 0
end
methods
function obj = Point(a, b)
obj.x = a; obj.y = b;
end
function d = dist(obj)
d = sqrt(obj.x^2 + obj.y^2);
end
function obj = scale(obj, f)
obj.x = obj.x * f; obj.y = obj.y * f;
end
end
methods (Static)
function p = origin()
p = Point(0, 0);
end
end
end"""

COUNTER = """classdef Counter < handle
properties
n = 0
end
events
Bumped
end
methods
function bump(obj)
obj.n = obj.n + 1;
notify(obj, 'Bumped');
end
end
end"""


def scalar(v) -> float:
    h = v.host()
    assert h.size == 1
    return float(h.reshape(-1)[0].real)


def sess(*defs):
    s = Session(accelerate=False)
    for i, d in enumerate(defs):
        s.run_source(d, f"class{i}.m")
    return s


def test_construct_and_method_dot_call():
    s = sess(POINT)
    s.run_source("p = Point(3, 4); d = p.dist();", "t")
    assert scalar(s.get("d")) == 5.0


def test_method_function_call_syntax():
    s = sess(POINT)
    s.run_source("p = Point(3, 4); d = dist(p);", "t")
    assert scalar(s.get("d")) == 5.0


def test_property_read_write():
    s = sess(POINT)
    s.run_source("p = Point(1, 2); p.x = 10; v = p.x;", "t")
    assert scalar(s.get("v")) == 10.0


def test_value_semantics_copy_on_write():
    s = sess(POINT)
    s.run_source("p = Point(1, 2); q = p; q.x = 99; a = p.x; b = q.x;", "t")
    assert scalar(s.get("a")) == 1.0
    assert scalar(s.get("b")) == 99.0


def test_value_method_returns_copy():
    s = sess(POINT)
    s.run_source("p = Point(1, 2); q = p.scale(3); a = p.x; b = q.x;", "t")
    assert scalar(s.get("a")) == 1.0
    assert scalar(s.get("b")) == 3.0


def test_static_method():
    s = sess(POINT)
    s.run_source("o = Point.origin(); d = o.dist();", "t")
    assert scalar(s.get("d")) == 0.0


def test_default_properties():
    s = sess(POINT)
    s.run_source("function p = mk()\np = Point(5, 6);\nend\nq = mk(); v = q.y;", "t")
    assert scalar(s.get("v")) == 6.0


def test_constructor_arg_count():
    s = sess(POINT)
    with pytest.raises(MatError):
        s.run_source("p = Point(1, 2, 3, 9);", "t")


def test_handle_semantics_share():
    s = sess(COUNTER)
    s.run_source("c = Counter(); d = c; c.bump(); d.bump(); v = c.n;", "t")
    assert scalar(s.get("v")) == 2.0


def test_handle_passed_to_function_mutates():
    s = sess(COUNTER)
    s.run_source("""function poke(h)
h.bump();
end
c = Counter(); poke(c); poke(c); v = c.n;""", "t")
    assert scalar(s.get("v")) == 2.0


def test_inheritance_method_and_props():
    s = sess(POINT, """classdef Point3 < Point
properties
z = 0
end
methods
function obj = Point3(a, b, c)
obj.x = a; obj.y = b; obj.z = c;
end
end
end""")
    s.run_source("r = Point3(3, 4, 5); d = r.dist(); z = r.z;", "t")
    assert scalar(s.get("d")) == 5.0
    assert scalar(s.get("z")) == 5.0


def test_isa_class_isobject():
    s = sess(POINT, COUNTER)
    s.run_source("""p = Point(1,1); c = Counter();
k = class(p); a1 = isa(p, 'Point'); a2 = isa(c, 'handle');
a3 = isa(p, 'handle'); o = isobject(p);""", "t")
    assert s.get("k").to_str() == "Point"
    assert scalar(s.get("a1")) == 1
    assert scalar(s.get("a2")) == 1
    assert scalar(s.get("a3")) == 0
    assert scalar(s.get("o")) == 1


def test_properties_methods_events_builtins():
    s = sess(COUNTER)
    s.run_source("""c = Counter();
p = properties(c); np_ = numel(p);
m = methods(c); e = events(c);""", "t")
    assert scalar(s.get("np_")) == 1
    assert s.get("e").data[0, 0].to_str() == "Bumped"


def test_listeners_notify():
    s = sess(COUNTER)
    s.run_source("""function onbump(src)
global NBUMP
NBUMP = NBUMP + 1;
end
global NBUMP
NBUMP = 0;
c = Counter();
l = addlistener(c, 'Bumped', @onbump);
c.bump(); c.bump();
v = NBUMP;""", "t")
    assert scalar(s.get("v")) == 2.0


def test_delete_isvalid():
    s = sess(COUNTER)
    s.run_source("c = Counter(); v1 = isvalid(c); delete(c); v2 = isvalid(c);", "t")
    assert scalar(s.get("v1")) == 1
    assert scalar(s.get("v2")) == 0
    with pytest.raises(MatError):
        s.run_source("x = c.n;", "t2")


def test_unknown_property_errors():
    s = sess(POINT)
    with pytest.raises(MatError):
        s.run_source("p = Point(1,2); p.nosuch = 3;", "t")
    with pytest.raises(MatError):
        s.run_source("p = Point(1,2); v = p.nosuch;", "t")


def test_object_display(capsys=None):
    s = sess(POINT)
    r = s.execute("p = Point(7, 8)")
    assert "Point with properties" in r.output
    assert "x: 7" in r.output


def test_contextual_keywords_as_identifiers():
    s = Session(accelerate=False)
    s.run_source("properties = 5; methods = properties + 1; v = methods;", "t")
    assert scalar(s.get("v")) == 6.0
