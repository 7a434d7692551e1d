"""arguments-validation blocks: defaults, class coercion, size specs with
scalar expansion, validators, name-value options."""

import numpy as np

from helpers import fails, run_get


def test_defaults_and_required():
    src = ("r = f(5); r2 = f(5, 7);"
           "function y = f(a, b)\n"
           "arguments\n  a\n  b = a + 1\nend\n"
           "y = a + b;\nend")
    v = run_get(src, "r", "r2")
    assert v["r"].host()[0, 0] == 11.0     # b defaults to a+1 = 6
    assert v["r2"].host()[0, 0] == 12.0
    fails("f(); function y = f(a)\narguments\n  a\nend\ny = a;\nend",
          "NotEnoughInputs")


def test_class_coercion():
    src = ("r = f(int32(3)); c = class(r);"
           "function y = f(a)\narguments\n  a double\nend\ny = a;\nend")
    v = run_get(src, "c")
    assert v["c"].to_str() == "double"


def test_size_spec_scalar_expansion():
    src = ("r = f(7); s = size(r);"
           "function y = f(a)\narguments\n  a (2,3) double\nend\ny = a;\nend")
    v = run_get(src, "s")
    assert v["s"].host().tolist() == [[2.0, 3.0]]
    fails("f([1 2 3]); function y = f(a)\narguments\n  a (2,2)\nend\ny = a;\nend",
          "IncompatibleSize")


def test_validators_in_block():
    src_ok = ("r = f(2);"
              "function y = f(a)\narguments\n  a (1,1) double {mustBePositive}\n"
              "end\ny = a * 2;\nend")
    v = run_get(src_ok, "r")
    assert v["r"].host()[0, 0] == 4.0
    fails("f(-1); function y = f(a)\narguments\n"
          "  a (1,1) double {mustBePositive}\nend\ny = a;\nend",
          "mustBePositive")


def test_validator_with_args():
    fails("f(9); function y = f(a)\narguments\n"
          "  a {mustBeLessThan(a, 5)}\nend\ny = a;\nend", "mustBeLessThan")


def test_name_value_options():
    src = ("r = f(10, 'Scale', 3); r2 = f(10);"
           "function y = f(x, opts)\n"
           "arguments\n  x\n  opts.Scale = 1\n  opts.Offset = 0\nend\n"
           "y = x * opts.Scale + opts.Offset;\nend")
    v = run_get(src, "r", "r2")
    assert v["r"].host()[0, 0] == 30.0
    assert v["r2"].host()[0, 0] == 10.0
    fails("f(1, 'Bogus', 2); function y = f(x, opts)\n"
          "arguments\n  x\n  opts.Scale = 1\nend\ny = x;\nend",
          "UnknownNameValue")


def test_validator_functions_direct():
    fails("mustBePositive(-3);", "mustBePositive")
    fails("mustBeInteger(1.5);", "mustBeInteger")
    fails("mustBeMember('red', {'blue', 'green'});", "mustBeMember")
    fails("mustBeVector(ones(2));", "mustBeVector")
    # passing cases produce no output and no error
    v = run_get("mustBeFinite([1 2 3]); mustBeInRange(5, 0, 10);"
                "mustBeA(int8(1), 'numeric'); ok = 1;", "ok")
    assert v["ok"].host()[0, 0] == 1.0
