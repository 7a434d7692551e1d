"""Strings batch 2: conversions, patterns, transforms."""

import numpy as np

from helpers import run_get
from runmat_tpu.values import CellArray, MatArray, StringArray


def test_newline_strings_strlength():
    v = run_get('n = newline; s = strings(2, 3); L = strlength("hello");',
                "n", "s", "L")
    assert v["n"].to_str() == "\n"
    assert isinstance(v["s"], StringArray) and v["s"].shape == (2, 3)
    assert v["L"].host()[0, 0] == 5.0


def test_conversions():
    v = run_get("s = convertCharsToStrings('abc');"
                "c = convertStringsToChars(\"xyz\");"
                "q = isStringScalar(\"one\");", "s", "c", "q")
    assert isinstance(v["s"], StringArray) and v["s"].item() == "abc"
    assert isinstance(v["c"], MatArray) and v["c"].to_str() == "xyz"
    assert v["q"].host()[0, 0]


def test_int2str_mat2str():
    v = run_get("a = int2str(3.7); b = mat2str([1 2; 3 4]); c = mat2str(pi, 4);",
                "a", "b", "c")
    assert v["a"].to_str() == "4"
    assert v["b"].to_str() == "[1 2;3 4]"
    assert v["c"].to_str() == "3.142"


def test_genvarname_isstrprop():
    v = run_get("g = genvarname('my var!'); p = isstrprop('a1 b', 'alpha');",
                "g", "p")
    assert v["g"].to_str() == "myVar"
    assert v["p"].host().tolist() == [[True, False, False, True]]


def test_strtok_sscanf():
    v = run_get("[t, r] = strtok('  hello world');"
                "x = sscanf('1 2 3', '%f');", "t", "r", "x")
    assert v["t"].to_str() == "hello"
    assert v["r"].to_str() == " world"
    assert v["x"].host().reshape(-1).tolist() == [1.0, 2.0, 3.0]


def test_unicode_roundtrip():
    v = run_get("b = unicode2native('hi'); s = native2unicode(b);", "b", "s")
    assert v["b"].host().tolist() == [[104, 105]]
    assert v["s"].to_str() == "hi"


def test_compose():
    v = run_get("s = compose('%d-%d', [1 2; 3 4]);", "s")
    assert isinstance(v["s"], StringArray)
    items = [v["s"].data[i, 0] for i in range(2)]
    assert items == ["1-2", "3-4"]


def test_append_replace():
    v = run_get('a = append("foo", "bar"); b = replace("aXbXc", "X", "-");'
                "c = append('ab ', 'cd');", "a", "b", "c")
    assert v["a"].item() == "foobar"
    assert v["b"].item() == "a-b-c"
    assert v["c"].to_str() == "ab cd"   # append keeps trailing spaces


def test_patterns_matches():
    v = run_get('m = matches(["abc" "123"], digitsPattern);'
                'n = matches("hello", "hello");', "m", "n")
    assert v["m"].host().tolist() == [[False, True]]
    assert v["n"].host()[0, 0]


def test_between_transforms():
    v = run_get("a = replaceBetween('a<x>b', '<', '>', 'Y');"
                "b = eraseBetween('a<x>b', '<', '>');", "a", "b")
    assert v["a"].to_str() == "a<Y>b"
    assert v["b"].to_str() == "a<>b"


def test_erase_punct_urls_splitlines():
    v = run_get("a = erasePunctuation('a,b!c'); "
                "u = eraseURLs('go to https://x.io now');"
                "L = splitlines(sprintf('x\\ny'));", "a", "u", "L")
    assert v["a"].to_str() == "abc"
    assert v["u"].to_str() == "go to  now"
    assert isinstance(v["L"], CellArray)
    assert [e.to_str() for e in v["L"].data.reshape(-1)] == ["x", "y"]


def test_strip_strjust():
    v = run_get("a = strip('  pad  '); b = strip('xxaxx', 'x');"
                "c = strjust('ab   ', 'right');", "a", "b", "c")
    assert v["a"].to_str() == "pad"
    assert v["b"].to_str() == "a"
    assert v["c"].to_str() == "   ab"


def test_regexp_names_split_ignorecase():
    v = run_get("n = regexp('John Smith', '(?<first>\\w+)\\s(?<last>\\w+)', 'names');"
                "last = n.last;"
                "m0 = regexp('AbC', 'abc', 'match', 'ignorecase'); m = m0{1};"
                "p = regexp('a,b;c', '[,;]', 'split'); third = p{3};",
                "last", "m", "third")
    assert v["last"].to_str() == "Smith"
    assert v["m"].to_str() == "AbC"
    assert v["third"].to_str() == "c"
