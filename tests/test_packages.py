"""+package namespaces and import statements (≙ SURVEY §2.2
imports/packages; HIR callable resolution)."""

import numpy as np
import pytest

from runmat_tpu.session import Session


@pytest.fixture()
def pkgdir(tmp_path):
    pkg = tmp_path / "+mypkg"
    pkg.mkdir()
    (pkg / "twice.m").write_text("function y = twice(x)\ny = 2*x;\nend\n")
    (pkg / "helped.m").write_text(
        "function y = helped(x)\ny = helper(x) + 1;\nend\n"
        "function y = helper(x)\ny = x * 10;\nend\n")
    sub = pkg / "+sub"
    sub.mkdir()
    (sub / "f.m").write_text("function y = f(x)\ny = x - 1;\nend\n")
    return tmp_path


def _sess(pkgdir):
    s = Session(accelerate=False)
    s.search_path.insert(0, str(pkgdir))
    return s


def test_qualified_package_call(pkgdir):
    s = _sess(pkgdir)
    s.run_source("z = mypkg.twice(21);", "t")
    assert float(np.asarray(s.get("z").host()).reshape(-1)[0]) == 42.0


def test_nested_package_call(pkgdir):
    s = _sess(pkgdir)
    s.run_source("w = mypkg.sub.f(10);", "t")
    assert float(np.asarray(s.get("w").host()).reshape(-1)[0]) == 9.0


def test_package_local_helper_functions(pkgdir):
    s = _sess(pkgdir)
    s.run_source("v = mypkg.helped(4);", "t")
    assert float(np.asarray(s.get("v").host()).reshape(-1)[0]) == 41.0


def test_import_statement_unqualified(pkgdir):
    s = _sess(pkgdir)
    s.run_source("import mypkg.twice\nq = twice(5);", "t")
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 10.0


def test_import_wildcard(pkgdir):
    s = _sess(pkgdir)
    s.run_source("import mypkg.*\nq = twice(3); h = helped(1);", "t")
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 6.0
    assert float(np.asarray(s.get("h").host()).reshape(-1)[0]) == 11.0


def test_functional_import_and_listing(pkgdir):
    s = _sess(pkgdir)
    s.run_source("import('mypkg.twice'); L = import; n = numel(L); "
                 "q = twice(2);", "t")
    assert float(np.asarray(s.get("n").host()).reshape(-1)[0]) >= 1
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 4.0


def test_variable_shadows_import(pkgdir):
    s = _sess(pkgdir)
    s.run_source("import mypkg.twice\ntwice = 7; q = twice(1);", "t")
    # variable indexing wins over the import once assigned
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 7.0


def test_undefined_package_member_errors(pkgdir):
    s = _sess(pkgdir)
    r = s.execute("mypkg.nope(1);")
    assert r.error is not None
    assert "nope" in r.error.message


def test_unknown_package_still_undefined():
    s = Session(accelerate=False)
    r = s.execute("z = nosuchpkg.fn(1);")
    assert r.error is not None
