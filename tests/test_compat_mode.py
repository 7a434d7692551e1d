"""Strict-MATLAB vs extensions compat mode (≙ ParserOptions CompatMode,
runmat-parser/src/options.rs + the HIR spawn/await extension gates)."""

from runmat_tpu.session import Session


def test_extended_mode_has_extensions():
    s = Session(accelerate=False)
    assert s.compat == "extended"
    r = s.execute("h = spawn(@() 1 + 1); v = await(h);")
    assert r.error is None
    assert float(s.get("v").host()) == 2.0


def test_strict_mode_hides_extensions(monkeypatch):
    monkeypatch.setenv("RUNMAT_TPU_COMPAT", "strict")
    s = Session(accelerate=False)
    assert s.compat == "strict"
    r = s.execute("h = spawn(@() 1 + 1);")
    assert r.error is not None
    assert "Undefined" in r.error.identifier or \
        "Undefined" in r.error.message
    # core MATLAB surface unaffected
    r2 = s.execute("x = sum(1:10);")
    assert r2.error is None
    # parfeval is real MATLAB (PCT): stays available in strict mode
    r3 = s.execute("f = parfeval(@plus, 1, 1, 2); v = fetchOutputs(f);")
    assert r3.error is None


def test_extension_flag_on_registry():
    from runmat_tpu.runtime import registry
    registry.ensure_loaded()
    assert registry.lookup("spawn").extension
    assert registry.lookup("await").extension
    assert not registry.lookup("sin").extension
    assert not registry.lookup("parfeval").extension
