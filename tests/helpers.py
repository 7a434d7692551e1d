"""Shared test helpers: run MATLAB source, extract workspace values."""

import numpy as np

from runmat_tpu.session import Session
from runmat_tpu.values import MatArray


def run(src: str, accelerate=False) -> Session:
    s = Session(accelerate=accelerate)
    r = s.execute(src)
    if r.error is not None:
        raise r.error
    return s


def val(src: str, name: str = "x", accelerate=False):
    """Run src, return variable as numpy array."""
    s = run(src, accelerate)
    v = s.get(name)
    assert isinstance(v, MatArray), f"{name} is {type(v)}"
    return v.host()


def scalar(src: str, name: str = "x", accelerate=False) -> float:
    h = val(src, name, accelerate)
    assert h.size == 1
    return float(h.reshape(-1)[0].real)


def run_get(src: str, *names: str, accelerate=False) -> dict:
    """Run src, return {name: value} for the requested workspace variables."""
    s = run(src, accelerate)
    return {n: s.get(n) for n in names}


def out(src: str, accelerate=False) -> str:
    s = Session(accelerate=accelerate)
    r = s.execute(src)
    if r.error is not None:
        raise r.error
    return r.output


def fails(src: str, ident_part: str = "") -> str:
    s = Session(accelerate=False)
    r = s.execute(src)
    assert r.error is not None, f"expected error from: {src}"
    if ident_part:
        assert ident_part in r.error.identifier, \
            f"expected '{ident_part}' in '{r.error.identifier}'"
    return r.error.identifier
