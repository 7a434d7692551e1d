"""Native components: ctypes bindings + lazy build.

Reference parity: the reference's performance-critical native components
(runmat-turbine JIT, hot kernels). The shared library builds from
native/*.cpp on first use (g++, cached next to the source or in
~/.cache/runmat_tpu) and every caller degrades gracefully to the Python path
when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_LIB = None
_TRIED = False


def _src_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def turbine() -> object:
    """The libturbine handle, building it if necessary; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_src_dir(), "turbine.cpp")
    if not os.path.exists(src):
        return None
    candidates = [os.path.join(_src_dir(), "libturbine.so"),
                  os.path.expanduser("~/.cache/runmat_tpu/libturbine.so")]
    lib_path = next((p for p in candidates if os.path.exists(p)
                     and os.path.getmtime(p) >= os.path.getmtime(src)), None)
    if lib_path is None:
        for target in candidates:
            try:
                os.makedirs(os.path.dirname(target), exist_ok=True)
                subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                                "-std=c++17", "-o", target, src],
                               check=True, capture_output=True, timeout=120)
                lib_path = target
                break
            except (OSError, subprocess.SubprocessError):
                continue
        if lib_path is None:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.turbine_run.restype = ctypes.c_int32
        lib.turbine_run.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _LIB = lib
    except OSError:
        return None
    return _LIB
