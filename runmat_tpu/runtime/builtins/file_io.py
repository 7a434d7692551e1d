"""File I/O builtins: fopen/fclose/fwrite family, save/load (.mat via numpy npz
compat container), csv read/write, fileread.

Reference parity: runmat-runtime/src/builtins/io/ (80k LoC: mat-files, csv,
text). Round-1 surface: text + csv + a .mat-compatible workspace save/load via
numpy (full MAT-file codec is a later milestone).
"""

from __future__ import annotations

import os

import numpy as np

from ...errors import MatError, bad_arg
from ...values import CellArray, MatArray, StringArray, StructArray, text_of
from ..registry import builtin

_FIDS: dict[int, object] = {}
_NEXT_FID = [3]


def write_fid(fid: int, s: str) -> None:
    f = _FIDS.get(fid)
    if f is None:
        raise MatError("MATLAB:badfid_mx", "Invalid file identifier.")
    f.write(s)


@builtin("fopen", category="io", min_in=1, max_in=2)
def m_fopen(path, mode=None):
    p = text_of(path)
    m = text_of(mode) if mode is not None else "r"
    pymode = {"r": "r", "w": "w", "a": "a", "r+": "r+", "w+": "w+",
              "rb": "rb", "wb": "wb", "rt": "r", "wt": "w"}.get(m, m)
    try:
        f = open(p, pymode)
    except OSError:
        return MatArray.scalar(-1.0)
    fid = _NEXT_FID[0]
    _NEXT_FID[0] += 1
    _FIDS[fid] = f
    return MatArray.scalar(float(fid))


@builtin("fclose", category="io", min_in=1, max_in=1)
def m_fclose(fid):
    from ...values import is_text
    if is_text(fid) and text_of(fid) == "all":
        for f in _FIDS.values():
            f.close()
        _FIDS.clear()
        return MatArray.scalar(0.0)
    i = int(fid.scalar_double())
    f = _FIDS.pop(i, None)
    if f is None:
        return MatArray.scalar(-1.0)
    f.close()
    return MatArray.scalar(0.0)


@builtin("fgetl", category="io", min_in=1, max_in=1)
def m_fgetl(fid):
    f = _FIDS.get(int(fid.scalar_double()))
    if f is None:
        raise MatError("MATLAB:badfid_mx", "Invalid file identifier.")
    line = f.readline()
    if line == "":
        return MatArray.scalar(-1.0)
    return MatArray.char_from_str(line.rstrip("\n"))


@builtin("fileread", category="io", min_in=1, max_in=1)
def m_fileread(path):
    with open(text_of(path), "r") as f:
        return MatArray.char_from_str(f.read())


@builtin("fwrite", category="io", min_in=2)
def m_fwrite(fid, data, *rest):
    f = _FIDS.get(int(fid.scalar_double()))
    if f is None:
        raise MatError("MATLAB:badfid_mx", "Invalid file identifier.")
    if isinstance(data, MatArray) and data.mclass == "char":
        f.write(data.to_str())
        return MatArray.scalar(float(data.size))
    raise bad_arg("fwrite", "Only char data supported for now.")


@builtin("csvwrite", category="io", min_in=2, max_in=2)
def m_csvwrite(path, m):
    np.savetxt(text_of(path), m.host().astype(np.float64), delimiter=",", fmt="%.10g")
    return None


@builtin("csvread", category="io", min_in=1, max_in=1)
def m_csvread(path):
    data = np.loadtxt(text_of(path), delimiter=",", ndmin=2)
    return MatArray(data, "double")


@builtin("writematrix", category="io", min_in=2, max_in=2)
def m_writematrix(m, path):
    np.savetxt(text_of(path), m.host().astype(np.float64), delimiter=",", fmt="%.10g")
    return None


@builtin("readmatrix", category="io", min_in=1, max_in=1)
def m_readmatrix(path):
    data = np.loadtxt(text_of(path), delimiter=",", ndmin=2)
    return MatArray(data, "double")


@builtin("save", category="io", min_in=1, pass_ctx=True)
def m_save(path, *names, ctx=None):
    """save('file.mat', 'x', 'y') — Level-5 MAT-file (runmat_tpu/matio.py)."""
    from ...matio import save_mat
    p = text_of(path)
    if not p.endswith(".mat"):
        p += ".mat"
    frame = ctx.frame
    to_save = {}
    sel = [text_of(n) for n in names] if names else \
        [k for k in frame.vars if not k.startswith("@")]
    for n in sel:
        v = frame.vars.get(n)
        if v is None:
            raise MatError("MATLAB:save:variableNotFound",
                           f"Variable '{n}' not found.")
        to_save[n] = v
    save_mat(p, to_save)
    return None


@builtin("load", category="io", min_in=1, pass_ctx=True, pass_nargout=True)
def m_load(path, *names, ctx=None, nargout=0):
    from ...matio import load_mat
    p = text_of(path)
    if not os.path.exists(p) and os.path.exists(p + ".mat"):
        p += ".mat"
    data = load_mat(p)
    sel = [text_of(n) for n in names] if names else list(data)
    loaded = {}
    for n in sel:
        if n not in data:
            raise MatError("MATLAB:load:variableNotFound",
                           f"Variable '{n}' not found in '{p}'.")
        loaded[n] = data[n]
    if nargout >= 1:
        out = StructArray.scalar({k: v for k, v in loaded.items()})
        return out
    ctx.frame.vars.update(loaded)
    return None


@builtin("delete", category="io", min_in=1, max_in=1)
def m_delete(path):
    p = text_of(path)
    if os.path.exists(p):
        os.remove(p)
    return None


@builtin("tempdir", category="io", min_in=0, max_in=0)
def m_tempdir():
    import tempfile
    return MatArray.char_from_str(tempfile.gettempdir() + os.sep)


@builtin("tempname", category="io", min_in=0, max_in=0)
def m_tempname():
    import tempfile
    fd, name = tempfile.mkstemp()
    os.close(fd)
    os.remove(name)
    return MatArray.char_from_str(name)


@builtin("fullfile", category="io", min_in=1)
def m_fullfile(*parts):
    return MatArray.char_from_str(os.path.join(*[text_of(p) for p in parts]))


@builtin("filesep", category="io", min_in=0, max_in=0)
def m_filesep():
    return MatArray.char_from_str(os.sep)


@builtin("pwd", category="io", min_in=0, max_in=0)
def m_pwd():
    return MatArray.char_from_str(os.getcwd())


@builtin("cd", category="io", min_in=0, max_in=1)
def m_cd(path=None):
    if path is not None:
        os.chdir(text_of(path))
    return MatArray.char_from_str(os.getcwd())


@builtin("mkdir", category="io", min_in=1, max_in=1)
def m_mkdir(path):
    os.makedirs(text_of(path), exist_ok=True)
    return MatArray.logical_scalar(True)


@builtin("jsonencode", category="io", min_in=1, max_in=1)
def m_jsonencode(v):
    import json

    def enc(x):
        if isinstance(x, MatArray):
            if x.mclass == "char":
                return x.to_str()
            h = x.host()
            if x.mclass == "logical":
                h = h.astype(bool)
            if h.size == 1:
                val = h.reshape(-1)[0]
                return bool(val) if x.mclass == "logical" else \
                    (int(val) if float(val) == int(val) and x.mclass != "single" else float(val))
            return h.tolist()
        if isinstance(x, StringArray):
            return x.item() if x.size == 1 else [s for s in x.data.reshape(-1)]
        if isinstance(x, CellArray):
            return [enc(e) for e in x.data.reshape(-1, order="F")]
        if isinstance(x, StructArray) and x.size == 1:
            return {k: enc(x.get_scalar_field(k)) for k in x.fields}
        raise bad_arg("jsonencode", "Unsupported value.")

    return MatArray.char_from_str(json.dumps(enc(v)))


@builtin("jsondecode", category="io", min_in=1, max_in=1)
def m_jsondecode(s):
    import json

    def dec(x):
        if isinstance(x, bool):
            return MatArray.logical_scalar(x)
        if isinstance(x, (int, float)):
            return MatArray.scalar(float(x))
        if isinstance(x, str):
            return MatArray.char_from_str(x)
        if x is None:
            return MatArray.empty()
        if isinstance(x, list):
            if all(isinstance(e, (int, float)) and not isinstance(e, bool) for e in x):
                return MatArray(np.array(x, dtype=np.float64).reshape(-1, 1), "double")
            data = np.empty((len(x), 1), dtype=object)
            for i, e in enumerate(x):
                data[i, 0] = dec(e)
            return CellArray(data)
        if isinstance(x, dict):
            return StructArray.scalar({k: dec(v) for k, v in x.items()})
        raise bad_arg("jsondecode", "Unsupported JSON value.")

    return dec(json.loads(text_of(s)))
