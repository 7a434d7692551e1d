"""I/O batch 2: fs ops, filetext, tabular, archives, audio, xml, diary,
plus the filesystem provider abstraction."""

import os

import numpy as np
import pytest

from helpers import run, run_get


def test_fileparts_pathsep():
    v = run_get("[d, n, e] = fileparts('/tmp/foo.txt'); s = pathsep;",
                "d", "n", "e", "s")
    assert v["d"].to_str() == "/tmp"
    assert v["n"].to_str() == "foo"
    assert v["e"].to_str() == ".txt"
    assert v["s"].to_str() == os.pathsep


def test_isfile_isfolder_dir(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("hi")
    v = run_get(f"f = isfile('{p}'); d = isfolder('{tmp_path}');"
                f"e = dir('{tmp_path}');", "f", "d", "e")
    assert v["f"].host()[0, 0]
    assert v["d"].host()[0, 0]
    assert v["e"].shape[0] == 1
    assert v["e"].fields["name"][0, 0].to_str() == "a.txt"


def test_copy_move_rm(tmp_path):
    src = tmp_path / "x.txt"
    src.write_text("data")
    dst = tmp_path / "y.txt"
    mv = tmp_path / "z.txt"
    sub = tmp_path / "sub"
    v = run_get(
        f"ok1 = copyfile('{src}', '{dst}');"
        f"ok2 = movefile('{dst}', '{mv}');"
        f"mkdir('{sub}'); ok3 = rmdir('{sub}');",
        "ok1", "ok2", "ok3")
    assert v["ok1"].host()[0, 0] and v["ok2"].host()[0, 0] and v["ok3"].host()[0, 0]
    assert mv.read_text() == "data"
    assert not dst.exists() and not sub.exists()


def test_system_prefs():
    v = run_get("[st, out] = system('echo hello');"
                "setpref('g', 'k', 42); p = getpref('g', 'k');"
                "q = ispref('g', 'k'); rmpref('g', 'k'); r = ispref('g', 'k');",
                "st", "out", "p", "q", "r")
    assert v["st"].host()[0, 0] == 0.0
    assert "hello" in v["out"].to_str()
    assert v["p"].host()[0, 0] == 42.0
    assert v["q"].host()[0, 0] and not v["r"].host()[0, 0]


def test_fid_text_ops(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("line1\nline2\n")
    v = run_get(
        f"fid = fopen('{p}'); a = fgets(fid); e1 = feof(fid);"
        "b = fgets(fid); e2 = feof(fid); frewind(fid); c = fgets(fid);"
        "fclose(fid);", "a", "e1", "b", "e2", "c")
    assert v["a"].to_str() == "line1\n"
    assert not v["e1"].host()[0, 0]
    assert v["b"].to_str() == "line2\n"
    assert v["e2"].host()[0, 0]
    assert v["c"].to_str() == "line1\n"


def test_fread(tmp_path):
    p = tmp_path / "b.bin"
    p.write_bytes(bytes([1, 2, 3, 4]))
    v = run_get(f"fid = fopen('{p}', 'rb'); d = fread(fid, 4, 'uint8'); fclose(fid);",
                "d")
    assert v["d"].host().reshape(-1).tolist() == [1.0, 2.0, 3.0, 4.0]


def test_readlines_writelines(tmp_path):
    p = tmp_path / "w.txt"
    v = run_get(f'writelines(["a" "b" "c"], \'{p}\'); L = readlines(\'{p}\');', "L")
    assert [v["L"].data[i, 0] for i in range(3)] == ["a", "b", "c"]


def test_dlm_roundtrip(tmp_path):
    p = tmp_path / "m.txt"
    v = run_get(f"dlmwrite('{p}', [1 2; 3 4]); M = dlmread('{p}');", "M")
    assert v["M"].host().tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_xlsx_roundtrip(tmp_path):
    p = tmp_path / "wb.xlsx"
    v = run_get(f"xlswrite('{p}', [1.5 2; 3 4]); N = xlsread('{p}');", "N")
    assert v["N"].host().tolist() == [[1.5, 2.0], [3.0, 4.0]]


def test_xlsx_cells(tmp_path):
    p = tmp_path / "wb2.xlsx"
    v = run_get(f"xlswrite('{p}', {{'name', 2; 'x', 4}});"
                f"[num, txt] = xlsread('{p}');", "num", "txt")
    assert v["num"].host()[0, 1] == 2.0
    assert v["txt"].data[0, 0].to_str() == "name"


def test_gzip_roundtrip(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("payload")
    v = run_get(f"g = gzip('{p}'); delete('{p}'); u = gunzip('{p}.gz');"
                f"s = fileread('{p}');", "s")
    assert v["s"].to_str() == "payload"


def test_audio_roundtrip(tmp_path):
    p = tmp_path / "t.wav"
    v = run_get(f"y = sin(2*pi*440*(0:999)/8000)';"
                f"audiowrite('{p}', y, 8000);"
                f"[z, fsr] = audioread('{p}'); info = audioinfo('{p}');",
                "y", "z", "fsr", "info")
    assert v["fsr"].host()[0, 0] == 8000.0
    assert np.allclose(v["z"].host(), v["y"].host(), atol=1e-3)
    assert v["info"].get_scalar_field("NumChannels").host()[0, 0] == 1.0


def test_url_codecs():
    v = run_get("e = urlencode('a b&c'); d = urldecode(e);", "e", "d")
    assert v["e"].to_str() == "a%20b%26c"
    assert v["d"].to_str() == "a b&c"


def test_no_egress():
    from helpers import fails
    fails("webwrite('https://x.io', 1);", "webservices")
    fails("sendmail('a@b.c', 'hi');", "webservices")


def test_diary(tmp_path):
    p = tmp_path / "d.log"
    run(f"diary('{p}'); disp('captured'); diary off;")
    assert "captured" in p.read_text()


def test_xml_roundtrip(tmp_path):
    p = tmp_path / "doc.xml"
    v = run_get(
        "s.root.title.Text = 'hello'; s.root.count.Text = '3';"
        f"xmlwrite('{p}', s); d = xmlread('{p}');", "d")
    root = v["d"].get_scalar_field("root")
    assert root.get_scalar_field("title").get_scalar_field("Text").to_str() == "hello"


def test_readstruct_json(tmp_path):
    p = tmp_path / "s.json"
    p.write_text('{"a": 1, "b": "two"}')
    v = run_get(f"s = readstruct('{p}');", "s")
    assert v["s"].get_scalar_field("a").host()[0, 0] == 1.0


def test_memmapfile(tmp_path):
    p = tmp_path / "mm.bin"
    p.write_bytes(bytes([5, 6, 7]))
    v = run_get(f"m = memmapfile('{p}');", "m")
    assert v["m"].get_scalar_field("Data").host().reshape(-1).tolist() == [5.0, 6.0, 7.0]


def test_memory_fs_provider():
    from runmat_tpu.fs import MemoryFsProvider, set_fs_provider, reset_fs_provider
    mem = MemoryFsProvider()
    set_fs_provider(mem)
    try:
        s = run("writelines([\"x\" \"y\"], '/virt/f.txt');"
                "L = readlines('/virt/f.txt'); ok = isfile('/virt/f.txt');")
        assert s.get("ok").host()[0, 0]
        assert mem.files["/virt/f.txt"] == b"x\ny\n"
    finally:
        reset_fs_provider()


def test_sandbox_fs_provider(tmp_path):
    from runmat_tpu.fs import SandboxFsProvider, set_fs_provider, reset_fs_provider
    from runmat_tpu.errors import MatError
    set_fs_provider(SandboxFsProvider(str(tmp_path)))
    try:
        (tmp_path / "ok.txt").write_text("fine")
        s = run(f"t = fileread('{tmp_path}/ok.txt');")
        assert s.get("t").to_str() == "fine"
        with pytest.raises(MatError):
            from runmat_tpu.fs import fs
            fs().read_bytes("/etc/passwd")
    finally:
        reset_fs_provider()
