"""Misc batch: stats plots, Delaunay, griddedInterpolant, symbolic extras,
TCP, matfile."""

import numpy as np

from helpers import fails, run, run_get


def test_stats_plots_run():
    s = run("rng(0); x = randn(50, 1);"
            "boxplot(x); cdfplot(x); qqplot(x);"
            "binscatter(randn(100,1), randn(100,1));"
            "scatter(1:10, 2*(1:10)); lsline; refline(1, 0);")
    assert s is not None


def test_delaunay_triangulation():
    v = run_get("dt = delaunayTriangulation([0 0; 1 0; 0 1; 1 1]);"
                "C = dt.ConnectivityList; P = dt.Points;"
                "fb = freeBoundary(dt);"
                "n = nearestNeighbor(dt, [0.9 0.9]);"
                "loc = pointLocation(dt, [0.2 0.2]);"
                "out = pointLocation(dt, [5 5]);",
                "C", "P", "fb", "n", "loc", "out")
    assert v["C"].shape[1] == 3 and v["C"].shape[0] == 2
    assert v["P"].shape == (4, 2)
    assert v["fb"].shape[0] == 4      # unit square hull has 4 edges
    assert v["n"].host()[0, 0] == 4.0
    assert np.isfinite(v["loc"].host()[0, 0])
    assert np.isnan(v["out"].host()[0, 0])


def test_delaunay_legacy_name():
    v = run_get("dt = DelaunayTri([0 0; 2 0; 0 2]); c = dt.ConnectivityList;", "c")
    assert v["c"].shape == (1, 3)


def test_gridded_interpolant_1d():
    v = run_get("F = griddedInterpolant([1 2 3], [10 20 30]);"
                "y = F(1.5); m = F.Method;"
                "G = griddedInterpolant([1 2 3], [10 20 30], 'nearest');"
                "z = G(1.4);", "y", "m", "z")
    assert v["y"].host()[0, 0] == 15.0
    assert v["m"].to_str() == "linear"
    assert v["z"].host()[0, 0] == 10.0


def test_gridded_interpolant_2d():
    v = run_get("F = griddedInterpolant([1 2], [1 2 3], [1 2 3; 4 5 6]);"
                "y = F(1.5, 2);", "y")
    assert v["y"].host()[0, 0] == 3.5


def test_interp1q():
    v = run_get("y = interp1q([1; 2; 3], [2; 4; 6], [1.5; 2.5]);", "y")
    assert v["y"].host().reshape(-1).tolist() == [3.0, 5.0]


def test_symbolic_limit():
    v = run_get("syms x; L = limit(sin(x)/x, x, 0); d = double(L);"
                "M = limit(1/x, x, 0, 'right'); dm = double(M);", "d", "dm")
    assert v["d"].host()[0, 0] == 1.0
    assert np.isinf(v["dm"].host()[0, 0])


def test_symbolic_piecewise_digits():
    v = run_get("syms x; p = piecewise(x < 0, -1, x >= 0, 1);"
                "a = double(subs(p, x, -5)); b = double(subs(p, x, 3));"
                "old = digits(50); now_ = digits; digits(old);",
                "a", "b", "now_")
    assert v["a"].host()[0, 0] == -1.0
    assert v["b"].host()[0, 0] == 1.0
    assert v["now_"].host()[0, 0] == 50.0


def test_tcp_roundtrip():
    import threading
    from runmat_tpu.session import Session
    s = Session(accelerate=False)
    r1 = s.execute("srv = tcpserver(0);")  # port 0 -> ephemeral
    assert r1.error is None, r1.error
    port = s.get("srv").sock.getsockname()[1]

    def client():
        import socket, time
        time.sleep(0.1)
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(b"hello\n")
        data = c.recv(100)
        c.close()
        results.append(data)

    results = []
    t = threading.Thread(target=client)
    t.start()
    r2 = s.execute("conn = accept(srv); L = readline(conn);"
                   "write(conn, 'ack');")
    t.join()
    assert r2.error is None, r2.error
    assert s.get("L").item() == "hello"
    assert results[0] == b"ack"


def test_matfile(tmp_path):
    p = tmp_path / "m.mat"
    v = run_get(f"m = matfile('{p}', 'Writable', true);"
                "m.x = [1 2 3];"
                f"m2 = matfile('{p}'); y = m2.x; names = m2.who();",
                "y", "names")
    assert v["y"].host().tolist() == [[1.0, 2.0, 3.0]]
    assert [e.to_str() for e in v["names"].data.reshape(-1)] == ["x"]


def test_matfile_not_writable(tmp_path):
    p = tmp_path / "ro.mat"
    fails(f"m = matfile('{p}'); m.x = 5;", "NotWritable")


def test_namedargs2cell_empty_gpuinfo():
    v = run_get("s.a = 1; s.b = 'two'; c = namedargs2cell(s);"
                "e = empty(0, 3); g = gpuInfo; av = g.Available;",
                "c", "e", "av")
    assert v["c"].size == 4
    assert v["c"].data[0, 0].to_str() == "a"
    assert v["e"].shape == (0, 3)
    assert v["av"].host()[0, 0] in (True, False)


def test_runtests(tmp_path):
    (tmp_path / "test_ok.m").write_text("x = 1 + 1; assert(x == 2);")
    (tmp_path / "test_bad.m").write_text("error('boom');")
    v = run_get(f"r = runtests('{tmp_path}');", "r")
    names = [v["r"].fields["Name"][i, 0].to_str() for i in range(2)]
    passed = [bool(v["r"].fields["Passed"][i, 0].host()[0, 0]) for i in range(2)]
    assert names == ["test_bad.m", "test_ok.m"]
    assert passed == [False, True]
