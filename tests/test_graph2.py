"""Graph algorithms, grouping utilities, color conversions."""

import numpy as np

from helpers import run_get


def test_bfs_dfs():
    v = run_get("g = digraph([1 1 2 3], [2 3 4 4]);"
                "b = bfsearch(g, 1); d = dfsearch(g, 1);", "b", "d")
    assert v["b"].host().reshape(-1).tolist() == [1.0, 2.0, 3.0, 4.0]
    assert v["d"].host().reshape(-1).tolist() == [1.0, 2.0, 4.0, 3.0]


def test_conncomp_distances():
    v = run_get("g = graph([1 3], [2 4]); c = conncomp(g);"
                "h = graph([1 2], [2 3], [1 2]); D = distances(h);", "c", "D")
    assert v["c"].host().reshape(-1).tolist() == [1.0, 1.0, 2.0, 2.0]
    D = v["D"].host()
    assert D[0, 2] == 3.0 and D[0, 1] == 1.0


def test_degrees_neighbors():
    v = run_get("g = digraph([1 1 2], [2 3 3]);"
                "i = indegree(g); o = outdegree(g); n = neighbors(g, 3);"
                "p = predecessors(g, 3); s = successors(g, 1);",
                "i", "o", "n", "p", "s")
    assert v["i"].host().reshape(-1).tolist() == [0.0, 1.0, 2.0]
    assert v["o"].host().reshape(-1).tolist() == [2.0, 1.0, 0.0]
    assert v["n"].host().reshape(-1).tolist() == [1.0, 2.0]
    assert v["p"].host().reshape(-1).tolist() == [1.0, 2.0]
    assert v["s"].host().reshape(-1).tolist() == [2.0, 3.0]


def test_toposort_treelayout():
    v = run_get("g = digraph([1 2 1], [2 3 3]); t = toposort(g);"
                "[x, y] = treelayout([0 1 1]);", "t", "x", "y")
    assert v["t"].host().reshape(-1).tolist() == [1.0, 2.0, 3.0]
    assert v["y"].host()[0, 0] == 1.0   # root at top
    assert v["x"].size == 3


def test_findedge():
    v = run_get("g = graph([1 2], [2 3]); e = findedge(g, 2, 3);", "e")
    assert v["e"].host()[0, 0] == 2.0


def test_grouping():
    v = run_get("[gi, gn] = grp2idx([10 20 10 30]);"
                "G = findgroups([1 1 2 2]); c = groupcounts([5 5 7]);",
                "gi", "gn", "G", "c")
    assert v["gi"].host().reshape(-1).tolist() == [1.0, 2.0, 1.0, 3.0]
    assert v["G"].host().reshape(-1).tolist() == [1.0, 1.0, 2.0, 2.0]
    assert v["c"].host().reshape(-1).tolist() == [2.0, 1.0]


def test_splitapply():
    v = run_get("G = findgroups([1 1 2 2]);"
                "m = splitapply(@mean, [10 20 30 50]', G);", "m")
    assert v["m"].host().reshape(-1).tolist() == [15.0, 40.0]


def test_discretize_combinations():
    v = run_get("d = discretize([1 5 9], [0 4 8 12]);"
                "c = combinations([1 2], [10 20]); v2 = combvec([1 2], [10 20]);",
                "d", "c", "v2")
    assert v["d"].host().tolist() == [[1.0, 2.0, 3.0]]
    assert v["c"].host().tolist() == [[1.0, 10.0], [1.0, 20.0], [2.0, 10.0], [2.0, 20.0]]
    assert v["v2"].host().tolist() == [[1.0, 1.0, 2.0, 2.0], [10.0, 20.0, 10.0, 20.0]]


def test_hsv_roundtrip():
    v = run_get("img = zeros(1,1,3); img(1,1,1) = 1;"  # pure red
                "h = rgb2hsv(img); r = hsv2rgb(h);", "h", "r")
    h = v["h"].host().reshape(-1)
    assert np.allclose(h, [0.0, 1.0, 1.0])
    assert np.allclose(v["r"].host().reshape(-1), [1.0, 0.0, 0.0])


def test_lab_roundtrip():
    v = run_get("img = ones(1,1,3) * 0.5; L = rgb2lab(img); r = lab2rgb(L);",
                "L", "r")
    L = v["L"].host().reshape(-1)
    assert abs(L[1]) < 0.5 and abs(L[2]) < 0.5   # gray: a*, b* ~ 0
    assert np.allclose(v["r"].host().reshape(-1), 0.5, atol=1e-3)


def test_im2uint_ind2rgb():
    v = run_get("u = im2uint8(0.5); w = im2uint16(uint8(255));"
                "rgb = ind2rgb([1 2], [1 0 0; 0 1 0]);", "u", "w", "rgb")
    assert v["u"].host()[0, 0] == 128
    assert v["w"].host()[0, 0] == 65535
    assert v["rgb"].host()[0, 0, 0] == 1.0
    assert v["rgb"].host()[0, 1, 1] == 1.0


def test_imhist():
    v = run_get("[c, x] = imhist(uint8([0 255]), 2);", "c", "x")
    assert v["c"].host().reshape(-1).tolist() == [1.0, 1.0]
