"""Sparse spectral estimators + graph flow/centrality depth: svds, condest,
sprandsym, tensorprod, sparse eigs ('smallestabs' names, the to_scipy
bridge fix), maxflow (Edmonds-Karp), centrality (degree/closeness/pagerank/
betweenness). Exceeds the reference's registered surface where noted."""

import numpy as np

from helpers import run


def r_of(src, name="r"):
    return float(run(src).get(name).host().reshape(-1)[0])


def test_eigs_sparse_bridge_and_which_names():
    assert abs(r_of("A = spdiags((1:10)', 0, 10, 10); d = eigs(A, 3); "
                "r = d(1);") - 10.0) < 1e-9
    assert abs(r_of("A = spdiags((1:10)', 0, 10, 10); "
                    "d = eigs(A, 2, 'smallestabs'); r = d(1);") - 1.0) < 1e-9
    assert abs(r_of("A = spdiags((1:10)', 0, 10, 10); "
                    "d = eigs(A, 2, 'largestreal'); r = max(d);") - 10.0) < 1e-9


def test_svds_values_and_factors():
    s = run("A = magic(6); s2 = svds(A, 2); "
            "sf = svd(A); [U, S, V] = svds(A, 2); "
            "e1 = abs(s2(1) - sf(1)); orth = norm(U'*U - eye(2)); "
            "rec = norm(A*V - U*S);")
    assert float(s.get("e1").host()) < 1e-9
    assert float(s.get("orth").host()) < 1e-12
    assert float(s.get("rec").host()) < 1e-9


def test_svds_sparse_and_smallest():
    assert abs(r_of("S = speye(10) * 3; s = svds(S, 2); r = s(1);") - 3) < 1e-9
    v = r_of("s = svds(diag([5 4 3 2 1]), 2, 'smallest'); r = s(1);")
    assert abs(v - 1.0) < 1e-9


def test_condest_matches_exact_one_norm_condition():
    # diagonal: cond1 = max|d| * max|1/d|
    assert abs(r_of("r = condest(diag([4 2 1]));") - 4.0) < 1e-12
    assert abs(r_of("r = condest(speye(6) * 5);") - 1.0) < 1e-12
    assert r_of("r = double(isinf(condest(zeros(3))));") == 1.0


def test_sprandsym_symmetric_with_density():
    s = run("rng(3); S = sprandsym(12, 0.2); "
            "sym = issymmetric(full(S)); nz = nnz(S);")
    assert bool(s.get("sym").host().all())
    assert float(s.get("nz").host()) > 0


def test_tensorprod_contraction_outer_all():
    assert r_of("C = tensorprod(rand(2,3), rand(3,4), 2, 1); "
                "r = size(C, 2);") == 4.0
    # matches mtimes for the matrix case
    assert r_of("A = rand(3); B = rand(3); "
                "r = norm(tensorprod(A, B, 2, 1) - A*B);") < 1e-12
    assert r_of("r = tensorprod(ones(2,2), 2*ones(2,2), 'all');") == 8.0
    assert r_of("C = tensorprod([1 2], [3 4]); r = numel(C);") == 4.0


def test_maxflow_classic_networks():
    assert r_of("G = digraph([1 1 2 3], [2 3 4 4], [10 5 5 10]); "
                "r = maxflow(G, 1, 4);") == 10.0
    assert r_of("G = digraph([1 2], [2 3], [7 3]); "
                "r = maxflow(G, 1, 3);") == 3.0
    # disconnected -> zero flow
    assert r_of("G = digraph([1], [2], [4]); G = addnode(G, 1); "
                "r = maxflow(G, 1, 3);") == 0.0


def test_centrality_kinds():
    assert r_of("G = graph([1 2], [2 3]); c = centrality(G, 'degree'); "
                "r = c(2);") == 2.0
    # path graph: middle node carries the single shortest path
    assert r_of("G = graph([1 2], [2 3]); "
                "c = centrality(G, 'betweenness'); r = c(2);") == 1.0
    # ring: pagerank uniform
    assert r_of("G = digraph([1 2 3], [2 3 1]); "
                "c = centrality(G, 'pagerank'); "
                "r = double(abs(c(1) - 1/3) < 1e-9);") == 1.0
    assert r_of("G = graph([1 2], [2 3]); c = centrality(G, 'closeness'); "
                "r = double(c(2) > c(1));") == 1.0
