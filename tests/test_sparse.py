"""Sparse matrix conformance (CSC semantics, ops, solve).

≙ reference SparseTensor (runmat-builtins/src/lib.rs:439-441) + sparse
builtins."""

import numpy as np

from helpers import run, scalar, val


def test_sparse_triplets_and_full():
    h = val("x = full(sparse([1 2 3], [1 2 3], [4 5 6]));")
    np.testing.assert_allclose(h, np.diag([4.0, 5, 6]))


def test_sparse_duplicate_accumulation():
    assert scalar("A = sparse([1 1], [1 1], [2 3]); x = full(A); x = x(1,1);") == 5.0


def test_sparse_from_dense_roundtrip():
    h = val("D = [1 0 2; 0 0 3]; x = full(sparse(D));")
    np.testing.assert_allclose(h, [[1, 0, 2], [0, 0, 3]])


def test_issparse_class_nnz():
    s = run("A = speye(4); z = issparse(A); k = class(A); n = nnz(A);")
    assert bool(s.get("z").host()[0, 0])
    assert s.get("k").to_str() == "double"
    assert float(s.get("n").host()[0, 0]) == 4.0


def test_sparse_add_stays_sparse():
    s = run("C = speye(3) + sparse([1], [3], [7], 3, 3); z = issparse(C); "
            "v = full(C); v = v(1,3);")
    assert bool(s.get("z").host()[0, 0])
    assert float(s.get("v").host()[0, 0]) == 7.0


def test_sparse_dense_matvec():
    h = val("A = sparse([1 2 3], [1 2 3], [4 5 6]); x = A * [1; 2; 3];")
    np.testing.assert_allclose(h.reshape(-1), [4, 10, 18])


def test_spmm_stays_sparse():
    s = run("S = speye(3) * sparse([1 2], [1 2], [3 4], 3, 3); z = issparse(S);")
    assert bool(s.get("z").host()[0, 0])


def test_sparse_solve_small():
    h = val("A = sparse([1 2 3], [1 2 3], [4 5 6]); x = A \\ [4; 10; 18];")
    np.testing.assert_allclose(h.reshape(-1), [1, 2, 3])


def test_sparse_cg_large_tridiagonal():
    assert scalar("n = 3000; e = ones(n,1); "
                  "L = spdiags([-e 2*e -e], [-1 0 1], n, n); "
                  "b = L * ones(n,1); x = norm(L \\ b - ones(n,1));") < 1e-8


def test_sparse_transpose():
    h = val("A = sparse([1], [2], [5], 2, 3); x = full(A');")
    np.testing.assert_allclose(h, [[0, 0], [5, 0], [0, 0]])


def test_sparse_elementwise_mul_with_dense():
    s = run("A = sparse([1 2], [1 2], [3 4]); B = A .* [2 0; 0 10]; "
            "z = issparse(B); v = full(B);")
    assert bool(s.get("z").host()[0, 0])
    np.testing.assert_allclose(s.get("v").host(), [[6, 0], [0, 40]])


def test_sparse_unary_nonzero_preserving():
    s = run("E = abs(sparse([1], [1], [-3])); z = issparse(E); v = full(E); v = v(1,1);")
    assert bool(s.get("z").host()[0, 0])
    assert float(s.get("v").host()[0, 0]) == 3.0


def test_sparse_indexing_read_write():
    assert scalar("A = sparse([1 2], [1 2], [3 4]); x = A(2,2);") == 4.0
    s = run("A = sparse([1 2], [1 2], [3 4]); A(1,2) = 9; z = issparse(A); "
            "v = full(A); v = v(1,2);")
    assert bool(s.get("z").host()[0, 0])
    assert float(s.get("v").host()[0, 0]) == 9.0


def test_spdiags_speye_spones():
    h = val("x = full(spdiags([1 2 3]', 0, 3, 3));")
    np.testing.assert_allclose(h, np.diag([1.0, 2, 3]))
    h = val("x = full(spones(sparse([1], [1], [42])));")
    assert h[0, 0] == 1.0


def test_find_nonzeros_on_sparse():
    h = val("A = sparse([2 1], [1 2], [7 8]); [i, j, v] = find(A); x = v;")
    assert sorted(h.reshape(-1).tolist()) == [7.0, 8.0]
    h = val("x = nonzeros(sparse([2 1], [1 2], [7 8]));")
    assert sorted(h.reshape(-1).tolist()) == [7.0, 8.0]


def test_sprand_density():
    s = run("rng(1); A = sprand(50, 40, 0.1); n = nnz(A); z = issparse(A);")
    n = float(s.get("n").host()[0, 0])
    assert 100 <= n <= 200
