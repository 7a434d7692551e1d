"""Indexing conformance (≙ runmat-vm/src/indexing tests + vm/tests/indexing.rs):
linear/multi-dim/logical reads & writes, end-arithmetic, growth, deletion,
column-major order."""

import numpy as np
import pytest

from helpers import run, val, scalar, fails


# ---------------------------------------------------------------------- reads

def test_linear_read_column_major():
    # A(3) on [1 2; 3 4] is 2 (column-major)
    assert scalar("A = [1 2; 3 4]; x = A(3);") == 2.0
    assert scalar("A = [1 2; 3 4]; x = A(2);") == 3.0


def test_colon_read():
    h = val("A = [1 2; 3 4]; x = A(:);")
    assert np.array_equal(h, [[1], [3], [2], [4]])


def test_2d_read():
    assert scalar("A = magic_like(); x = A(2, 3);".replace("magic_like()", "[1 2 3; 4 5 6]")) == 6.0
    h = val("A = [1 2 3; 4 5 6]; x = A(1, [1 3]);")
    assert np.array_equal(h, [[1, 3]])
    h = val("A = [1 2 3; 4 5 6]; x = A(:, 2);")
    assert np.array_equal(h, [[2], [5]])


def test_end_arith():
    assert scalar("v = 10:10:50; x = v(end);") == 50.0
    assert scalar("v = 10:10:50; x = v(end-1);") == 40.0
    h = val("A = [1 2 3; 4 5 6]; x = A(end, end-1);")
    assert h[0, 0] == 5
    h = val("v = 1:10; x = v(2:end-1);")
    assert np.array_equal(h, [np.arange(2, 10)])


def test_end_in_nested_index():
    # inner end refers to the inner array
    assert scalar("a = [1 2 3]; b = [10 20]; x = a(b(end)/10);") == 2.0


def test_logical_mask_read():
    h = val("v = [5 10 15 20]; x = v(v > 7);")
    assert np.array_equal(h, [[10, 15, 20]])
    h = val("v = [5; 10; 15]; x = v(logical([1 0 1]));")
    assert np.array_equal(h, [[5], [15]])


def test_vector_orientation_rules():
    # row base, column index -> row result
    h = val("v = 1:5; x = v([1; 3]);")
    assert h.shape == (1, 2)
    # matrix index on vector base -> shape of index
    h = val("v = 1:6; x = v([1 2; 3 4]);")
    assert h.shape == (2, 2)
    assert np.array_equal(h, [[1, 2], [3, 4]])


def test_trailing_dim_fold():
    # A(i, j) on 3-D folds trailing dims
    assert scalar("A = reshape(1:8, [2 2 2]); x = A(1, 3);") == 5.0


def test_index_out_of_bounds():
    fails("v = [1 2 3]; x = v(4);", "badsubscript")
    fails("v = [1 2 3]; x = v(0);", "badsubscript")
    fails("v = [1 2 3]; x = v(1.5);", "badsubscript")


def test_index_chained_expression():
    # indexing a call result through parens
    assert scalar("x = max([3 1 2]);") == 3.0
    assert scalar("c = {[1 2 3]}; x = c{1}(2);") == 2.0


# --------------------------------------------------------------------- writes

def test_scalar_write():
    h = val("A = zeros(2); A(1, 2) = 5; x = A;")
    assert np.array_equal(h, [[0, 5], [0, 0]])


def test_linear_write():
    h = val("A = [1 2; 3 4]; A(3) = 9; x = A;")
    assert np.array_equal(h, [[1, 9], [3, 4]])


def test_colon_write():
    h = val("A = zeros(2, 2); A(:) = [1 2 3 4]; x = A;")
    assert np.array_equal(h, [[1, 3], [2, 4]])  # column-major fill
    h = val("A = ones(2); A(:, 1) = 7; x = A;")
    assert np.array_equal(h, [[7, 1], [7, 1]])


def test_grow_on_write():
    h = val("v = [1 2]; v(5) = 9; x = v;")
    assert np.array_equal(h, [[1, 2, 0, 0, 9]])
    h = val("A = [1]; A(3, 3) = 2; x = x_from(A);".replace("x_from(A)", "A"))
    assert h.shape == (3, 3) and h[2, 2] == 2 and h[0, 0] == 1


def test_grow_from_empty():
    h = val("clear v; v(3) = 5; x = v;")
    assert np.array_equal(h, [[0, 0, 5]])


def test_column_vector_grow():
    h = val("v = [1; 2]; v(4) = 9; x = v;")
    assert h.shape == (4, 1)


def test_logical_mask_write():
    h = val("v = [1 2 3 4]; v(v > 2) = 0; x = v;")
    assert np.array_equal(h, [[1, 2, 0, 0]])


def test_write_class_conversion():
    s = run("A = ones(2); A(1) = int8(5); x = A;")
    assert s.get("x").mclass == "int8"
    s = run("A = int8([1 2]); A(1) = 300; x = A;")
    assert s.get("x").host()[0, 0] == 127  # saturates


def test_deletion_linear():
    h = val("v = [1 2 3 4 5]; v([2 4]) = []; x = v;")
    assert np.array_equal(h, [[1, 3, 5]])


def test_deletion_rows():
    h = val("A = [1 2; 3 4; 5 6]; A(2, :) = []; x = A;")
    assert np.array_equal(h, [[1, 2], [5, 6]])


def test_deletion_cols():
    h = val("A = [1 2 3; 4 5 6]; A(:, [1 3]) = []; x = A;")
    assert np.array_equal(h, [[2], [5]])


def test_copy_on_write_aliasing():
    s = run("A = [1 2 3]; B = A; B(1) = 99; x = A(1); y = B(1);")
    assert s.get("x").scalar_double() == 1.0
    assert s.get("y").scalar_double() == 99.0
    s = run("A = [1 2 3]; B = A; A(1) = 50; x = A(1); y = B(1);")
    assert s.get("x").scalar_double() == 50.0
    assert s.get("y").scalar_double() == 1.0


def test_write_3d_slice():
    h = val("A = zeros(2, 3, 4); A(1, 2, :) = 1:4; x = A(1, 2, 3);")
    assert h[0, 0] == 3.0


def test_cell_write_and_grow():
    s = run("c = {}; c{3} = 'hi'; x = c{3}; n = numel(c);")
    assert s.get("x").to_str() == "hi"
    assert s.get("n").scalar_double() == 3


def test_cell_paren_vs_brace():
    s = run("c = {1, 2, 3}; d = c(2); e = c{2};")
    from runmat_tpu.values import CellArray, MatArray
    assert isinstance(s.get("d"), CellArray)
    assert isinstance(s.get("e"), MatArray)


def test_struct_field_on_indexed_element():
    assert scalar("s(2).a = 5; x = s(2).a;") == 5.0


def test_size_mismatch_write_error():
    fails("v = [1 2 3]; v(1:2) = [1 2 3];", "subsasgn")


def test_range_single_class():
    s = run("x = single(1):single(3);")
    assert s.get("x").mclass == "single"
