"""Async tasks + domain families (comms, finance, image, graph).

≙ reference async extension (docs/execution/async.md, Spawn/Await
instr.rs:259-261) and builtins/{comms,finance,image,graph}."""

import os
import tempfile

import numpy as np

from helpers import run, scalar


def test_spawn_await():
    assert scalar("h = spawn(@() sum(1:100)); x = await(h);") == 5050.0


def test_parfeval_fetch():
    assert scalar("f = parfeval(@(a, b) a + b, 1, 10, 20); x = fetchOutputs(f);") == 30.0


def test_parfeval_error_propagates():
    s = run("f = parfeval(@() error('boom:x', 'bad'), 1);")
    import pytest
    from runmat_tpu.errors import MatError
    with pytest.raises(MatError):
        s.run_source("v = fetchOutputs(f);", "t")


def test_wait_isdone():
    assert scalar("f = parfeval(@() 42, 1); wait(f); x = double(isdone(f));") == 1.0


def test_psk_qam_roundtrip():
    assert scalar("x = sum(abs(pskdemod(pskmod(0:7, 8), 8) - (0:7)));") == 0.0
    assert scalar("x = sum(abs(qamdemod(qammod(0:15, 16), 16) - (0:15)));") == 0.0


def test_blsprice_known_value():
    assert scalar("[c, p] = blsprice(100, 100, 0.05, 1, 0.2); "
                  "x = abs(c - 10.450584) < 1e-4;") == 1.0
    # put-call parity
    assert scalar("[c, p] = blsprice(100, 95, 0.03, 0.5, 0.25); "
                  "x = abs((c - p) - (100 - 95*exp(-0.03*0.5))) < 1e-9;") == 1.0


def test_awgn_snr():
    assert scalar("rng(0); y = awgn(ones(1, 20000), 10); "
                  "x = abs(var(y - 1) - 0.1) < 0.01;") == 1.0


def test_image_pipeline():
    assert scalar("g = rgb2gray(0.5 * ones(4, 4, 3)); x = abs(g(1,1) - 0.49995) < 1e-9;") == 1.0
    assert scalar("x = size(imresize(eye(4), 2), 1);") == 8.0
    assert abs(scalar("f = imfilter(ones(5), fspecial('average', 3)); x = f(3,3);") - 1.0) < 1e-12


def test_imwrite_imread_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        assert scalar(f"img = uint8(reshape(0:47, 4, 4, 3)); "
                      f"imwrite(img, '{d}/t.png'); r = imread('{d}/t.png'); "
                      f"x = double(r(2,3,2));") == 25.0


def test_graph_shortestpath():
    assert scalar("G = graph([1 2 3 1], [2 3 4 4], [1 2 5 10]); "
                  "[p, d] = shortestpath(G, 1, 4); x = d;") == 8.0
    h = run("G = graph([1 2 3 1], [2 3 4 4], [1 2 5 10]); "
            "p = shortestpath(G, 1, 4);").get("p").host()
    np.testing.assert_allclose(h.reshape(-1), [1, 2, 3, 4])


def test_graph_counts_adjacency():
    assert scalar("G = digraph([1 1 2], [2 3 3]); x = numedges(G)*10 + numnodes(G);") == 33.0
    assert scalar("x = nnz(adjacency(graph([1], [2])));") == 2.0


def test_spawn_copy_on_write_isolation():
    """SpawnHandleConcurrency parity: a task's indexed write must not mutate
    the parent's array (CopyOnWrite across the task boundary)."""
    from helpers import run_get
    v = run_get(
        "A = [1 2 3];"
        "f = parfeval(@(x) modify_first(x), 1, A);"
        "B = fetchOutputs(f);"
        "function y = modify_first(x), x(1) = 99; y = x; end",
        "A", "B")
    assert v["A"].host().tolist() == [[1.0, 2.0, 3.0]]   # parent untouched
    assert v["B"].host().tolist() == [[99.0, 2.0, 3.0]]  # task saw its copy
