"""Optimization solvers + ML stats."""

import numpy as np

from helpers import run_get


def test_fminunc():
    v = run_get("[x, fv] = fminunc(@(x) (x(1)-2)^2 + (x(2)+1)^2, [0; 0]);",
                "x", "fv")
    assert np.allclose(v["x"].host().reshape(-1), [2.0, -1.0], atol=1e-4)
    assert v["fv"].host()[0, 0] < 1e-8


def test_fsolve():
    v = run_get("x = fsolve(@(x) [x(1)^2 - 4; x(2) - 1], [1; 0]);", "x")
    assert np.allclose(v["x"].host().reshape(-1), [2.0, 1.0], atol=1e-8)


def test_linprog():
    v = run_get("[x, fv] = linprog([-1; -2], [1 1], 3, [], [], [0;0], []);",
                "x", "fv")
    assert np.allclose(v["x"].host().reshape(-1), [0.0, 3.0], atol=1e-8)
    assert abs(v["fv"].host()[0, 0] + 6.0) < 1e-8


def test_lsqnonlin_lsqcurvefit():
    v = run_get(
        "x = lsqnonlin(@(x) [x(1)-1; x(2)-5], [0; 0]);"
        "p = lsqcurvefit(@(p, xd) p(1)*xd + p(2), [0; 0], [1 2 3]', [3 5 7]');",
        "x", "p")
    assert np.allclose(v["x"].host().reshape(-1), [1.0, 5.0], atol=1e-8)
    assert np.allclose(v["p"].host().reshape(-1), [2.0, 1.0], atol=1e-6)


def test_coneprog():
    # min -x1 s.t. ||x|| <= 1 via cone: ||I x - 0|| <= [0;0]'x - (-1) ... use d=0, gamma=-1
    v = run_get("c = secondordercone(eye(2), [0;0], [0;0], -1);"
                "[x, fv] = coneprog([-1; 0], c);", "x", "fv")
    assert abs(v["x"].host().reshape(-1)[0] - 1.0) < 1e-4
    assert abs(v["fv"].host()[0, 0] + 1.0) < 1e-4


def test_optimoptions():
    v = run_get("o = optimoptions('fminunc', 'MaxIterations', 7);", "o")
    assert v["o"].get_scalar_field("MaxIterations").host()[0, 0] == 7.0


def test_pdist_squareform():
    v = run_get("d = pdist([0 0; 3 4]); D = squareform(d);"
                "E = pdist2([0 0], [3 4; 0 1]);", "d", "D", "E")
    assert v["d"].host()[0, 0] == 5.0
    assert v["D"].host().tolist() == [[0.0, 5.0], [5.0, 0.0]]
    assert v["E"].host().tolist() == [[5.0, 1.0]]


def test_linkage_knnsearch():
    v = run_get("Z = linkage([0; 1; 10]); [idx, d] = knnsearch([0 0; 10 10], [1 1]);",
                "Z", "idx", "d")
    z = v["Z"].host()
    assert z.shape == (2, 3)
    assert z[0, 2] == 1.0   # closest pair distance
    assert v["idx"].host()[0, 0] == 1.0
    assert abs(v["d"].host()[0, 0] - np.sqrt(2)) < 1e-12


def test_kmeans():
    v = run_get("rng(0); X = [randn(20,2); randn(20,2)+8];"
                "[idx, C] = kmeans(X, 2);", "idx", "C")
    idx = v["idx"].host().reshape(-1)
    # the two blobs should be separated
    assert len(set(idx[:20].tolist())) == 1
    assert len(set(idx[20:].tolist())) == 1
    assert idx[0] != idx[-1]


def test_confusionmat():
    v = run_get("[C, order] = confusionmat([1 1 2 2], [1 2 2 2]);", "C", "order")
    assert v["C"].host().tolist() == [[1.0, 1.0], [0.0, 2.0]]
    assert v["order"].host().reshape(-1).tolist() == [1.0, 2.0]


def test_cvpartition():
    v = run_get("rng(1); c = cvpartition(10, 'KFold', 5);"
                "t = test(c, 1); tr = training(c, 1);", "t", "tr")
    t, tr = v["t"].host().reshape(-1), v["tr"].host().reshape(-1)
    assert t.sum() == 2 and tr.sum() == 8
    assert not (t & tr).any()


def test_regress_ridge_fitlm():
    v = run_get("X = [ones(5,1) (1:5)']; y = [2 4 6 8 10]';"
                "b = regress(y, X); r = ridge(y, (1:5)', 0, 0);"
                "mdl = fitlm((1:5)', y);", "b", "r", "mdl")
    assert np.allclose(v["b"].host().reshape(-1), [0.0, 2.0], atol=1e-10)
    assert np.allclose(v["r"].host().reshape(-1), [0.0, 2.0], atol=1e-8)
    r2 = v["mdl"].get_scalar_field("Rsquared").get_scalar_field("Ordinary")
    assert abs(r2.host()[0, 0] - 1.0) < 1e-12


def test_classify_lda():
    v = run_get("train = [0 0; 0 1; 10 10; 10 11]; g = [1; 1; 2; 2];"
                "c = classify([0.5 0.5; 10 10.5], train, g);", "c")
    assert v["c"].host().reshape(-1).tolist() == [1.0, 2.0]


def test_fitctree_predict():
    v = run_get("X = [1; 2; 8; 9]; y = [0; 0; 1; 1];"
                "t = fitctree(X, y); p = predict(t, [1.5; 8.5]);", "p")
    assert v["p"].host().reshape(-1).tolist() == [0.0, 1.0]


def test_fitclinear_predict():
    v = run_get("X = [0 0; 0 1; 5 5; 5 6]; y = [0; 0; 1; 1];"
                "m = fitclinear(X, y); p = predict(m, [0 0.5; 5 5.5]);", "p")
    assert v["p"].host().reshape(-1).tolist() == [0.0, 1.0]


def test_mnrfit():
    v = run_get("X = [1; 2; 3; 8; 9; 10]; y = [1; 1; 1; 2; 2; 2];"
                "b = mnrfit(X, y);", "b")
    b = v["b"].host().reshape(-1)
    # P(y=1) decreasing in x => negative slope
    assert b[1] < 0


def test_perfcurve():
    v = run_get("[fpr, tpr, thr, auc] = perfcurve([1 1 0 0], [0.9 0.8 0.3 0.1], 1);",
                "fpr", "tpr", "auc")
    assert v["auc"].host()[0, 0] == 1.0


def test_tsne_shape():
    v = run_get("rng(5); X = [randn(10,3); randn(10,3)+10]; Y = tsne(X);", "Y")
    Y = v["Y"].host()
    assert Y.shape == (20, 2)
    # clusters stay separated in the embedding
    d_within = np.linalg.norm(Y[:10] - Y[:10].mean(0), axis=1).mean()
    d_between = np.linalg.norm(Y[:10].mean(0) - Y[10:].mean(0))
    assert d_between > d_within


def test_bayesopt():
    v = run_get("rng(2); v1 = optimizableVariable('a', [-5 5]);"
                "r = bayesopt(@(s) (s.a - 1)^2, v1);", "r")
    best = v["r"].get_scalar_field("XAtMinObjective").get_scalar_field("a")
    assert abs(best.host()[0, 0] - 1.0) < 1.5


def test_lasso():
    v = run_get("rng(3); X = randn(50, 3); y = X(:,1)*3 + randn(50,1)*0.01;"
                "B = lasso(X, y, 'Lambda', 0.001);", "B")
    b = v["B"].host().reshape(-1)
    assert abs(b[0] - 3.0) < 0.2
    assert abs(b[1]) < 0.2 and abs(b[2]) < 0.2
