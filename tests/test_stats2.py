"""Stats batch 2: distributions, hypothesis tests, ranking, sampling."""

import numpy as np

from helpers import run_get, scalar


def test_normal_family():
    v = run_get("p = normpdf(0); c = normcdf(0); q = norminv(0.975);",
                "p", "c", "q")
    assert abs(v["p"].host()[0, 0] - 0.3989422804014327) < 1e-12
    assert abs(v["c"].host()[0, 0] - 0.5) < 1e-12
    assert abs(v["q"].host()[0, 0] - 1.959963984540054) < 1e-9


def test_t_chi2_bino():
    v = run_get("c = tcdf(0, 5); q = tinv(0.975, 10); x = chi2cdf(3.84, 1);"
                "b = binocdf(5, 10, 0.5);", "c", "q", "x", "b")
    assert abs(v["c"].host()[0, 0] - 0.5) < 1e-12
    assert abs(v["q"].host()[0, 0] - 2.228138851986273) < 1e-6
    assert abs(v["x"].host()[0, 0] - 0.9499565448) < 1e-6
    assert abs(v["b"].host()[0, 0] - 0.623046875) < 1e-9


def test_generic_dist_dispatch():
    v = run_get("p = pdf('normal', 0, 0, 1); c = cdf('exp', 1, 1);"
                "q = icdf('uniform', 0.25, 0, 4);", "p", "c", "q")
    assert abs(v["p"].host()[0, 0] - 0.3989422804014327) < 1e-12
    assert abs(v["c"].host()[0, 0] - (1 - np.exp(-1))) < 1e-12
    assert abs(v["q"].host()[0, 0] - 1.0) < 1e-12


def test_random_reproducible():
    v = run_get("rng(7); a = random('normal', 0, 1, 3, 3);"
                "rng(7); b = random('normal', 0, 1, 3, 3);", "a", "b")
    assert np.array_equal(v["a"].host(), v["b"].host())
    assert v["a"].shape == (3, 3)


def test_fitdist_normal():
    v = run_get("rng(1); x = randn(5000,1)*2 + 3; d = fitdist(x, 'normal');", "d")
    mu = v["d"].get_scalar_field("mu").host()[0, 0]
    sig = v["d"].get_scalar_field("sigma").host()[0, 0]
    assert abs(mu - 3.0) < 0.15
    assert abs(sig - 2.0) < 0.15


def test_summary_extras():
    v = run_get("r = rms([3 4]); g = geomean([1 4 16]); h = harmmean([1 2 4]);"
                "e = rmse([1 2 3], [1 2 4]);", "r", "g", "h", "e")
    assert abs(v["r"].host()[0, 0] - np.sqrt(12.5)) < 1e-12
    assert abs(v["g"].host()[0, 0] - 4.0) < 1e-12
    assert abs(v["h"].host()[0, 0] - 12.0 / 7.0) < 1e-12
    assert abs(v["e"].host()[0, 0] - np.sqrt(1.0 / 3)) < 1e-12


def test_tiedrank_tabulate():
    v = run_get("r = tiedrank([10 20 20 30]); t = tabulate([1 2 2 3]);", "r", "t")
    assert v["r"].host().tolist() == [[1.0, 2.5, 2.5, 4.0]]
    t = v["t"].host()
    assert t[:, 0].tolist() == [1.0, 2.0, 3.0]
    assert t[:, 1].tolist() == [1.0, 2.0, 1.0]
    assert abs(t[1, 2] - 50.0) < 1e-12


def test_outliers():
    v = run_get("m = isoutlier([1 2 3 100]); f = filloutliers([1 2 3 100], 'center');",
                "m", "f")
    assert v["m"].host().tolist() == [[False, False, False, True]]
    assert v["f"].host()[0, 3] == 2.0


def test_ecdf_dummyvar_onehot():
    v = run_get("[f, x] = ecdf([3 1 2]); d = dummyvar([1;2;1]);"
                "o = onehotencode([1 2 3], 1);", "f", "x", "d", "o")
    assert v["f"].host().reshape(-1).tolist() == [0.0, 1/3, 2/3, 1.0]
    assert v["d"].host().tolist() == [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]
    assert v["o"].host().shape == (3, 3)


def test_hypothesis():
    v = run_get("rng(2); x = randn(200,1); [h, p] = kstest(x);"
                "[h2, p2] = ttest2(randn(100,1), randn(100,1)+5);",
                "h", "p", "h2", "p2")
    assert not v["h"].host()[0, 0]
    assert v["p"].host()[0, 0] > 0.05
    assert v["h2"].host()[0, 0]
    assert v["p2"].host()[0, 0] < 1e-6


def test_corr_types():
    v = run_get("x = [1 2 3 4 5]'; y = [2 4 6 8 10]';"
                "p = corr(x, y); s = corr(x, y, 'type', 'spearman');"
                "k = corr(x, y, 'type', 'kendall');", "p", "s", "k")
    assert abs(v["p"].host()[0, 0] - 1.0) < 1e-12
    assert abs(v["s"].host()[0, 0] - 1.0) < 1e-12
    assert abs(v["k"].host()[0, 0] - 1.0) < 1e-12


def test_corrcov():
    v = run_get("C = [4 2; 2 9]; R = corrcov(C);", "R")
    r = v["R"].host()
    assert abs(r[0, 0] - 1) < 1e-12 and abs(r[0, 1] - 2 / 6.0) < 1e-12


def test_sampling_reproducible():
    v = run_get("rng(3); a = gamrnd(2, 3, 4, 4); rng(3); b = gamrnd(2, 3, 4, 4);"
                "rng(3); s = randsample(10, 5); t = unidrnd(6, 2, 2);",
                "a", "b", "s", "t")
    assert np.array_equal(v["a"].host(), v["b"].host())
    assert (v["a"].host() > 0).all()
    s = v["s"].host().reshape(-1)
    assert len(set(s.tolist())) == 5 and s.min() >= 1 and s.max() <= 10
    assert ((v["t"].host() >= 1) & (v["t"].host() <= 6)).all()


def test_bootstrp_lhs():
    v = run_get("rng(4); b = bootstrp(10, @mean, [1 2 3 4 5]);"
                "l = lhsdesign(8, 2);", "b", "l")
    assert v["b"].shape == (10, 1)
    assert ((v["l"].host() > 0) & (v["l"].host() < 1)).all()
    # each column of an LHS has one point per stratum
    strata = np.floor(v["l"].host() * 8).astype(int)
    assert sorted(strata[:, 0].tolist()) == list(range(8))


def test_statset_histcounts2():
    v = run_get("o = statset('MaxIter', 50); m = statget(o, 'MaxIter');"
                "[c, ex, ey] = histcounts2([1 2 3 4], [1 2 3 4], 2);",
                "m", "c", "ex", "ey")
    assert v["m"].host()[0, 0] == 50.0
    assert v["c"].host().sum() == 4.0
    assert v["c"].shape == (2, 2)
