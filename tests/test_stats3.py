"""Statistics batch 3: distribution grid, hypothesis tests, pca, autocorr.

Expected values are literal pins cross-checked against scipy.stats (and the
closed forms the MATLAB docs state), not computed in-test, so the oracle does
not share ancestry with the implementation.
"""

import numpy as np

from helpers import run_get


def val(src, name="v"):
    return np.asarray(run_get(src, name)[name].host())


def test_chi2_family():
    assert abs(float(val("v = chi2pdf(3.2, 5);")) - 0.1536889372678556) < 1e-12
    assert abs(float(val("v = chi2cdf(3.2, 5);")) - 0.3308170979667568) < 1e-12
    assert abs(float(val("v = chi2inv(0.7, 5);")) - 6.0644299841549) < 1e-10


def test_f_family():
    assert abs(float(val("v = fpdf(2.5, 3, 7);")) - 0.09478619896436691) < 1e-12
    assert abs(float(val("v = fcdf(2.5, 3, 7);")) - 0.8564905437210608) < 1e-12
    assert abs(float(val("v = finv(0.9, 3, 7);")) - 3.0740719939090035) < 1e-10


def test_beta_gamma_exp():
    assert abs(float(val("v = betapdf(0.3, 2, 5);")) - 2.16090) < 1e-5
    assert abs(float(val("v = betacdf(0.3, 2, 5);")) - 0.579825) < 1e-6
    assert abs(float(val("v = gampdf(2.2, 3, 1.5);")) - 0.16541555586874376) < 1e-12
    assert abs(float(val("v = gaminv(0.4, 3, 1.5);")) - 3.427615356005071) < 1e-10
    assert abs(float(val("v = expcdf(1.5, 2);")) - (1 - np.exp(-0.75))) < 1e-14
    assert abs(float(val("v = expinv(0.3, 2);")) + 2 * np.log(0.7)) < 1e-14


def test_unif_logn_rayl_wbl_geo():
    assert float(val("v = unifpdf(0.4, 0, 2);")) == 0.5
    assert float(val("v = unifpdf(2.4, 0, 2);")) == 0.0
    assert float(val("v = unifinv(0.25, 0, 2);")) == 0.5
    assert abs(float(val("v = logncdf(1.5, 0.2, 0.7);"))
               - 0.61543824761761) < 1e-12
    assert abs(float(val("v = raylinv(0.5, 0.8);"))
               - 0.8 * np.sqrt(2 * np.log(2))) < 1e-14
    assert abs(float(val("v = wblcdf(1.2, 2, 1.5);"))
               - (1 - np.exp(-0.6 ** 1.5))) < 1e-14
    assert abs(float(val("v = geopdf(3, 0.3);")) - 0.3 * 0.7 ** 3) < 1e-14


def test_poissinv_and_mvnpdf():
    assert float(val("v = poissinv(0.9, 4);")) == 7.0
    assert float(val("v = poissinv(0, 4);")) == 0.0
    r = float(val("v = mvnpdf([0.2 -0.1], [0 0], [1 0.3; 0.3 2]);"))
    assert abs(r - 0.11212619979818034) < 1e-14
    # default mu/sigma
    r1 = float(val("v = mvnpdf([0 0]);"))
    assert abs(r1 - 1.0 / (2 * np.pi)) < 1e-14


def test_ttest_one_sample_and_paired():
    out = run_get("x = [5.1 4.9 5.3 5.2 4.8 5.0 5.4 5.1];"
                  "[h, p, ci, st] = ttest(x, 5);", "h", "p", "ci", "st")
    # mean 5.1, sd ~0.2, t = 1.4142, p ~ 0.2003, h = 0
    assert float(out["h"].host()) == 0.0
    assert abs(float(out["p"].host()) - 0.20036) < 2e-4
    ci = out["ci"].host().reshape(-1)
    assert ci[0] < 5.1 < ci[1]
    paired = run_get("x = [1 2 3 4 5]; y = [1.1 2.1 3.1 4.1 5.1];"
                     "[h, p] = ttest(x, y);", "h", "p")
    assert float(paired["h"].host()) == 1.0  # constant -0.1 shift, sd ~0


def test_anova1_matrix_and_grouped():
    out = run_get("y = [1 2 3; 2 3 4; 1.5 2.5 3.5; 1.2 2.2 3.1];"
                  "p = anova1(y); [p2, tbl] = anova1(y);", "p", "tbl")
    assert abs(float(out["p"].host()) - 0.000487380412948) < 1e-12
    tbl = out["tbl"].data
    assert tbl.shape == (4, 6)
    g = run_get("y = [1 2 1.5 1.2 2 3 2.5 2.2];"
                "grp = [1 1 1 1 2 2 2 2]; p = anova1(y, grp);", "p")
    assert 0.0 < float(g["p"].host()) < 1.0


def test_ranksum_signrank():
    p = float(val("v = ranksum([1 2 3 4 10], [5 6 7 8 9]);"))
    assert 0.1 < p < 0.2  # normal approximation of the 0.1508 exact
    p2 = float(val("v = signrank([1 2 3 -4 5 -6 7 8 9 10]);"))
    assert 0.05 < p2 < 0.12


def test_pca_reconstruction_and_explained():
    out = run_get(
        "rng(0); X = randn(60,3) * [3 0 0; 0 1 0; 0 0 0.2];"
        "[c, s, l, t, e, mu] = pca(X);"
        "R = s * c' + repmat(mu, 60, 1) - X;",
        "c", "s", "l", "e", "R")
    assert np.max(np.abs(out["R"].host())) < 1e-10  # exact reconstruction
    lat = out["l"].host().reshape(-1)
    assert np.all(np.diff(lat) <= 1e-12)  # descending variances
    assert abs(float(out["e"].host().sum()) - 100.0) < 1e-9
    c = out["c"].host()
    np.testing.assert_allclose(c.T @ c, np.eye(3), atol=1e-10)


def test_autocorr_and_xcov():
    out = run_get("a = autocorr([1 2 3 4 5 4 3 2 1 2 3 4 5 4 3 2 1], 4);",
                  "a")
    a = out["a"].host().reshape(-1)
    assert a[0] == 1.0 and a.size == 5
    assert abs(a[1] - 0.58424726) < 1e-6
    x = run_get("c = xcov([1 2 3 4], [1 2 3 4]);", "c")["c"].host().reshape(-1)
    # xcov of identical ramps peaks at zero lag with sum of squared deviations
    assert abs(x[3] - 5.0) < 1e-10
