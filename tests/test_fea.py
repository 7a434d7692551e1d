"""FEA stack: meshing, assembly, the six pipelines, analytic validation.

≙ reference runmat-meshing + runmat-analysis-fea conformance
(fea/src/lib.rs:16-21 pipelines; meshing quality contracts)."""

import numpy as np

from helpers import run, scalar


def test_box_mesh_counts_and_volume():
    s = run("m = femesh([2 1 1], [4 2 2]); i = femesh_info(m);")
    info = s.get("i")
    vol = float(info.fields["volume"].reshape(-1)[0].host()[0, 0])
    nel = float(info.fields["elements"].reshape(-1)[0].host()[0, 0])
    assert abs(vol - 2.0) < 1e-12          # tets tile the box exactly
    assert nel == 4 * 2 * 2 * 6


def test_mesh_quality_positive():
    assert scalar("m = femesh([1 1 1], [3 3 3]); i = femesh_info(m); "
                  "x = i.min_quality;") > 0.3


def test_thermal_linear_field_exact():
    """A linear temperature field is reproduced exactly by linear tets."""
    assert scalar("""m = femesh([1 1 1], [5 3 3]);
c = fea_node_coords(m);
r = fea_thermal(m, 3.7, {'x==0', 100; 'x==L', 0});
x = max(abs(r.temperature - (100 * (1 - c(:,1)))));""") < 1e-9


def test_electrostatic_uniform_field():
    assert abs(scalar("m = femesh([1 1 1], [4 2 2]); "
                      "r = fea_electrostatic(m, 1, {'x==0', 1; 'x==L', 0}); "
                      "x = r.max_field;") - 1.0) < 1e-9


def test_cantilever_converges_to_analytic():
    """TET4 is stiff in bending; the ratio to Euler-Bernoulli must increase
    toward 1 under refinement."""
    src = """L = 10; E = 1000; nu = 0.0;
mesh = femesh([L 1 1], [{n}]);
tip = fea_boundary_nodes(mesh, 'x==L');
k = numel(tip);
loads = [tip, zeros(k,1), zeros(k,1), (-0.01/k)*ones(k,1)];
res = fea_linear_static(mesh, E, nu, 'x==0', loads);
x = res.max_displacement / (0.01*L^3/(3*E*(1/12)));"""
    coarse = scalar(src.format(n="20 2 2"))
    fine = scalar(src.format(n="40 4 4"))
    assert 0.4 < coarse < 1.05
    assert fine > coarse
    assert 0.75 < fine < 1.05


def test_modal_cantilever_bending_mode():
    """First bending frequency of a fixed-free beam: within the TET4 locking
    envelope of the Euler-Bernoulli analytic value."""
    f1 = scalar("""mesh = femesh([10 1 1], [12 2 2]);
r = fea_modal(mesh, 1000, 0.0, 1.0, 'x==0', 2);
x = r.frequencies_hz(1);""")
    analytic = (1.875 ** 2 / (2 * np.pi)) * np.sqrt(1000 * (1 / 12) / (1.0 * 1.0 * 10.0 ** 4))
    assert analytic * 0.8 < f1 < analytic * 2.0


def test_transient_reaches_steady_state():
    assert scalar("""m = femesh([1 1 1], [4 2 2]);
r = fea_transient(m, 1, 0.01, {'x==0', 100; 'x==L', 0}, 0, 10, 1);
c = fea_node_coords(m);
x = max(abs(r.temperature - 100*(1 - c(:,1))));""") < 1e-6


def test_nonlinear_matches_linear_for_small_load():
    assert scalar("""mesh = femesh([5 1 1], [10 2 2]);
tip = fea_boundary_nodes(mesh, 'x==L');
k = numel(tip);
loads = [tip, zeros(k,1), zeros(k,1), (-1e-6/k)*ones(k,1)];
a = fea_linear_static(mesh, 100, 0.3, 'x==0', loads);
b = fea_nonlinear(mesh, 100, 0.3, 'x==0', loads, 3);
x = abs(a.max_displacement - b.max_displacement) / a.max_displacement;""") < 1e-9
