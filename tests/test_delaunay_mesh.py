"""Unstructured Delaunay tet meshing: generation, optimization, quality,
and end-to-end FEA on the unstructured mesh."""

import numpy as np

from helpers import run_get
from runmat_tpu.fea.delaunay import (delaunay_mesh, mesh_quality_report,
                                     _tet_volumes)


def test_delaunay_mesh_fills_box():
    mesh = delaunay_mesh((1.0, 1.0, 1.0), h=0.3)
    rep = mesh_quality_report(mesh)
    # mesh volume must cover the unit box (convex domain -> watertight)
    assert abs(rep["total_volume"] - 1.0) < 1e-9
    assert rep["min_quality"] > 0.03
    assert rep["mean_quality"] > 0.5
    assert rep["n_tets"] > 50


def test_optimization_improves_quality():
    raw = delaunay_mesh((1.0, 1.0, 1.0), h=0.3, optimize=False)
    opt = delaunay_mesh((1.0, 1.0, 1.0), h=0.3, optimize=True)
    assert mesh_quality_report(opt)["min_quality"] >= \
        mesh_quality_report(raw)["min_quality"]
    # all tets stay positively oriented
    assert (_tet_volumes(opt.nodes, opt.tets) > 0).all()


def test_boundary_preserved():
    mesh = delaunay_mesh((2.0, 1.0, 1.0), h=0.4)
    # boundary faces stay exactly on the box: nodes at x=0 and x=2 exist
    assert (np.abs(mesh.nodes[:, 0]) < 1e-12).sum() >= 4
    assert (np.abs(mesh.nodes[:, 0] - 2.0) < 1e-12).sum() >= 4


def test_femesh_delaunay_builtin_and_fea():
    v = run_get("m = femesh_delaunay([1 1 1], 0.35);"
                "info = femesh_info(m); q = info.min_quality;"
                "nodes = fea_node_coords(m); nn = size(nodes, 1);"
                "r = fea_linear_static(m, 210e9, 0.3, 'x==0', [nn 0 0 -1e4]);"
                "mx = max(abs(r.displacement(:)));", "q", "mx")
    assert v["q"].host()[0, 0] > 0.01
    assert v["mx"].host()[0, 0] > 0    # cantilever deflects on the unstructured mesh
