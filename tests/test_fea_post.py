"""FEA post-processing recovery (≙ runmat-analysis/fea/src/post/fields.rs
recover_result_fields): strain/stress from displacement, von Mises,
principal stresses, nodal averaging, strain energy, reactions, heat flux.

Oracles are analytic: TET4 reproduces affine fields exactly, so a linear
displacement/temperature field must recover the constant strain/stress/
flux to machine precision; equilibrium (reactions balance applied loads)
and Clapeyron's theorem (U = f.u/2) hold for any linear solve."""

import numpy as np

from helpers import run
from runmat_tpu.fea import post as PP
from runmat_tpu.fea.assembly import elasticity_D
from runmat_tpu.fea.mesh import box_mesh
from runmat_tpu.fea.pipelines import run_linear_static, run_thermal


def _mesh():
    return box_mesh((2.0, 1.0, 1.0), (4, 3, 3))


def test_affine_field_recovers_constant_strain_exactly():
    mesh = _mesh()
    A = np.array([[2e-3, 1e-4, 0.0],
                  [5e-4, -1e-3, 2e-4],
                  [0.0, 3e-4, 4e-3]])
    u = mesh.nodes @ A.T                       # u_i = A_ij x_j
    eps = PP.element_strain(mesh, u)
    expect = np.array([A[0, 0], A[1, 1], A[2, 2],
                       A[0, 1] + A[1, 0], A[1, 2] + A[2, 1],
                       A[2, 0] + A[0, 2]])
    np.testing.assert_allclose(eps, np.tile(expect, (mesh.n_tets, 1)),
                               atol=1e-12)
    # constant field: nodal average equals the element value
    vm = PP.von_mises(eps @ elasticity_D(1e6, 0.3).T)
    nv = PP.nodal_average(mesh, vm)
    np.testing.assert_allclose(nv, vm[0], rtol=1e-12)


def test_von_mises_known_tensors():
    # pure uniaxial: vm == |s|
    assert abs(PP.von_mises(np.array([100.0, 0, 0, 0, 0, 0])) - 100) < 1e-12
    # hydrostatic: vm == 0
    assert PP.von_mises(np.array([5.0, 5, 5, 0, 0, 0])) < 1e-12
    # pure shear tau: vm == sqrt(3) tau
    assert abs(PP.von_mises(np.array([0.0, 0, 0, 7, 0, 0]))
               - np.sqrt(3) * 7) < 1e-12


def test_principal_stresses_diagonalize():
    s = np.array([[3.0, 1.0, -2.0, 0, 0, 0]])
    np.testing.assert_allclose(PP.principal_stresses(s)[0], [3, 1, -2],
                               atol=1e-12)
    # rotated pure shear: principals are (tau, 0, -tau)
    s2 = np.array([[0.0, 0, 0, 4.0, 0, 0]])
    np.testing.assert_allclose(PP.principal_stresses(s2)[0], [4, 0, -4],
                               atol=1e-12)


def test_linear_static_equilibrium_and_clapeyron():
    mesh = _mesh()
    fixed = np.where(mesh.nodes[:, 0] < 1e-12)[0]
    end = np.where(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-12)[0]
    load = np.array([0.0, 0.0, -1e3]) / end.size
    r = run_linear_static(mesh, 210e9, 0.3, fixed, {int(i): load
                                                    for i in end})
    # force balance: reactions cancel applied load exactly
    total_reaction = r["reactions"].sum(axis=0)
    np.testing.assert_allclose(total_reaction, [0, 0, 1e3],
                               rtol=1e-8, atol=1e-6)
    # Clapeyron: U = 0.5 * f . u (external work of the point loads)
    u = r["displacement"]
    work = 0.5 * sum(load @ u[i] for i in end)
    assert abs(r["total_strain_energy"] - work) < 1e-6 * abs(work)
    # von Mises peaks at the clamped end for a tip-loaded cantilever
    vm_nodes = r["nodal_von_mises"]
    x = mesh.nodes[:, 0]
    assert vm_nodes[x < 0.3].max() > vm_nodes[x > 1.7].max()


def test_thermal_linear_field_exact_flux():
    mesh = _mesh()
    k = 2.5
    xmax = mesh.nodes[:, 0].max()
    fixed = {}
    for i in np.where(mesh.nodes[:, 0] < 1e-12)[0]:
        fixed[int(i)] = 400.0
    for i in np.where(mesh.nodes[:, 0] > xmax - 1e-12)[0]:
        fixed[int(i)] = 300.0
    r = run_thermal(mesh, k, fixed, heat=0.0)
    grad = (300.0 - 400.0) / xmax
    np.testing.assert_allclose(
        r["flux"], np.tile([-k * grad, 0.0, 0.0], (mesh.n_tets, 1)),
        atol=1e-8)
    np.testing.assert_allclose(r["nodal_flux"][:, 0], -k * grad, atol=1e-8)


def test_matlab_surface_exposes_recovered_fields():
    s = run(
        "geom.box = [2 1 1]; geom.resolution = 3;"
        "m = fea.model(geom, fea.material('E', 210e9, 'nu', 0.3));"
        "r = fea.run(fea.study(m, 'linear_static'));"
        "vm = fea.field(r, 'vonMises');"
        "sig = r.stress; rx = r.reactions; te = r.totalStrainEnergy;"
        "pk = max(r.principalStress(:, 1));")
    assert s.get("sig").host().shape[1] == 6
    assert s.get("rx").host().shape[1] == 3
    assert float(s.get("te").host().reshape(-1)[0]) > 0
    assert float(s.get("pk").host().reshape(-1)[0]) > 0
    vm = s.get("vm").host()
    assert vm.ndim == 2 and (vm >= 0).all() and vm.max() > 0


def test_fea_plot_renders_boundary_trimesh():
    from runmat_tpu.plot import figure as figmod
    from runmat_tpu.plot.raster import render_png
    s = run(
        "geom.box = [2 1 0.5]; geom.resolution = 4;"
        "m = fea.model(geom, fea.material('E', 210e9, 'nu', 0.3));"
        "r = fea.run(fea.study(m, 'linear_static'));"
        "v = fea.plot(r, 'vonMises'); mx = max(v);")
    assert float(s.get("mx").host().reshape(-1)[0]) > 0
    fig = figmod.current_figure()
    tm = [ch for ax in fig.axes for ch in ax.children
          if ch.kind == "trimesh"]
    assert tm and tm[0].cvals is not None
    assert render_png(fig)[:4] == b"\x89PNG"
