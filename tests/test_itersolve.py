"""Iterative solvers (pcg/bicgstab/gmres/ichol) + thermomechanical coupling
(≙ MATLAB iterative family; runmat-analysis/fea solve stack with
preconditioners + coupling physics)."""

import numpy as np
import pytest

from helpers import run


def _spd_script(n=60):
    """Tridiagonal SPD system with known solution, built in MATLAB."""
    return (f"n = {n}; e = ones(n,1); "
            "A = spdiags([-e 4*e -e], -1:1, n, n); "
            "xt = (1:n)' / n; b = A * xt; ")


def test_pcg_converges_spd():
    s = run(_spd_script() + "[x, flag, relres, it] = pcg(A, b, 1e-10, 200); "
            "err = norm(x - xt);")
    assert float(s.get("flag").host()) == 0.0
    assert float(s.get("err").host()) < 1e-8
    assert float(s.get("relres").host()) <= 1e-10
    assert float(s.get("it").host()) >= 1


def test_pcg_default_maxit_flags_nonconvergence():
    # default maxit = min(n, 20) is too few for a 400-dof Poisson chain
    # (2 on the diagonal: condition number ~ n^2)
    s = run("n = 400; e = ones(n,1); "
            "A = spdiags([-e 2*e -e], -1:1, n, n); "
            "xt = (1:n)' / n; b = A * xt; "
            "[x, flag] = pcg(A, b);")
    assert float(s.get("flag").host()) == 1.0


def test_pcg_with_ichol_preconditioner_faster():
    s = run(_spd_script(200) +
            "L = ichol(A); "
            "[xp, fp, rp, itp] = pcg(A, b, 1e-10, 300, L, L'); "
            "[xn, fn, rn, itn] = pcg(A, b, 1e-10, 300); "
            "errp = norm(xp - xt);")
    assert float(s.get("fp").host()) == 0.0
    assert float(s.get("errp").host()) < 1e-8
    assert float(s.get("itp").host()) < float(s.get("itn").host())


def test_ichol_factor_shape():
    s = run(_spd_script(20) + "L = ichol(A); "
            "lo = istril(full(L)); rec = norm(full(L*L' - A)); ")
    assert bool(s.get("lo").host())
    assert float(s.get("rec").host()) < 1.0   # IC(0) approximates A


def test_bicgstab_unsymmetric():
    s = run("n = 50; e = ones(n,1); "
            "A = spdiags([-0.5*e 4*e -1.5*e], -1:1, n, n); "
            "xt = cos((1:n)'); b = A * xt; "
            "[x, flag, relres] = bicgstab(A, b, 1e-10, 200); "
            "err = norm(x - xt);")
    assert float(s.get("flag").host()) == 0.0
    assert float(s.get("err").host()) < 1e-7


def test_gmres_restarted():
    s = run("n = 40; e = ones(n,1); "
            "A = spdiags([-0.3*e 3*e -1.2*e], -1:1, n, n); "
            "xt = sin((1:n)'); b = A * xt; "
            "[x, flag, relres, it] = gmres(A, b, 10, 1e-10, 20); "
            "err = norm(x - xt);")
    assert float(s.get("flag").host()) == 0.0
    assert float(s.get("err").host()) < 1e-7
    it = s.get("it").host().reshape(-1)
    assert it.size == 2 and it[0] >= 1


def test_gmres_unrestarted_bracket_syntax():
    s = run("n = 30; A = gallery_tridiag(n); xt = ones(n,1); b = A * xt; "
            "[x, flag] = gmres(A, b, [], 1e-12, 30); err = norm(x - xt);"
            .replace("gallery_tridiag(n)",
                     "spdiags([-ones(n,1) 4*ones(n,1) -ones(n,1)], "
                     "-1:1, n, n)"))
    assert float(s.get("flag").host()) == 0.0
    assert float(s.get("err").host()) < 1e-9


def test_pcg_dense_matrix_and_function_preconditioner():
    s = run("A = [4 1 0; 1 4 1; 0 1 4]; xt = [1; 2; 3]; b = A * xt; "
            "prec = @(r) r ./ diag(A); "
            "[x, flag] = pcg(A, b, 1e-12, 50, prec); err = norm(x - xt);")
    assert float(s.get("flag").host()) == 0.0
    assert float(s.get("err").host()) < 1e-10


def test_thermomechanical_pipeline():
    from runmat_tpu.fea import pipelines as P
    from runmat_tpu.fea.mesh import box_mesh
    mesh = box_mesh((1.0, 0.2, 0.2), (6, 2, 2))
    fixed = np.where(mesh.nodes[:, 0] < 1e-12)[0]
    hot = np.where(mesh.nodes[:, 0] > 1.0 - 1e-12)[0]
    temps = {int(i): 300.0 for i in fixed}
    temps.update({int(i): 400.0 for i in hot})
    r = P.run_thermomechanical(mesh, E=2e11, nu=0.3, alpha=1.2e-5, k=50.0,
                               fixed_nodes=fixed, fixed_temp=temps,
                               T_ref=300.0)
    assert r["max_temperature"] == pytest.approx(400.0)
    # a heated clamped bar must expand: axial displacement at the hot end
    # approximates alpha * integral(dT) = 1.2e-5 * 50 * 1.0 (mean dT = 50K)
    ux_hot = r["displacement"][hot, 0].mean()
    assert ux_hot == pytest.approx(1.2e-5 * 50 * 1.0, rel=0.35)
    assert r["max_displacement"] > 0


def test_thermomechanical_matlab_surface():
    s = run("g = struct('box', [1 0.2 0.2], 'resolution', 3); "
            "m = fea.model(g); st = fea.study(m, 'thermomechanical'); "
            "r = fea.run(st); mt = max(abs(r.temperature));")
    assert float(s.get("mt").host()) == pytest.approx(400.0, rel=1e-6)
