"""Linear buckling + harmonic-response pipelines (analysis depth beyond the
reference's six pipelines, runmat-analysis/fea/src/lib.rs:16-21). Validation:
exact load-scale invariance of buckling factors, Euler-column magnitude
bound, FRF peak at the first modal frequency, and quasi-static limit."""

import numpy as np

from helpers import run
from runmat_tpu.fea.mesh import box_mesh
from runmat_tpu.fea.pipelines import (run_buckling, run_harmonic,
                                      run_linear_static, run_modal)

E, NU, RHO = 210e9, 0.3, 7800.0


def _column():
    L, a = 1.0, 0.05
    mesh = box_mesh((a, a, L), (2, 2, 24))
    base = mesh.boundary_nodes(2, 0.0)
    top = mesh.boundary_nodes(2, L)
    P = 1000.0
    forces = {int(n): (0.0, 0.0, -P / len(top)) for n in top}
    return mesh, base, forces, P, L, a


def test_buckling_scale_invariance_is_exact():
    mesh, base, forces, P, _, _ = _column()
    r1 = run_buckling(mesh, E, NU, base, forces, n_modes=1)
    forces2 = {k: (0.0, 0.0, 2 * v[2]) for k, v in forces.items()}
    r2 = run_buckling(mesh, E, NU, base, forces2, n_modes=1)
    ratio = r1["critical_load_factor"] / r2["critical_load_factor"]
    assert abs(ratio - 2.0) < 1e-8          # lambda * P is invariant


def test_buckling_euler_column_magnitude():
    mesh, base, forces, P, L, a = _column()
    r = run_buckling(mesh, E, NU, base, forces, n_modes=3)
    I = a ** 4 / 12.0
    p_euler = np.pi ** 2 * E * I / (4 * L ** 2)
    p_fem = r["critical_load_factor"] * P
    # coarse linear tets lock in bending: FEM overestimates, converging
    # down under refinement (2.13x at this mesh, 1.52x one level finer)
    assert p_euler < p_fem < 3.0 * p_euler
    # higher modes carry larger factors, all positive
    lf = r["load_factors"]
    assert (lf > 0).all() and (np.diff(lf) >= -1e-9).all()


def test_buckling_tension_has_no_low_positive_factor():
    mesh, base, forces, P, L, a = _column()
    pull = {k: (0.0, 0.0, -v[2]) for k, v in forces.items()}   # tension
    r_c = run_buckling(mesh, E, NU, base, forces, n_modes=1)
    r_t = run_buckling(mesh, E, NU, base, pull, n_modes=1)
    # tension stiffens: any positive factor is far above the compressive one
    if r_t["load_factors"].size:
        assert r_t["critical_load_factor"] > 5 * r_c["critical_load_factor"]


def _block():
    mesh = box_mesh((1.0, 1.0, 1.0), (3, 3, 3))
    base = mesh.boundary_nodes(2, 0.0)
    tip = mesh.boundary_nodes(2, 1.0)
    forces = {int(tip[0]): (1e5, 0.0, 0.0)}
    return mesh, base, forces


def test_harmonic_peak_at_first_mode():
    mesh, base, forces = _block()
    f1 = run_modal(mesh, E, NU, RHO, base, n_modes=3)["frequencies_hz"][0]
    freqs = np.linspace(0.2 * f1, 2.0 * f1, 181)
    h = run_harmonic(mesh, E, NU, RHO, base, forces, freqs,
                     damping=0.02, n_modes=8)
    pk = freqs[np.argmax(h["peak_amplitude"])]
    assert abs(pk - f1) / f1 < 0.02
    assert abs(h["modal_frequencies_hz"][0] - f1) / f1 < 1e-6


def test_harmonic_quasistatic_limit_matches_static():
    mesh, base, forces = _block()
    st = run_linear_static(mesh, E, NU, base, forces)
    u_static = st["max_displacement"]
    f1 = run_modal(mesh, E, NU, RHO, base, n_modes=1)["frequencies_hz"][0]
    h = run_harmonic(mesh, E, NU, RHO, base, forces,
                     np.array([f1 * 1e-3]), damping=0.02, n_modes=24)
    assert abs(h["peak_amplitude"][0] - u_static) / u_static < 0.15


def test_harmonic_damping_bounds_resonance():
    mesh, base, forces = _block()
    f1 = run_modal(mesh, E, NU, RHO, base, n_modes=1)["frequencies_hz"][0]
    freqs = np.array([f1])
    lo = run_harmonic(mesh, E, NU, RHO, base, forces, freqs,
                      damping=0.01, n_modes=8)["peak_amplitude"][0]
    hi = run_harmonic(mesh, E, NU, RHO, base, forces, freqs,
                      damping=0.10, n_modes=8)["peak_amplitude"][0]
    assert lo > 5 * hi                      # Q scales ~ 1/(2 zeta)


def test_fea_buckling_harmonic_builtins():
    s = run("m = femesh([0.05 0.05 1], [2 2 18]); "
            "top = fea_boundary_nodes(m, 'z==L'); "
            "loads = [top(1) 0 0 -1000]; "
            "b = fea_buckling(m, 210e9, 0.3, 'z==0', loads, 2); "
            "ok_b = double(b.critical_load_factor > 0); "
            "m2 = femesh([1 1 1], [2 2 2]); "
            "t2 = fea_boundary_nodes(m2, 'z==L'); "
            "h = fea_harmonic(m2, 210e9, 0.3, 7800, 'z==0', "
            "[t2(1) 1e5 0 0], [100; 500; 900], 0.02, 6); "
            "ok_h = double(numel(h.peak_amplitude) == 3);")
    assert float(s.get("ok_b").host()) == 1.0
    assert float(s.get("ok_h").host()) == 1.0
