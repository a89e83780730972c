import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params, ConfigFile
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.nonlinear import (NonlinearConfig, build_nonlinear_tables,
                                    smooth_rise_factor, strain_operator,
                                    force_operator)
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import attach_nonlinear, run_solver

SIMPLE = "/root/reference/examples/simple"


def _nl_config(model="linear", plasticity="rate_independant",
               vs_cut=1e9, k=1e5, hard=0.0):
    c = NonlinearConfig()
    c.material_model = model
    c.properties_type = "alphakay"
    c.plasticity_type = plasticity
    c.vs_cut = vs_cut
    c.vs_min = 0.0
    c.vs_limits = np.array([0.0, 1e10])
    c.alpha_cohes = np.array([0.0, 0.0])     # alpha
    c.kay_phis = np.array([k, k])            # k
    c.strain_rates = np.array([1e-3, 1e-3])
    c.sensitivities = np.array([1.0, 1.0])
    c.hardening = np.array([hard, hard])
    return c


@pytest.fixture(scope="module")
def setup():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    T = 150
    forces = np.zeros((T, 1, 3))
    forces[:20, 0, :] = 1e8
    return p, mesh, tables, np.array([nid], np.int32), forces, T


def test_operators_adjoint():
    """The Gauss force operator is h^3/8-weighted adjoint of the strain
    operator (virtual work symmetry): K_gauss = (1/8) sum_j F_j S~_j is
    symmetric, where S~ doubles the engineering shear rows."""
    S = strain_operator()        # [8, 6, 24], strain = S u / h
    F = force_operator()         # [8, 24, 6], f = h^2/8 F sigma
    # elastic modulus for unit mu, lambda=0: sigma = 2*eps (diag),
    # shear terms sigma_ij = 2*eps_ij
    K = np.zeros((24, 24))
    for j in range(8):
        K += F[j] @ (2.0 * S[j]) / 8.0
    np.testing.assert_allclose(K, K.T, atol=1e-14)
    # rigid translation produces zero force
    u = np.tile([1.0, -2.0, 0.5], 8)
    np.testing.assert_allclose(K @ u, 0, atol=1e-12)


def test_linear_model_matches_stiffness(setup):
    """material_model=linear with ALL elements nonlinear: the Gauss
    stress-divergence force must equal the analytic stiffness operator
    (2x2x2 Gauss is exact for trilinear hexes), so displacements match
    a plain linear run."""
    p, mesh, tables, src_ids, forces, T = setup
    state_ref, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                              dtype=jnp.float64)
    u_ref = np.asarray(state_ref[0])

    cfg = _nl_config("linear")
    nlt = build_nonlinear_tables(mesh, p, cfg)
    assert nlt.n == mesh.lenum
    nl = attach_nonlinear(mesh, p, tables, nlt)
    state_nl, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                             dtype=jnp.float64, nl=nl)
    u_nl = np.asarray(state_nl[0])
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u_nl / scale, u_ref / scale, atol=1e-9)


def test_vonmises_yields_and_stays_bounded(setup):
    p, mesh, tables, src_ids, forces, T = setup
    cfg = _nl_config("vonmises", "rate_independant", k=2e4)
    nlt = build_nonlinear_tables(mesh, p, cfg)
    nl = attach_nonlinear(mesh, p, tables, nlt)
    big = forces * 50.0
    state, _ = run_solver(tables, src_ids, big, T, p.delta_t,
                          dtype=jnp.float64, nl=nl)
    u = np.asarray(state[0])
    assert np.isfinite(u).all()
    ep = np.asarray(state[3][2])
    assert ep.max() > 0          # plastic strain accumulated
    # linear (elastic) comparison differs where yielding occurred
    cfg2 = _nl_config("linear")
    nl2 = attach_nonlinear(mesh, p, tables,
                           build_nonlinear_tables(mesh, p, cfg2))
    state2, _ = run_solver(tables, src_ids, big, T, p.delta_t,
                           dtype=jnp.float64, nl=nl2)
    assert not np.allclose(u, np.asarray(state2[0]))


def test_druckerprager_cohefriction(setup):
    p, mesh, tables, src_ids, forces, T = setup
    cfg = _nl_config("druckerprager", "rate_independant", k=3e4)
    cfg.properties_type = "cohefriction"
    cfg.alpha_cohes = np.array([3e4, 3e4])   # cohesion
    cfg.kay_phis = np.array([30.0, 30.0])    # friction angle deg
    nlt = build_nonlinear_tables(mesh, p, cfg)
    # alpha from friction angle: 2 sin(phi) / (sqrt(3)(3 - sin(phi)))
    phi = np.radians(30.0)
    exp_alpha = 2 * np.sin(phi) / (np.sqrt(3) * (3 - np.sin(phi)))
    np.testing.assert_allclose(nlt.alpha, exp_alpha)
    nl = attach_nonlinear(mesh, p, tables, nlt)
    state, _ = run_solver(tables, src_ids, forces * 50, T, p.delta_t,
                          dtype=jnp.float64, nl=nl)
    assert np.isfinite(np.asarray(state[0])).all()


def test_smooth_rise_factor():
    N = 1000
    s = smooth_rise_factor(np.arange(0, 1200), N)
    assert s[0] == 0.0
    assert s[50] == 0.0                   # below n1
    assert s[-1] == 1.0
    assert (np.diff(s) >= -1e-12).all()   # monotone
    assert 0.4 < s[500] < 0.6             # ~half at midpoint


def test_geostatic_loading(setup):
    p, mesh, tables, src_ids, forces, T = setup
    cfg = _nl_config("linear")
    cfg.geostatic_loading_t = 0.05        # 50 steps
    cfg.geostatic_cushion_t = 0.01        # +10
    nlt = build_nonlinear_tables(mesh, p, cfg)
    assert nlt.bot_eidx is not None and len(nlt.bot_eidx) == 16 * 16
    nl = attach_nonlinear(mesh, p, tables, nlt)
    zero_src = np.zeros((T, 1, 3))
    state, _ = run_solver(tables, src_ids, zero_src, T, p.delta_t,
                          dtype=jnp.float64, nl=nl)
    u = np.asarray(state[0])
    assert np.isfinite(u).all()
    # gravity settles the medium downward (positive z = depth)
    assert np.median(u[:, 2]) > 0
    # bottom nodes stay pinned through loading: after the run (step >
    # final) they are free, but displacement magnitude stays small
    bot = np.asarray(nl["bot_nodes"])
    assert np.abs(u[bot, 2]).max() < np.abs(u[:, 2]).max() + 1e-30


def test_nonlinear_station_extras(setup, tmp_path):
    """Stations inside nonlinear elements get the 17 extra columns
    (print_nonlinear_stations, nonlinear.c:2078-2228): strain/stress
    tensors, plastic multiplier, yield value, hardened strength."""
    import os
    from hercules_tpu.sim import (Simulation, setup_stations,
                                  write_station_files)

    p, mesh, tables, src_ids, forces, T = setup
    cfg = _nl_config("vonmises", "rate_independant", k=50.0)
    nlt = build_nonlinear_tables(mesh, p, cfg)
    st = setup_stations(mesh, p)
    assert st is not None and st.eidx is not None

    sim = Simulation(params=p, cvm=None, mesh=mesh, tables=tables,
                     source=None, src_ids=src_ids,
                     src_forces=forces * 50.0, stations=st,
                     nl_tables=nlt)
    state, samples = sim.run(dtype=jnp.float64, total_steps=T)

    # every station is in a nonlinear element (vs_cut = 1e9)
    assert set(sim.nl_station_extras) == set(int(i) for i in st.ids)
    assert samples.shape == (T, len(st.ids), 3)

    mu, lam = nlt.mu[0], nlt.lam[0]
    yielded = False
    for sid, ex in sim.nl_station_extras.items():
        assert ex.shape == (T, 17)
        bE, bS = ex[:, 6], ex[:, 7]
        dlam, fs, kh = ex[:, 14], ex[:, 15], ex[:, 16]
        # bulk: s_kk = (3 lam + 2 mu) e_kk regardless of plasticity
        # direction (vonMises flow is deviatoric)
        np.testing.assert_allclose(bS, (3 * lam + 2 * mu) * bE,
                                   rtol=1e-8, atol=1e-3)
        assert (dlam >= 0).all()
        # after return mapping Fs never exceeds the hardened strength
        # by more than numerical noise
        assert (fs <= kh + 1e-6 * kh.max()).all()
        yielded = yielded or (dlam > 0).any()
    assert yielded

    # station files grow the extra columns + header
    outdir = str(tmp_path / "st")
    write_station_files(outdir, st, samples, p.delta_t,
                        nl_extras=sim.nl_station_extras)
    sid = int(st.ids[0])
    with open(os.path.join(outdir, f"station.{sid}")) as f:
        hdr = f.readline()
        assert "dLambda" in hdr and "s-xx(Pa)" in hdr
        row = f.readline().split()
    assert len(row) == 4 + 17
