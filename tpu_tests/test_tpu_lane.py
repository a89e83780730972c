"""Small real-chip correctness checks.

What this lane is for: a Mosaic/runtime regression must not ship
green.  Each kernel path therefore runs Mosaic-compiled ON THE CHIP
and is compared against ITS OWN interpret-mode execution (same code,
same op order, no Mosaic) — any disagreement beyond FMA-level noise is
a lowering bug.  Cross-path semantic equivalence (fused vs brick vs
unstructured oracles) is established by the f64 CPU suite
(tests/test_pallas*.py): in f32 those comparisons are ill-conditioned
(measured: the SAME two paths agree to 2e-13 in f64 but drift to
~2e-3 relative after 200 steps in f32 — roundoff excited at
grid-scale modes, not a bug), so they do not belong here.
test_golden_seismograms_short_f32 anchors absolute end-to-end
correctness at the production defaults against the committed
reference seismograms.
"""

import bz2
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

S = "/root/reference/examples/simple"


@pytest.fixture
def exact_mxu(monkeypatch):
    """Mosaic-vs-interpret equality pins the exact-f32 MXU mode so the
    tolerance tracks lowering noise only (the production default b3
    split-bf16 is itself exercised by the golden test)."""
    monkeypatch.setenv("HT_MXU_PREC", "highest")


@pytest.fixture(scope="module")
def problem():
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    src_ids = np.array([nid], np.int32)
    T = 200
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e8
    return p, mesh, tables, plan, src_ids, forces, T


def _check(u_mosaic, u_interp, atol):
    scale = np.abs(u_interp).max()
    assert scale > 0
    np.testing.assert_allclose(u_mosaic / scale, u_interp / scale,
                               atol=atol)


def test_fused_kernel_mosaic_vs_interpret(problem, exact_mxu):
    """run_pallas_solver (packed single-brick production path):
    Mosaic-compiled == interpret on chip."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = problem
    us = []
    for interp in (False, True):
        state, _ = run_pallas_solver(plan, tables, src_ids, forces, T,
                                     p.delta_t, dtype=jnp.float32,
                                     interpret=interp)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_legacy_kernel_mosaic_vs_interpret(problem, exact_mxu,
                                           monkeypatch):
    """The unpacked (legacy [3, LEN]) kernel path still lowers
    correctly (checkpoint cross-path restarts depend on it)."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = problem
    monkeypatch.setenv("HT_PALLAS_STATE", "legacy")
    us = []
    for interp in (False, True):
        state, _ = run_pallas_solver(plan, tables, src_ids, forces,
                                     T, p.delta_t, dtype=jnp.float32,
                                     interpret=interp)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def _bkt_problem():
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    src_ids = np.array([nid], np.int32)
    T = 120
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e8
    return p, mesh, tables, plan, src_ids, forces, T


def test_bkt_fused_mosaic_vs_interpret(exact_mxu):
    """Fused BKT (uniform-Q node-basis memory variables on the simple
    mesh): Mosaic == interpret on chip."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = _bkt_problem()
    us = []
    for interp in (False, True):
        state, _ = run_pallas_solver(plan, tables, src_ids, forces, T,
                                     p.delta_t, dtype=jnp.float32,
                                     interpret=interp)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_bkt_corner_basis_mosaic_vs_interpret(exact_mxu, monkeypatch):
    """The corner-basis BKT kernel (non-uniform-Q fallback) lowers
    correctly: force it via HT_BKT_UNIFORM=0 + HT_BKT_NODEQ=0."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = _bkt_problem()
    monkeypatch.setenv("HT_BKT_UNIFORM", "0")
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    us = []
    for interp in (False, True):
        state, _ = run_pallas_solver(plan, tables, src_ids, forces,
                                     T, p.delta_t, dtype=jnp.float32,
                                     interpret=interp)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_bkt_nodeq_mosaic_vs_interpret(exact_mxu):
    """The general node-basis heterogeneous-Q BKT kernel (nodeq tier,
    _make_bkt_node_kernel: streamed bin row + mixed-element epilogue)
    lowers correctly on chip.  Three depth layers with distinct QTABLE
    rows (the production Qs(Vs)-fit shape) so the uniform tier cannot
    apply."""
    from hercules_tpu.material import QTABLE, search_quality_table
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    E = mesh.lenum
    z = mesh.elem_z.astype(np.float64)
    layer = np.digitize(z, np.quantile(z, [1 / 3, 2 / 3]))
    props = {k: np.zeros(E) for k in
             ("Vp", "Vs", "rho", "a0_shear", "a1_shear", "g0_shear",
              "g1_shear", "b_shear", "a0_kappa", "a1_kappa",
              "g0_kappa", "g1_kappa", "b_kappa")}
    for li, (vp, vs, rho, qs) in enumerate(
            [(2400.0, 1200.0, 2100.0, 55.0),
             (4000.0, 2000.0, 2500.0, 120.0),
             (6000.0, 3464.0, 2700.0, 350.0)]):
        sel = layer == li
        props["Vp"][sel], props["Vs"][sel], props["rho"][sel] = \
            vp, vs, rho
        row = QTABLE[int(search_quality_table(np.array([qs]))[0])]
        for ci, c in enumerate(("a0_shear", "a1_shear", "g0_shear",
                                "g1_shear", "b_shear")):
            props[c][sel] = row[ci + 1]
    mesh.props = props
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    nid = mesh.elem_lnid[E // 2, 0]
    src_ids = np.array([nid], np.int32)
    T = 120
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e8

    from hercules_tpu.solver.pallas_brick import PallasBrickTables
    pt = PallasBrickTables(plan, tables)
    assert getattr(pt, "bkt_nodeq", False), \
        "fixture must trigger the general node-basis tier"

    us = []
    for interp in (False, True):
        state, _ = run_pallas_solver(plan, tables, src_ids, forces, T,
                                     p.delta_t, dtype=jnp.float32,
                                     interpret=interp)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_golden_seismograms_short_f32(tmp_path):
    """2000-step fp32 PRODUCTION-DEFAULT run vs the committed reference
    seismograms (the full 20000-step check is BENCH_GOLDEN=1) — the
    absolute-correctness anchor for the chip, b3 MXU mode included.

    Regression gate: besides the absolute 1e-3 ceiling, the error must
    stay within 2x the committed per-MXU-mode number
    (tests/goldens/golden_fp32_errors.json, "short" table) so a future
    "faster" precision mode cannot silently spend the golden budget."""
    import json
    from hercules_tpu.sim import Simulation
    sim = Simulation.setup(f"{S}/in/physics.in", f"{S}/in/numerical.in",
                           cvmdb=f"{S}/simple_case.e")
    sim.params.end_time = 2.0
    sim.params.finalize()
    n = sim.params.total_steps
    sim.src_forces = sim.src_forces[:n]
    state, samples = sim.run(dtype=jnp.float32, chunk=1000)
    worst = 0.0
    for i in range(5):
        txt = bz2.decompress(open(
            f"{S}/expected-out/stations/station.{i}.bz2", "rb")
            .read()).decode()
        rows = [l.split() for l in txt.splitlines()
                if l and not l.startswith("#")]
        g = np.array([[float(v) for v in r] for r in rows])[:n]
        scale = np.abs(g[:, 1:4]).max()
        worst = max(worst, float(
            np.abs(samples[: len(g), i] - g[:, 1:4]).max() / scale))
    assert worst < 1e-3, worst
    mode = os.environ.get("HT_MXU_PREC", "b3")
    gj = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "tests", "goldens",
                      "golden_fp32_errors.json")
    with open(gj) as fh:
        committed = json.load(fh)["short"].get(mode)
    if committed is not None:
        assert worst <= 2.0 * committed, \
            (f"golden error {worst:.3e} regressed past 2x the "
             f"committed {mode} value {committed:.3e}")


def test_gslab_one_chip(problem):
    """The gslab production path compiles and runs on a 1-chip mesh."""
    from jax.sharding import Mesh
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.material import MeshOrigin, correct_properties
    from hercules_tpu.mesh import Octree, extract_mesh
    from hercules_tpu.parallel.gslab import (build_gslab_tables,
                                             gslab_u_global,
                                             run_gslab_solver)
    from hercules_tpu.solver.assemble import assemble
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        _, _, z = morton.deinterleave3(hi, lo)
        return lv < np.where(z < (1 << 28), 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)
    st = build_gslab_tables(mesh, tables, 1, src_ids=None,
                            min_brick_elems=512)
    with Mesh(np.array(jax.devices()[:1]), ("d",)) as m:
        state = run_gslab_solver(st, m, np.zeros((4, 0, 3)), 4,
                                 p.delta_t, dtype=jnp.float32, chunk=4)
    u = gslab_u_global(st, state[0], mesh.nnum)
    assert np.isfinite(u).all()


def test_gmesh_one_chip_mosaic_vs_interpret():
    """The general graded multi-chip path (parallel/gmesh.py) on a
    LATERALLY graded mesh: Mosaic compile on the real chip == the
    interpreter (covers the fused kernels + one-psum index interface
    reconciliation under the align8 dataflow)."""
    from jax.sharding import Mesh
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.material import MeshOrigin, correct_properties
    from hercules_tpu.mesh import Octree, extract_mesh
    from hercules_tpu.parallel.gmesh import (build_gmesh_tables,
                                             gmesh_u_global,
                                             run_gmesh_solver)
    from hercules_tpu.solver.assemble import assemble
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        x, _, _ = morton.deinterleave3(hi, lo)
        return lv < np.where(x < (1 << 28), 5, 4)

    tree.refine(lambda tr, hi, lo, lv: {}, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 2, 0]], np.int32)
    T = 6
    rng = np.random.default_rng(5)
    forces = rng.standard_normal((T, 1, 3)) * 1e8
    st = build_gmesh_tables(mesh, tables, 1, src_ids=nid,
                            min_brick_elems=32)
    assert st.K > 0
    us = {}
    for itp in (False, True):
        with Mesh(np.array(jax.devices()[:1]), ("d",)) as m:
            state = run_gmesh_solver(st, m, forces, T, p.delta_t,
                                     dtype=jnp.float32, chunk=T,
                                     interpret=itp)
        us[itp] = gmesh_u_global(st, state)
    scale = np.abs(us[True]).max()
    assert scale > 0
    # b4 split-bf16 vs the interpreter's exact f32: the short run's
    # near-cancelling forces leave ~5e-4*scale outliers; a wrong
    # reconciliation would be O(scale)
    np.testing.assert_allclose(us[False], us[True], rtol=0,
                               atol=1e-3 * scale)


def _graded_problem():
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.material import MeshOrigin, correct_properties
    from hercules_tpu.mesh import Octree, extract_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        _, _, z = morton.deinterleave3(hi, lo)
        return lv < np.where(z < (1 << 28), 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)
    plan = build_plan(mesh, min_brick_elems=512)
    return p, mesh, tables, plan


def test_packed_mesh_path_graded_mosaic_vs_interpret(exact_mxu):
    """The multi-brick packed mesh path (pallas_mesh + plane
    reconciler): Mosaic == interpret on chip, on a graded mesh."""
    from hercules_tpu.solver.pallas_mesh import (MeshPallasTables,
                                                 mesh_u_global,
                                                 run_mesh_solver)
    p, mesh, tables, plan = _graded_problem()
    mt = MeshPallasTables(plan, tables)
    assert mt.plane_rec is not None and mt.packed

    T = 150
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0]], np.int32)
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e8
    us = []
    for interp in (False, True):
        state, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                   p.delta_t, dtype=jnp.float32,
                                   interpret=interp)
        us.append(mesh_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_mesh_nonlinear_mosaic_vs_interpret(exact_mxu):
    """Nonlinear on the packed mesh path: Mosaic == interpret on chip
    on a mixed soft-layer mesh (the unstructured-oracle semantic check
    lives in the f64 CPU suite)."""
    import tempfile
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.nonlinear import (NonlinearConfig,
                                        build_nonlinear_tables)
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.pallas_mesh import (attach_nonlinear_mesh,
                                                 mesh_carry_views,
                                                 mesh_u_global,
                                                 run_mesh_solver)
    from hercules_tpu.tools.makecvm import build_layered_cvm

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    tmp = tempfile.mkdtemp(prefix="ht_nl_")
    build_layered_cvm(f"{tmp}/l.e", 1000.0, 1000.0, 500.0, 62.5,
                      [[0.0, 3000.0, 1500.0, 2300.0],
                       [250.0, 6000.0, 3464.0, 2700.0]])
    cvm = CVM(f"{tmp}/l.e")
    p.freq = 2.0
    p.vscut = 0.0
    p.finalize()
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)

    cfg = NonlinearConfig()
    cfg.material_model = "vonMises"
    cfg.properties_type = "alphakay"
    cfg.plasticity_type = "rate_independant"
    cfg.vs_cut = 2000.0
    cfg.vs_min = 0.0
    cfg.vs_limits = np.array([0.0, 1e10])
    cfg.alpha_cohes = np.array([0.0, 0.0])
    cfg.kay_phis = np.array([1e3, 1e3])
    cfg.strain_rates = np.array([1e-3, 1e-3])
    cfg.sensitivities = np.array([1.0, 1.0])
    cfg.hardening = np.array([0.0, 0.0])
    nlt = build_nonlinear_tables(mesh, p, cfg)
    assert 0 < nlt.n < mesh.lenum

    T = 80
    nid = np.array([mesh.elem_lnid[nlt.eidx[len(nlt.eidx) // 2], 0]],
                   np.int32)
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e9

    plan = build_plan(mesh)
    us = []
    for interp in (False, True):
        mesh_nl = attach_nonlinear_mesh(mesh, p, tables, nlt, plan,
                                        dtype=jnp.float32)
        state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                     p.delta_t, dtype=jnp.float32,
                                     nl=mesh_nl, interpret=interp)
        us.append(mesh_u_global(plan, mesh_carry_views(state_m)[0],
                                mesh.nnum))
    _check(us[0], us[1], atol=2e-5)


def test_cli_default_lands_on_fused_packed_kernel():
    """Path-selection gate (VERDICT r3 item 7): on a uniform mesh at
    the CLI production defaults (solver='auto', f32, single device),
    Simulation.run must land on the fused packed kernel — the
    sim.py fallback chains may degrade a broken toolchain gracefully,
    but the DEFAULT selection itself must never silently regress to a
    10-100x slower path."""
    from hercules_tpu.sim import Simulation
    sim = Simulation.setup(f"{S}/in/physics.in", f"{S}/in/numerical.in",
                           cvmdb=f"{S}/simple_case.e")
    sim.params.end_time = 0.05
    sim.params.finalize()
    n = sim.params.total_steps
    sim.src_forces = sim.src_forces[:n]
    sim.run(dtype=jnp.float32, ndev=1)
    assert sim.solver_path_name == "pallas_packed", \
        (f"CLI default selected '{sim.solver_path_name}' instead of "
         f"the fused packed kernel on a uniform mesh")


def test_resident_vs_streaming_on_chip(problem, exact_mxu,
                                       monkeypatch):
    """The VMEM-resident time loop vs the streaming packed kernel,
    both Mosaic-compiled on the real chip: same per-tile body, same
    float sequence — tight agreement (the interpret-mode twin proves
    bit-exactness; on-chip the source-injection lane rounding can
    differ by ulps)."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  resident_applies,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = problem
    us = []
    for v in ("1", "0"):
        monkeypatch.setenv("HT_PALLAS_RESIDENT", v)
        state, _ = run_pallas_solver(plan, tables, src_ids, forces,
                                     T, p.delta_t,
                                     dtype=jnp.float32)
        us.append(pallas_u_global(plan, state[0], mesh.nnum))
    _check(us[0], us[1], atol=1e-6)
