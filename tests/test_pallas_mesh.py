"""Multi-brick fused Pallas path (pallas_mesh.py) vs the XLA brick
solver: identical trajectories on graded meshes with hanging nodes,
for rayleigh and BKT damping (interpret mode on CPU, f64)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.material import MeshOrigin, correct_properties
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.bricks import build_plan
from hercules_tpu.solver.brickstep import (brick_u_global,
                                           run_brick_solver)
from hercules_tpu.solver.pallas_mesh import (mesh_plan_applies,
                                             mesh_u_global,
                                             run_mesh_solver)

S = "/root/reference/examples/simple"


def _graded_mesh(p, cvm):
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        near = (x < (1 << 29)) & (y < (1 << 29)) & (z < (1 << 28))
        return lv < np.where(near, 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    return mesh


@pytest.fixture(scope="module")
def graded():
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    return p, _graded_mesh(p, cvm)


def _compare(p, mesh, damping, T=60):
    p.type_of_damping = damping
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    assert mesh_plan_applies(plan, tables.damping, max_bricks=1 << 30)
    assert len(plan.grp_node) > 0          # hanging/interface nodes
    assert len(mesh.dn_ids) > 0

    rng = np.random.default_rng(11)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0],
                    mesh.elem_lnid[2, 6]], np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[4, mesh.lenum - 3]]
    st_phi = np.full((2, 8), 0.125)

    state_b, samp_b = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=30)
    state_m, samp_m = run_mesh_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=30,
        interpret=True)

    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_m = mesh_u_global(plan, state_m[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_b, rtol=0, atol=5e-12 * scale)
    np.testing.assert_allclose(
        samp_m, samp_b, rtol=0,
        atol=5e-12 * max(np.abs(samp_b).max(), 1))


def test_mesh_pallas_rayleigh_graded(graded):
    p, mesh = graded
    _compare(p, mesh, "rayleigh")


def test_mesh_pallas_bkt_graded(graded):
    p, mesh = graded
    _compare(p, mesh, "bkt")


def test_mesh_pallas_uniform_source_on_shared_node(graded):
    """Uniform mesh through the multi path (single brick, no groups)."""
    from hercules_tpu.meshgen import generate_mesh
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)
    plan = build_plan(mesh)

    T = 40
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = np.zeros((T, 2, 3))
    forces[:6] = 3e7
    state_b, _ = run_brick_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float64)
    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float64,
                                 interpret=True)
    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_m = mesh_u_global(plan, state_m[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_b, rtol=0, atol=2e-13 * scale)


def _depth_graded_mesh(p, cvm):
    """Fine top half over coarse bottom half: full z-plane 2:1
    interface (the production terashake grading shape)."""
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        near = z < (1 << 28)
        return lv < np.where(near, 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    return mesh


@pytest.mark.parametrize("damping", ["rayleigh", "bkt"])
def test_plane_reconciler_depth_graded(damping):
    """The dense z-plane reconciler (planerec.py) activates on a
    depth-graded mesh and reproduces both the XLA brick solver and the
    index-based epilogue (HT_PLANE_RECONCILE=0) exactly."""
    import os
    from hercules_tpu.solver.pallas_mesh import MeshPallasTables

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    mesh = _depth_graded_mesh(p, cvm)
    p.type_of_damping = damping
    tables = assemble(mesh, p)
    # lower the brick floor so the small coarse half stays dense
    plan = build_plan(mesh, min_brick_elems=512)
    assert len(mesh.dn_ids) > 0

    # the plane reconciler must actually engage on this mesh
    mt = MeshPallasTables(plan, tables)
    assert mt.plane_rec is not None
    assert len(mt.plane_rec.hang) == 1
    # ... and the packed-state kernels ride it (elastic always; BKT
    # via the per-brick uniform-Q node-basis tier — the homogeneous
    # CVM gives every brick one coefficient set)
    assert mt.packed
    if damping == "bkt":
        assert mt.bk_scal is not None and len(mt.bk_scal) == mt.NB

    T = 50
    rng = np.random.default_rng(5)
    # one source on the interface plane (group node) + one off it
    dn_anchor = int(plan.mesh.dn_anchors[plan.mesh.dn_weights > 0][0])
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0], dn_anchor],
                   np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[4, mesh.lenum - 3]]
    st_phi = np.full((2, 8), 0.125)

    state_b, samp_b = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=25)
    state_m, samp_m = run_mesh_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=25,
        interpret=True)
    os.environ["HT_PLANE_RECONCILE"] = "0"
    try:
        state_i, samp_i = run_mesh_solver(
            plan, tables, nid, forces, T, p.delta_t,
            st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
            chunk=25, interpret=True)
    finally:
        del os.environ["HT_PLANE_RECONCILE"]

    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_m = mesh_u_global(plan, state_m[0], mesh.nnum)
    u_i = mesh_u_global(plan, state_i[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_b, rtol=0, atol=5e-12 * scale)
    np.testing.assert_allclose(u_m, u_i, rtol=0, atol=5e-12 * scale)
    np.testing.assert_allclose(
        samp_m, samp_b, rtol=0,
        atol=5e-12 * max(np.abs(samp_b).max(), 1))


def test_reordered_bricks_elongated(monkeypatch, tmp_path):
    """Elongated bricks (terashake aspect) reorder their storage axes
    largest-outermost so the fused kernel's stencil reach fits a VMEM
    tile; the fused mesh path with the axis-aware plane reconciler
    still matches the unstructured oracle.  HT_PALLAS_TILE shrinks the
    envelope so a small mesh triggers the reorder."""
    from hercules_tpu.solver.pallas_mesh import MeshPallasTables
    from hercules_tpu.solver.step import run_solver
    from hercules_tpu.tools.makecvm import build_layered_cvm

    monkeypatch.setenv("HT_PALLAS_TILE", "256")
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    db = str(tmp_path / "elong.e")
    # mesh x maps to north, y to east (psolve.c domain convention)
    build_layered_cvm(db, 1000.0, 4000.0, 500.0, 250.0,
                      [[0.0, 6000.0, 3464.0, 2700.0]])
    cvm = CVM(db)
    tree = Octree.newtree(4000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        near = z < (1 << 26)            # top half of the 500 m depth
        return lv < np.where(near, 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    # zero origin: the synthetic CVM covers the mesh domain directly
    correct_properties(mesh, cvm, p, MeshOrigin())
    tables = assemble(mesh, p)
    plan = build_plan(mesh, min_brick_elems=32)
    assert len(plan.bricks) == 2
    # mesh-global reorder: every brick shares the permutation
    assert all(b.axes == plan.bricks[0].axes != (2, 1, 0)
               for b in plan.bricks), [b.axes for b in plan.bricks]
    assert len(mesh.dn_ids) > 0

    mt = MeshPallasTables(plan, tables)
    assert mt.plane_rec is not None     # axis-aware reconciler engages

    T = 30
    rng = np.random.default_rng(17)
    dn_anchor = int(mesh.dn_anchors[mesh.dn_weights > 0][0])
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0], dn_anchor],
                   np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    state_u, _ = run_solver(tables, nid, forces, T, p.delta_t,
                            dtype=jnp.float64)
    u_ref = np.asarray(state_u[0])

    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float64,
                                 chunk=15, interpret=True)
    u_m = mesh_u_global(plan, state_m[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_ref, rtol=0, atol=5e-12 * scale)


def test_mesh_packed_checkpoint_restart():
    """A canonical (u, up) checkpoint written from the packed mesh
    carry restores bit-exactly through restore_mesh_state (the sim.py
    resume contract: global [N, 3] fields in, carry out)."""
    from hercules_tpu.solver.pallas_mesh import mesh_carry_views

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    mesh = _depth_graded_mesh(p, cvm)
    p.type_of_damping = "rayleigh"
    tables = assemble(mesh, p)
    plan = build_plan(mesh, min_brick_elems=512)

    T = 40
    rng = np.random.default_rng(7)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0]], np.int32)
    forces = rng.standard_normal((T, 1, 3)) * 1e8

    def run(steps, **kw):
        return run_mesh_solver(plan, tables, nid, forces, steps,
                               p.delta_t, dtype=jnp.float64, chunk=10,
                               interpret=True, **kw)

    state_a, _ = run(T)
    state_h, _ = run(T // 2)
    # the packed carry is in effect on this (elastic, plane-rec) mesh
    assert np.shape(state_h[0][0])[0] == 8
    us, ups, tail = mesh_carry_views(state_h)
    assert tail == ()
    u_now = mesh_u_global(plan, us, mesh.nnum)
    u_prev = mesh_u_global(plan, ups, mesh.nnum)
    state_r, _ = run(T, state=(u_now, u_prev), start_step=T // 2)

    u_a = mesh_u_global(plan, state_a[0], mesh.nnum)
    u_r = mesh_u_global(plan, state_r[0], mesh.nnum)
    np.testing.assert_array_equal(u_a, u_r)


def test_mesh_bkt_conv_basis_restart(monkeypatch):
    """A BKT checkpoint crosses solver layouts: node-basis memory
    variables written by the packed uniform-Q path restore into the
    legacy corner-basis kernels (and vice versa) through the exact
    basis conversions in restore_mesh_state/_fit_mesh_conv."""
    import os
    from hercules_tpu.solver.pallas_mesh import mesh_carry_views

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    mesh = _depth_graded_mesh(p, cvm)
    p.type_of_damping = "bkt"
    tables = assemble(mesh, p)
    plan = build_plan(mesh, min_brick_elems=512)

    T = 40
    rng = np.random.default_rng(3)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0]], np.int32)
    forces = rng.standard_normal((T, 1, 3)) * 1e8

    def run(steps, packed, **kw):
        monkeypatch.setenv("HT_MESH_PACKED", "1" if packed else "0")
        try:
            return run_mesh_solver(plan, tables, nid, forces, steps,
                                   p.delta_t, dtype=jnp.float64,
                                   chunk=10, interpret=True, **kw)
        finally:
            monkeypatch.delenv("HT_MESH_PACKED")

    def canonical(state):
        us, ups, tail = mesh_carry_views(state)
        conv = tail[0] if tail else ()
        flat = list(conv[: len(plan.bricks)])
        if len(conv) > len(plan.bricks):
            flat += list(conv[-1])
        return (mesh_u_global(plan, us, mesh.nnum),
                mesh_u_global(plan, ups, mesh.nnum), tuple(flat))

    # reference: uninterrupted legacy run
    state_l, _ = run(T, packed=False)
    u_ref = mesh_u_global(plan, mesh_carry_views(state_l)[0],
                          mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0

    # packed halfway -> legacy resume (node -> corner conversion)
    half_p, _ = run(T // 2, packed=True)
    assert np.shape(half_p[0][0])[0] == 8          # really packed
    u0, u1, conv_flat = canonical(half_p)
    st, _ = run(T, packed=False, state=(u0, u1, conv_flat),
                start_step=T // 2)
    u = mesh_u_global(plan, mesh_carry_views(st)[0], mesh.nnum)
    np.testing.assert_allclose(u, u_ref, rtol=0, atol=2e-11 * scale)

    # legacy halfway -> packed resume (corner -> node conversion)
    half_l, _ = run(T // 2, packed=False)
    u0, u1, conv_flat = canonical(half_l)
    st, _ = run(T, packed=True, state=(u0, u1, conv_flat),
                start_step=T // 2)
    u = mesh_u_global(plan, mesh_carry_views(st)[0], mesh.nnum)
    np.testing.assert_allclose(u, u_ref, rtol=0, atol=2e-11 * scale)


def test_mesh_pallas_nonlinear_matches_unstructured(tmp_path):
    """Nonlinear on the packed mesh path: the fused kernels skip the
    nonlinear (soft, Vs<cut) elements and an XLA subset pass adds
    their plastic + damping forces pre-reconciliation — trajectories
    and plastic state match the unstructured oracle exactly (f64)."""
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.nonlinear import (NonlinearConfig,
                                        build_nonlinear_tables)
    from hercules_tpu.solver.pallas_mesh import (MeshPallasTables,
                                                 attach_nonlinear_mesh,
                                                 mesh_carry_views)
    from hercules_tpu.solver.step import attach_nonlinear, run_solver
    from hercules_tpu.tools.makecvm import build_layered_cvm

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    # soft layer over stiff halfspace: the vsrule grades the mesh in
    # depth and Vs<cut selects only the soft-layer elements
    build_layered_cvm(f"{tmp_path}/l.e", 1000.0, 1000.0, 500.0, 62.5,
                      [[0.0, 3000.0, 1500.0, 2300.0],
                       [250.0, 6000.0, 3464.0, 2700.0]])
    cvm = CVM(f"{tmp_path}/l.e")
    p.freq = 2.0
    p.vscut = 0.0          # keep the soft layer's true Vs
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
    assert 0 < nlt.n < mesh.lenum          # a genuine mixed mesh

    T = 60
    rng = np.random.default_rng(9)
    # drive a node inside the soft layer so plastic flow actually fires
    nid = np.array([mesh.elem_lnid[nlt.eidx[len(nlt.eidx) // 2], 0]],
                   np.int32)
    forces = rng.standard_normal((T, 1, 3)) * 1e9

    nl_u = attach_nonlinear(mesh, p, tables, nlt, dtype=jnp.float64)
    state_u, _ = run_solver(tables, nid, forces, T, p.delta_t,
                            dtype=jnp.float64, nl=nl_u)
    u_ref = np.asarray(state_u[0])

    plan = build_plan(mesh)
    mesh_nl = attach_nonlinear_mesh(mesh, p, tables, nlt, plan,
                                    dtype=jnp.float64)
    mt = MeshPallasTables(plan, tables, nl=mesh_nl, dtype=jnp.float64)
    assert mt.packed and mt.plane_rec is not None
    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float64,
                                 chunk=20, interpret=True, nl=mesh_nl)
    us, ups, tail = mesh_carry_views(state_m)
    u_m = mesh_u_global(plan, us, mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_ref, rtol=0, atol=5e-12 * scale)
    # plastic state (sig, pstr, ep) matches element-for-element
    (nlstate_m,) = tail
    for a, b in zip(nlstate_m, state_u[3][:3]):
        sb = max(np.abs(np.asarray(b)).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-12 * sb)
    # ... and plasticity actually fired (ep > 0 somewhere)
    assert float(np.abs(np.asarray(nlstate_m[2])).max()) > 0


def test_mesh_pallas_nonlinear_geostatic_matches(tmp_path):
    """Geostatic loading on the packed mesh path: precomputed gravity
    rows, bottom-reaction capture/replay, and the bottom-node z pin
    reproduce the unstructured oracle exactly (f64)."""
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.nonlinear import (NonlinearConfig,
                                        build_nonlinear_tables)
    from hercules_tpu.solver.pallas_mesh import (attach_nonlinear_mesh,
                                                 mesh_carry_views,
                                                 mesh_u_global,
                                                 run_mesh_solver)
    from hercules_tpu.solver.step import attach_nonlinear, run_solver
    from hercules_tpu.tools.makecvm import build_layered_cvm

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    build_layered_cvm(f"{tmp_path}/l.e", 1000.0, 1000.0, 500.0, 62.5,
                      [[0.0, 3000.0, 1500.0, 2300.0],
                       [250.0, 6000.0, 3464.0, 2700.0]])
    cvm = CVM(f"{tmp_path}/l.e")
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
    cfg.kay_phis = np.array([1e4, 1e4])
    cfg.strain_rates = np.array([1e-3, 1e-3])
    cfg.sensitivities = np.array([1.0, 1.0])
    cfg.hardening = np.array([0.0, 0.0])
    cfg.geostatic_loading_t = 0.02      # loading window inside the run
    cfg.geostatic_cushion_t = 0.01
    nlt = build_nonlinear_tables(mesh, p, cfg)
    assert 0 < nlt.n < mesh.lenum and len(nlt.bot_eidx) > 0

    T = 60
    nid = np.array([mesh.elem_lnid[nlt.eidx[len(nlt.eidx) // 2], 0]],
                   np.int32)
    forces = np.zeros((T, 1, 3))
    forces[30:40] = 1e9                 # source after loading settles

    nl_u = attach_nonlinear(mesh, p, tables, nlt, dtype=jnp.float64)
    state_u, _ = run_solver(tables, nid, forces, T, p.delta_t,
                            dtype=jnp.float64, nl=nl_u)
    u_ref = np.asarray(state_u[0])

    plan = build_plan(mesh)
    mesh_nl = attach_nonlinear_mesh(mesh, p, tables, nlt, plan,
                                    dtype=jnp.float64)
    assert mesh_nl["geostatic"] and mesh_nl["bot"] is not None
    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float64,
                                 chunk=20, interpret=True, nl=mesh_nl)
    us, ups, tail = mesh_carry_views(state_m)
    u_m = mesh_u_global(plan, us, mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_ref, rtol=0, atol=5e-12 * scale)
    # full plastic state including the captured bottom reactions
    (nlstate_m,) = tail
    assert len(nlstate_m) == 4
    for a, b in zip(nlstate_m, state_u[3]):
        sb = max(np.abs(np.asarray(b)).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-12 * sb)
    assert float(np.abs(np.asarray(nlstate_m[3])).max()) > 0


def test_mesh_packed_snapshots():
    """Rate-strided (u, up) snapshots from the packed mesh carry (the
    4-D/plane output tap path): each emitted pair equals the state of
    an equal-length plain run."""
    from hercules_tpu.solver.pallas_mesh import mesh_carry_views

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    cvm = CVM(f"{S}/simple_case.e")
    mesh = _depth_graded_mesh(p, cvm)
    tables = assemble(mesh, p)
    plan = build_plan(mesh, min_brick_elems=512)

    T = 30
    rng = np.random.default_rng(13)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0]], np.int32)
    forces = rng.standard_normal((T, 1, 3)) * 1e8

    snaps = {}

    def on_snap(done, pair):
        us, ups = pair
        snaps[done] = (mesh_u_global(plan, us, mesh.nnum),
                       mesh_u_global(plan, ups, mesh.nnum))

    state, _ = run_mesh_solver(plan, tables, nid, forces, T,
                               p.delta_t, dtype=jnp.float64, chunk=20,
                               interpret=True, on_snap=on_snap,
                               snap_every=10)
    assert sorted(snaps) == [10, 20, 30]
    for done in (10, 20):
        st_k, _ = run_mesh_solver(plan, tables, nid, forces, done,
                                  p.delta_t, dtype=jnp.float64,
                                  chunk=done, interpret=True)
        us, ups, _ = mesh_carry_views(st_k)
        np.testing.assert_array_equal(
            snaps[done][0], mesh_u_global(plan, us, mesh.nnum))
        np.testing.assert_array_equal(
            snaps[done][1], mesh_u_global(plan, ups, mesh.nnum))
