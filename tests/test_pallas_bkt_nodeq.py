"""Heterogeneous-Q BKT: the general node-basis tier (per-node
coefficient rows + mixed-element epilogue, pallas_brick.py
_make_bkt_node_kernel) vs the corner-basis kernel and the XLA brick
oracle, on a depth-layered mesh (f64 interpret mode on CPU).

The production attenuation config (Qs(Vs) fit quantized to the QTABLE,
psolve.c:7252-7311) gives per-element coefficient sets, which used to
force the 8x-slower corner-basis kernel; this tier keeps the node-basis
convolution stream and restores exactness with an XLA epilogue over the
one element plane per material interface."""

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.material import QTABLE, search_quality_table
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.bricks import build_plan
from hercules_tpu.solver.brickstep import (brick_u_global,
                                           run_brick_solver)
from hercules_tpu.solver.pallas_brick import (PallasBrickTables,
                                              assign_bkt_node_coeffs,
                                              bkn_coef_keys,
                                              pallas_u_global,
                                              run_pallas_solver)

S = "/root/reference/examples/simple"

# three depth layers: (Vp, Vs, rho, Q_shear, Q_kappa)
LAYERS = [(2400.0, 1200.0, 2100.0, 55.0, 60.0),
          (4000.0, 2000.0, 2500.0, 120.0, 150.0),
          (6000.0, 3464.0, 2700.0, 350.0, 400.0)]


def _qrow(q, prefix, props, sel):
    idx = int(search_quality_table(np.array([q]))[0])
    row = QTABLE[idx]
    for ci, c in enumerate(("a0", "a1", "g0", "g1", "b")):
        key = (f"{c}_{prefix}" if c in ("a0", "a1")
               else f"{c}_{prefix}")
        props[key][sel] = row[ci + 1]


def _problem(kappa):
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.use_infinite_qk = not kappa
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    E = mesh.lenum
    z = mesh.elem_z.astype(np.float64)
    layer = np.digitize(z, np.quantile(z, [1 / 3, 2 / 3]))
    props = {k: np.zeros(E) for k in
             ("Vp", "Vs", "rho", "a0_shear", "a1_shear", "g0_shear",
              "g1_shear", "b_shear", "a0_kappa", "a1_kappa",
              "g0_kappa", "g1_kappa", "b_kappa")}
    for li, (vp, vs, rho, qs, qk) in enumerate(LAYERS):
        sel = layer == li
        props["Vp"][sel] = vp
        props["Vs"][sel] = vs
        props["rho"][sel] = rho
        _qrow(qs, "shear", props, sel)
        if kappa:
            _qrow(qk, "kappa", props, sel)
    mesh.props = props
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    return p, mesh, tables, plan


@pytest.fixture(scope="module")
def het_shear():
    return _problem(kappa=False)


@pytest.fixture(scope="module")
def het_full():
    return _problem(kappa=True)


def _run_pair(problem, monkeypatch, T=36):
    p, mesh, tables, plan = problem
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    rng = np.random.default_rng(23)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)

    pt = PallasBrickTables(plan, tables, dtype=jnp.float64)
    assert not pt.bkt_uniform, "layered props must not detect uniform"
    assert pt.bkt_nodeq and pt.mix_M > 0

    state_n, samp_n = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state_c, samp_c = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)
    monkeypatch.delenv("HT_BKT_NODEQ")
    return (p, mesh, tables, plan, nid, forces, state_n, samp_n,
            state_c, samp_c)


def test_nodeq_matches_corner_kernel_shear(het_shear, monkeypatch):
    (_, mesh, _, plan, _, _, state_n, samp_n,
     state_c, samp_c) = _run_pair(het_shear, monkeypatch)
    u_n = pallas_u_global(plan, state_n[0], mesh.nnum)
    u_c = pallas_u_global(plan, state_c[0], mesh.nnum)
    scale = np.abs(u_c).max()
    assert scale > 0
    np.testing.assert_allclose(u_n, u_c, rtol=0, atol=5e-13 * scale)
    np.testing.assert_allclose(samp_n, samp_c, rtol=0,
                               atol=5e-13 * max(np.abs(samp_c).max(), 1))


def test_nodeq_matches_corner_kernel_full(het_full, monkeypatch):
    (_, mesh, _, plan, _, _, state_n, samp_n,
     state_c, samp_c) = _run_pair(het_full, monkeypatch)
    u_n = pallas_u_global(plan, state_n[0], mesh.nnum)
    u_c = pallas_u_global(plan, state_c[0], mesh.nnum)
    scale = np.abs(u_c).max()
    assert scale > 0
    np.testing.assert_allclose(u_n, u_c, rtol=0, atol=5e-13 * scale)
    np.testing.assert_allclose(samp_n, samp_c, rtol=0,
                               atol=5e-13 * max(np.abs(samp_c).max(), 1))


def test_nodeq_matches_brick_oracle(het_shear, monkeypatch):
    """Direct check against the XLA brick solver (independent of the
    corner-basis kernel)."""
    p, mesh, tables, plan = het_shear
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    T = 36
    rng = np.random.default_rng(29)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    state_b, _ = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t, dtype=jnp.float64)
    state_n, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t, dtype=jnp.float64,
        interpret=True)
    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_n = pallas_u_global(plan, state_n[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_n, u_b, rtol=0, atol=2e-12 * scale)


def test_nodeq_resume_cross_basis(het_shear, monkeypatch):
    """Checkpoints convert exactly in both directions: nodeq half +
    corner half == corner run, and corner half + nodeq half == the
    same trajectory (conv_corner_to_nodeq / conv_nodeq_to_corner)."""
    p, mesh, tables, plan = het_shear
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    T, H = 24, 12
    rng = np.random.default_rng(31)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state_ref, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True)
    monkeypatch.delenv("HT_BKT_NODEQ")
    u_ref = pallas_u_global(plan, state_ref[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0

    # nodeq first half -> (u, up, conv_node, conv_mix)
    half, _ = run_pallas_solver(
        plan, tables, nid, forces[:H], H, p.delta_t,
        dtype=jnp.float64, interpret=True)
    assert len(half) == 4 and half[2].shape[0] in (8, 16)

    # resumed on the corner-basis kernel
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state2, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True,
        state=tuple(np.asarray(x) for x in half), start_step=H)
    u2 = pallas_u_global(plan, state2[0], mesh.nnum)
    np.testing.assert_allclose(u2, u_ref, rtol=0, atol=1e-12 * scale)

    # corner first half resumed on the nodeq tier
    halfc, _ = run_pallas_solver(
        plan, tables, nid, forces[:H], H, p.delta_t,
        dtype=jnp.float64, interpret=True)
    monkeypatch.delenv("HT_BKT_NODEQ")
    assert halfc[2].shape[0] in (48, 96)
    state3, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True,
        state=tuple(np.asarray(x) for x in halfc), start_step=H)
    u3 = pallas_u_global(plan, state3[0], mesh.nnum)
    np.testing.assert_allclose(u3, u_ref, rtol=0, atol=1e-12 * scale)


def _layer_props(mesh, kappa):
    E = mesh.lenum
    z = mesh.elem_z.astype(np.float64)
    layer = np.digitize(z, np.quantile(z, [1 / 3, 2 / 3]))
    props = {k: np.zeros(E) for k in
             ("Vp", "Vs", "rho", "a0_shear", "a1_shear", "g0_shear",
              "g1_shear", "b_shear", "a0_kappa", "a1_kappa",
              "g0_kappa", "g1_kappa", "b_kappa")}
    for li, (vp, vs, rho, qs, qk) in enumerate(LAYERS):
        sel = layer == li
        props["Vp"][sel] = vp
        props["Vs"][sel] = vs
        props["rho"][sel] = rho
        _qrow(qs, "shear", props, sel)
        if kappa:
            _qrow(qk, "kappa", props, sel)
    return props


def test_mesh_nodeq_graded_matches_brick_oracle(monkeypatch):
    """Multi-brick packed mesh path with heterogeneous-Q bricks (nodeq
    tier per brick + mixed epilogues, hanging nodes at the grading
    interface) vs the XLA brick solver (f64 interpret)."""
    from hercules_tpu.mesh import Octree, extract_mesh
    from hercules_tpu.solver.pallas_mesh import (MeshPallasTables,
                                                 mesh_u_global,
                                                 run_mesh_solver)

    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.use_infinite_qk = True
    p.finalize()
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        # depth-graded (fine near the free surface): full z-plane
        # brick interface, so the packed path's dense plane
        # reconciler applies -- the production terashake shape
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        near = z < (1 << 28)
        return lv < np.where(near, 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    mesh.props = _layer_props(mesh, kappa=False)
    tables = assemble(mesh, p)
    # the small coarse slab must become a brick (not loose): the
    # packed path's plane reconciler needs two z-slab bricks
    plan = build_plan(mesh, min_brick_elems=512)
    assert len(plan.grp_node) > 0          # hanging/interface nodes

    mt = MeshPallasTables(plan, tables, dtype=jnp.float64)
    assert mt.packed
    modes = [m[0] for m in mt.bkt_modes]
    assert "nodeq" in modes
    assert len(mt.mix_slots) > 0

    T = 36
    rng = np.random.default_rng(37)
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0],
                    mesh.elem_lnid[2, 6]], np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[4, mesh.lenum - 3]]
    st_phi = np.full((2, 8), 0.125)

    state_b, samp_b = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=18)
    state_m, samp_m = run_mesh_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64, chunk=18,
        interpret=True)
    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_m = mesh_u_global(plan, state_m[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_m, u_b, rtol=0, atol=5e-12 * scale)
    np.testing.assert_allclose(samp_m, samp_b, rtol=0,
                               atol=5e-12 * max(np.abs(samp_b).max(), 1))


def test_assignment_invariants(het_shear):
    """assign_bkt_node_coeffs: every node carries the rows of one
    adjacent valid element; non-mixed elements see their own set at
    all 8 corners; the layered mesh's mixed set is one element plane
    per interface."""
    _, mesh, tables, plan = het_shear
    pt = PallasBrickTables(plan, tables, dtype=jnp.float64)
    offs = pt.offs
    ev = pt.evalid
    ecols = np.flatnonzero(ev)
    src = pt.bkn_node_src
    # every corner node of a valid element has a source element
    for o in offs:
        assert (src[ecols + o] >= 0).all()
    # source elements are valid and adjacent (node - src is a corner
    # offset)
    n = np.flatnonzero(src >= 0)
    assert ev[src[n]].all()
    assert np.isin(n - src[n], offs).all()
    # mixed set: the layered mesh has 2 interfaces -> mixed elements
    # fill whole element planes (z-major layout: below each interface)
    M = len(pt.bkn_mixed_cols)
    assert 0 < M < len(ecols) // 2


def test_mix_runs_equals_gather_epilogue(het_full, monkeypatch):
    """Round-5 dense run epilogue (_bkt_mix_runs: static slices, no
    gather/scatter — the scatter is the op that faults the v5e
    runtime at large M) vs the scattered-gather fallback: identical
    trajectories on the layered fixture."""
    from hercules_tpu.solver.pallas_brick import run_pallas_solver

    p, mesh, tables, plan = het_full
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED_ABS", "100000000")
    T = 12
    rng = np.random.default_rng(5)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    pt = PallasBrickTables(plan, tables, dtype=jnp.float64)
    assert pt.bkt_nodeq and pt.mix_M > 0
    assert pt.mix_runs is not None          # layered => few runs
    state_r, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                   p.delta_t, dtype=jnp.float64,
                                   interpret=True)

    monkeypatch.setenv("HT_BKT_MIX_RUNS", "0")
    pt2 = PallasBrickTables(plan, tables, dtype=jnp.float64)
    assert pt2.bkt_nodeq and pt2.mix_runs is None
    state_g, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                   p.delta_t, dtype=jnp.float64,
                                   interpret=True)
    u_r = pallas_u_global(plan, state_r[0], mesh.nnum)
    u_g = pallas_u_global(plan, state_g[0], mesh.nnum)
    scale = np.abs(u_g).max()
    assert scale > 0
    np.testing.assert_allclose(u_r, u_g, rtol=0, atol=1e-14 * scale)


def test_nodeq_bf16g_vs_exact_f32(het_full, monkeypatch):
    """Round-5 staged-bf16 b4 operand for the nodeq kernel
    (_bkt_bf16g): f32 default run judged against the exact-f32
    HT_MXU_PREC=highest path with the elastic align8 error budget
    (b4 ~2^-20 relative force error/step; the conv recursion and the
    cf_rows reconstruction stay exact, so only the force dot
    differs)."""
    p, mesh, tables, plan = het_full
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    T = 36
    rng = np.random.default_rng(7)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    us = {}
    for name, env in (("b4", {}),
                      ("exact", {"HT_MXU_PREC": "highest"})):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        pt = PallasBrickTables(plan, tables, dtype=jnp.float32)
        assert pt.bkt_nodeq
        st, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float32,
                                  interpret=True)
        us[name] = pallas_u_global(plan, st[0], mesh.nnum)
        for k in env:
            monkeypatch.delenv(k)
    scale = np.abs(us["exact"]).max()
    assert scale > 0
    err = np.abs(us["b4"] - us["exact"]).max() / scale
    assert err < 1e-4, err


def test_nodeq_cf3_bit_exact(het_full, monkeypatch):
    """The 3-term bf16 coefficient split (HT_BKT_CF3, exact by
    construction: 8+8+8 mantissa bits cover f32's 24 and the one-hot
    contraction accumulates in f32) is BIT-identical to the
    HIGHEST-precision one-hot dot it replaces.  Isolated under
    HT_MXU_PREC=highest so the force dot is identical in both."""
    p, mesh, tables, plan = het_full
    monkeypatch.setenv("HT_BKT_NODEQ_MAX_MIXED", "0.9")
    monkeypatch.setenv("HT_MXU_PREC", "highest")
    T = 12
    rng = np.random.default_rng(9)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    us = {}
    for v in ("1", "0"):
        monkeypatch.setenv("HT_BKT_CF3", v)
        st, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float32,
                                  interpret=True)
        us[v] = pallas_u_global(plan, st[0], mesh.nnum)
    assert np.abs(us["0"]).max() > 0
    assert np.array_equal(us["1"], us["0"])
