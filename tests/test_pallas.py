"""Fused Pallas brick kernel vs the XLA brick solver: identical
trajectories on a uniform single-brick mesh (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.bricks import build_plan
from hercules_tpu.solver.brickstep import (brick_u_global,
                                           run_brick_solver)
from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                              plan_applies,
                                              run_pallas_solver)

S = "/root/reference/examples/simple"


@pytest.fixture(scope="module")
def problem():
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    return p, mesh, tables, plan


def test_pallas_matches_brick_solver(problem):
    p, mesh, tables, plan = problem
    assert plan_applies(plan, tables.damping)

    T = 40
    rng = np.random.default_rng(3)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3))
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)

    state_b, samp_b = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64)
    state_p, samp_p = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)

    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_p = pallas_u_global(plan, state_p[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_p, u_b, rtol=0, atol=2e-13 * scale)
    np.testing.assert_allclose(samp_p, samp_b, rtol=0,
                               atol=2e-13 * max(np.abs(samp_b).max(), 1))
    # padding region stays exactly zero
    nb = plan.bricks[0].nb
    assert not np.asarray(state_p[0])[:, nb:].any()


def test_pallas_bkt_matches_brick_solver():
    """Fused BKT kernel (spectral-basis convolution state) vs the XLA
    brick solver on a uniform mesh (interpret mode, f64)."""
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    assert plan_applies(plan, tables.damping)

    T = 40
    rng = np.random.default_rng(7)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)

    state_b, samp_b = run_brick_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64)
    state_p, samp_p = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)

    u_b = brick_u_global(plan, state_b[0], mesh.nnum)
    u_p = pallas_u_global(plan, state_p[0], mesh.nnum)
    scale = np.abs(u_b).max()
    assert scale > 0
    np.testing.assert_allclose(u_p, u_b, rtol=0, atol=2e-12 * scale)
    np.testing.assert_allclose(samp_p, samp_b, rtol=0,
                               atol=2e-12 * max(np.abs(samp_b).max(), 1))


def test_pallas_tiers_agree(problem, monkeypatch):
    """The kernel specialization tiers (general / staged uniform-beta /
    folded uniform-material; detect_tier, pallas_brick.py) produce the
    same trajectory.  examples/simple is homogeneous so the auto tier
    is 'umat'; HT_PALLAS_TIER caps it down for the cross-check."""
    from hercules_tpu.solver.pallas_brick import detect_tier  # noqa: F401

    p, mesh, tables, plan = problem
    T = 25
    rng = np.random.default_rng(11)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3))

    results = {}
    for tier in ("general", "ubeta", "umat"):
        monkeypatch.setenv("HT_PALLAS_TIER", tier)
        state, _ = run_pallas_solver(
            plan, tables, nid, forces, T, p.delta_t,
            dtype=jnp.float64, interpret=True)
        results[tier] = pallas_u_global(plan, state[0], mesh.nnum)
    monkeypatch.delenv("HT_PALLAS_TIER")

    scale = np.abs(results["general"]).max()
    assert scale > 0
    for tier in ("ubeta", "umat"):
        np.testing.assert_allclose(results[tier], results["general"],
                                   rtol=0, atol=5e-13 * scale)


def test_packed_state_kernel_matches_unpacked(problem):
    """build_call_packed ([8,LEN] state/const layout, half the physical
    HBM bytes) is operator-identical to the legacy build_call path
    (f64 interpret mode vs the unstructured oracle)."""
    from hercules_tpu.solver.pallas_brick import (PallasBrickTables,
                                                  init_packed_state,
                                                  make_packed_pallas_step)
    from hercules_tpu.solver.step import run_solver

    p, mesh, tables, plan = problem
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    src_ids = np.array([nid], np.int32)
    T = 60
    forces = np.zeros((T, 1, 3))
    forces[:10, 0, :] = 1e8
    state_ref, samp_ref = run_solver(
        tables, src_ids, forces, T, p.delta_t,
        st_nodes=mesh.elem_lnid[:2], st_phi=np.full((2, 8), 0.125),
        dtype=jnp.float64)
    u_ref = np.asarray(state_ref[0])

    pt = PallasBrickTables(plan, tables, src_ids=src_ids,
                           st_nodes=mesh.elem_lnid[:2],
                           st_phi=np.full((2, 8), 0.125),
                           dtype=jnp.float64)
    step, consts = make_packed_pallas_step(pt, interpret=True)
    state = init_packed_state(pt)
    import jax
    dt2 = p.delta_t ** 2
    xs = (jnp.asarray(forces * dt2, jnp.float64),
          jnp.arange(T, dtype=jnp.int32))
    scan = jax.jit(lambda c, s, x: jax.lax.scan(
        lambda cr, xx: step(c, cr, xx), s, x))
    state, samples = scan(consts, state, xs)
    S = np.asarray(state[0])
    from hercules_tpu.solver.pallas_brick import pallas_u_global
    u = pallas_u_global(plan, S[0:3], mesh.nnum)
    up = pallas_u_global(plan, S[3:6], mesh.nnum)
    u_prev_ref = np.asarray(state_ref[1])
    np.testing.assert_allclose(u, u_ref, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(up, u_prev_ref, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(samples),
                               np.asarray(samp_ref), rtol=1e-12,
                               atol=1e-18)


@pytest.fixture(scope="module")
def bkt_problem():
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = "bkt"
    p.finalize()
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    tables = assemble(mesh, p)
    plan = build_plan(mesh)
    return p, mesh, tables, plan


def test_bkt_uniform_tier_matches_corner_kernel(bkt_problem,
                                                monkeypatch):
    """Uniform-Q node-basis BKT kernel (packed state, 12-row conv,
    _make_bkt_uniform_kernel) vs the corner-basis kernel
    (HT_BKT_UNIFORM=0 + HT_BKT_NODEQ=0) on the homogeneous mesh: identical
    trajectories (f64 interpret)."""
    from hercules_tpu.solver.pallas_brick import PallasBrickTables

    p, mesh, tables, plan = bkt_problem
    T = 30
    rng = np.random.default_rng(13)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)

    pt = PallasBrickTables(plan, tables, dtype=jnp.float64)
    assert pt.bkt_uniform, "homogeneous mesh must detect uniform Q"

    state_u, samp_u = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)

    monkeypatch.setenv("HT_BKT_UNIFORM", "0")
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state_c, samp_c = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float64,
        interpret=True)
    monkeypatch.delenv("HT_BKT_UNIFORM")
    monkeypatch.delenv("HT_BKT_NODEQ")

    u_u = pallas_u_global(plan, state_u[0], mesh.nnum)
    u_c = pallas_u_global(plan, state_c[0], mesh.nnum)
    scale = np.abs(u_c).max()
    assert scale > 0
    np.testing.assert_allclose(u_u, u_c, rtol=0, atol=5e-13 * scale)
    np.testing.assert_allclose(samp_u, samp_c, rtol=0,
                               atol=5e-13 * max(np.abs(samp_c).max(), 1))


def test_bkt_conv_basis_conversion_resume(bkt_problem, monkeypatch):
    """A run checkpointed under one conv basis resumes exactly under
    the other (conv_corner_to_node / conv_node_to_corner): uniform
    first half + corner second half == uninterrupted corner run."""
    p, mesh, tables, plan = bkt_problem
    T = 24
    H = T // 2
    rng = np.random.default_rng(17)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    monkeypatch.setenv("HT_BKT_UNIFORM", "0")
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state_ref, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True)
    u_ref = pallas_u_global(plan, state_ref[0], mesh.nnum)
    monkeypatch.delenv("HT_BKT_UNIFORM")
    monkeypatch.delenv("HT_BKT_NODEQ")

    # first half on the uniform tier -> (u, up, conv_node)
    half, _ = run_pallas_solver(
        plan, tables, nid, forces[:H], H, p.delta_t,
        dtype=jnp.float64, interpret=True)
    assert half[2].shape[0] in (8, 16)   # node basis written

    # resume the second half on the corner-basis kernel
    monkeypatch.setenv("HT_BKT_UNIFORM", "0")
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    state2, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True,
        state=tuple(np.asarray(x) for x in half), start_step=H)
    monkeypatch.delenv("HT_BKT_UNIFORM")
    monkeypatch.delenv("HT_BKT_NODEQ")
    u2 = pallas_u_global(plan, state2[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u2, u_ref, rtol=0, atol=1e-12 * scale)

    # and the reverse: corner half resumed on the uniform tier
    monkeypatch.setenv("HT_BKT_UNIFORM", "0")
    monkeypatch.setenv("HT_BKT_NODEQ", "0")
    halfc, _ = run_pallas_solver(
        plan, tables, nid, forces[:H], H, p.delta_t,
        dtype=jnp.float64, interpret=True)
    monkeypatch.delenv("HT_BKT_UNIFORM")
    monkeypatch.delenv("HT_BKT_NODEQ")
    assert halfc[2].shape[0] in (48, 96)
    state3, _ = run_pallas_solver(
        plan, tables, nid, forces, T, p.delta_t,
        dtype=jnp.float64, interpret=True,
        state=tuple(np.asarray(x) for x in halfc), start_step=H)
    u3 = pallas_u_global(plan, state3[0], mesh.nnum)
    np.testing.assert_allclose(u3, u_ref, rtol=0, atol=1e-12 * scale)


def test_bf16_staged_gather_bit_identical(problem, monkeypatch):
    """HT_PALLAS_BF16GATHER=1 (per-tile staged Wh/Wl split) is
    bit-identical to the per-chunk b3 split (same Wh/Wl values) --
    f32 interpret mode.  ALIGN8 pinned off: its K=128 operand layout
    computes the b4 product (covered by test_align8_gather)."""
    p, mesh, tables, plan = problem
    T = 25
    rng = np.random.default_rng(41)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3))
    us = {}
    monkeypatch.setenv("HT_PALLAS_ALIGN8", "0")
    for v in ("1", "0"):
        monkeypatch.setenv("HT_PALLAS_BF16GATHER", v)
        st, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float32,
                                  interpret=True)
        us[v] = pallas_u_global(plan, st[0], mesh.nnum)
    monkeypatch.delenv("HT_PALLAS_BF16GATHER")
    monkeypatch.delenv("HT_PALLAS_ALIGN8")
    assert np.array_equal(us["1"], us["0"])
    assert np.abs(us["0"]).max() > 0


def test_align8_gather(problem, monkeypatch):
    """The default align8 dataflow (8-row-aligned staged gather,
    K=128 [X8; X8] MXU operand) computes the b4 split product: at
    least as accurate as the b3 split it replaces, both judged
    against the exact-f32 HT_MXU_PREC=highest path."""
    p, mesh, tables, plan = problem
    T = 25
    rng = np.random.default_rng(41)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3))
    us = {}
    for name, env in (("align8", {"HT_PALLAS_ALIGN8": "1"}),
                      ("b3", {"HT_PALLAS_ALIGN8": "0"}),
                      ("exact", {"HT_MXU_PREC": "highest"})):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        st, _ = run_pallas_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float32,
                                  interpret=True)
        us[name] = pallas_u_global(plan, st[0], mesh.nnum)
        for k in env:
            monkeypatch.delenv(k)
    scale = np.abs(us["exact"]).max()
    assert scale > 0
    err8 = np.abs(us["align8"] - us["exact"]).max() / scale
    err3 = np.abs(us["b3"] - us["exact"]).max() / scale
    assert err8 <= max(err3, 1e-7) * 1.01
    assert err8 < 1e-4


def test_bkt_uniform_bf16g_vs_exact_f32(bkt_problem, monkeypatch):
    """Round-5 staged-bf16 b4 operand for the uniform-Q BKT kernel
    (_bkt_bf16g; default OFF here — the uniform kernel is DMA-bound
    and the mode is an opt-in ablation): judged against the
    exact-f32 HT_MXU_PREC=highest path with the elastic align8 error
    budget."""
    from hercules_tpu.solver.pallas_brick import PallasBrickTables

    p, mesh, tables, plan = bkt_problem
    T = 30
    rng = np.random.default_rng(13)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    us = {}
    for name, env in (("b4", {"HT_BKT_BF16G": "1"}),
                      ("exact", {"HT_MXU_PREC": "highest"})):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        pt = PallasBrickTables(plan, tables, dtype=jnp.float32)
        assert pt.bkt_uniform
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


def test_resident_matches_streaming_bit_exact(problem, monkeypatch):
    """The VMEM-resident time loop (build_resident_call: whole chunk
    inside one pallas kernel, state never leaves VMEM) is
    BIT-IDENTICAL to the streaming packed kernel on the displacement
    field: the per-tile compute is the same make_run body, the last
    tile's halo is masked garbage in both, and the source injection
    reproduces the streaming rounding order (srcf*dt2 -> f32, then
    f32 invm multiply).  Station samples may differ at ulp level
    (einsum accumulation order)."""
    p, mesh, tables, plan = problem
    T = 37
    rng = np.random.default_rng(3)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)
    res = {}
    for v in ("1", "0"):
        monkeypatch.setenv("HT_PALLAS_RESIDENT", v)
        st, smp = run_pallas_solver(
            plan, tables, nid, forces, T, p.delta_t,
            st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float32,
            interpret=True, chunk=16)
        res[v] = (pallas_u_global(plan, st[0], mesh.nnum),
                  np.asarray(smp))
    assert np.abs(res["0"][0]).max() > 0
    assert np.array_equal(res["1"][0], res["0"][0])
    sscale = max(np.abs(res["0"][1]).max(), 1e-30)
    assert np.abs(res["1"][1] - res["0"][1]).max() / sscale < 1e-5


def test_resident_bkt_matches_streaming(bkt_problem, monkeypatch):
    """The VMEM-resident uniform-Q BKT loop (build_resident_bkt_call)
    vs the streaming packed BKT kernel: same per-tile body, same conv
    storage dtype.  Trajectories agree to ~1 ulp/step (f32; the
    in-kernel source-column adds and the fused scan body round a few
    source-adjacent lanes differently), far inside the bf16-conv
    storage error (~6e-5) and the 1e-2 golden budget."""
    from hercules_tpu.solver.pallas_brick import PallasBrickTables

    p, mesh, tables, plan = bkt_problem
    T = 37
    rng = np.random.default_rng(3)
    nid = mesh.elem_lnid[mesh.lenum // 2, :2].astype(np.int32)
    forces = rng.standard_normal((T, 2, 3)) * 1e8
    st_nodes = mesh.elem_lnid[[5, 900]]
    st_phi = np.full((2, 8), 0.125)
    res = {}
    for v in ("1", "0"):
        monkeypatch.setenv("HT_PALLAS_RESIDENT", v)
        pt = PallasBrickTables(plan, tables, dtype=jnp.float32)
        if v == "1":
            from hercules_tpu.solver.pallas_brick import \
                resident_applies
            assert resident_applies(pt, tables, jnp.float32)
        st, smp = run_pallas_solver(
            plan, tables, nid, forces, T, p.delta_t,
            st_nodes=st_nodes, st_phi=st_phi, dtype=jnp.float32,
            interpret=True, chunk=16)
        res[v] = (pallas_u_global(plan, st[0], mesh.nnum),
                  np.asarray(smp), np.asarray(st[2]))
    scale = np.abs(res["0"][0]).max()
    assert scale > 0
    assert np.abs(res["1"][0] - res["0"][0]).max() / scale < 1e-5
    cs = max(np.abs(res["0"][2].astype(np.float64)).max(), 1e-30)
    assert (np.abs(res["1"][2].astype(np.float64)
                   - res["0"][2].astype(np.float64)).max() / cs
            < 1e-4)
    ss = max(np.abs(res["0"][1]).max(), 1e-30)
    assert np.abs(res["1"][1] - res["0"][1]).max() / ss < 1e-4
