"""Small real-chip correctness checks: fused kernels vs the XLA brick
oracle in f32 ON TPU (the CPU suite only ever exercises the Mosaic
kernels in interpret mode), plus a shortened golden-seismogram run."""

import bz2
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

S = "/root/reference/examples/simple"


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


def _brick_oracle(p, tables, plan, src_ids, forces, T):
    from hercules_tpu.solver.brickstep import (brick_u_global,
                                               run_brick_solver)
    state, _ = run_brick_solver(plan, tables, src_ids, forces, T,
                                p.delta_t, dtype=jnp.float32)
    return brick_u_global(plan, state[0], plan.mesh.nnum)


def test_fused_kernel_matches_brick_f32(problem):
    """The Mosaic-compiled fused kernel == the XLA brick path on chip."""
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
    p, mesh, tables, plan, src_ids, forces, T = problem
    u_ref = _brick_oracle(p, tables, plan, src_ids, forces, T)
    state, _ = run_pallas_solver(plan, tables, src_ids, forces, T,
                                 p.delta_t, dtype=jnp.float32)
    u = pallas_u_global(plan, state[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u / scale, u_ref / scale, atol=2e-5)


def test_packed_state_kernel_matches_brick_f32(problem):
    """The packed-state kernel (build_call_packed) on chip."""
    from functools import partial
    from hercules_tpu.solver.pallas_brick import (PallasBrickTables,
                                                  init_packed_state,
                                                  make_packed_pallas_step,
                                                  pallas_u_global)
    p, mesh, tables, plan, src_ids, forces, T = problem
    u_ref = _brick_oracle(p, tables, plan, src_ids, forces, T)
    pt = PallasBrickTables(plan, tables, src_ids=src_ids)
    step, consts = make_packed_pallas_step(pt)
    scan = jax.jit(lambda c, s, xs: jax.lax.scan(partial(step, c),
                                                 s, xs)[0])
    xs = (jnp.asarray(forces * p.delta_t ** 2, jnp.float32),
          jnp.arange(T, dtype=jnp.int32))
    state = scan(consts, init_packed_state(pt), xs)
    Sarr = np.asarray(state[0])
    u = pallas_u_global(plan, Sarr[0:3], mesh.nnum)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u / scale, u_ref / scale, atol=2e-5)


def test_bkt_fused_matches_brick_f32():
    """The fused BKT kernel (memory-variable recursion on chip)."""
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.brickstep import (brick_u_global,
                                               run_brick_solver)
    from hercules_tpu.solver.pallas_brick import (pallas_u_global,
                                                  run_pallas_solver)
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
    state_b, _ = run_brick_solver(plan, tables, src_ids, forces, T,
                                  p.delta_t, dtype=jnp.float32)
    u_ref = brick_u_global(plan, state_b[0], mesh.nnum)
    state, _ = run_pallas_solver(plan, tables, src_ids, forces, T,
                                 p.delta_t, dtype=jnp.float32)
    u = pallas_u_global(plan, state[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    # bf16 convolution storage costs ~1e-4 relative force error
    np.testing.assert_allclose(u / scale, u_ref / scale, atol=5e-4)


def test_golden_seismograms_short_f32(tmp_path):
    """2000-step fp32 production-path run vs the committed reference
    seismograms (the full 20000-step check is BENCH_GOLDEN=1)."""
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


def test_packed_mesh_path_graded_f32():
    """The multi-brick packed mesh path (pallas_mesh + plane
    reconciler, Mosaic-compiled) == the XLA brick path on chip."""
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.material import MeshOrigin, correct_properties
    from hercules_tpu.mesh import Octree, extract_mesh
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.brickstep import (brick_u_global,
                                               run_brick_solver)
    from hercules_tpu.solver.pallas_mesh import (MeshPallasTables,
                                                 mesh_u_global,
                                                 run_mesh_solver)
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
    mt = MeshPallasTables(plan, tables)
    assert mt.plane_rec is not None and mt.packed

    T = 150
    nid = np.array([mesh.elem_lnid[mesh.lenum // 3, 0]], np.int32)
    forces = np.zeros((T, 1, 3), np.float32)
    forces[:10, 0, :] = 1e8
    state_b, _ = run_brick_solver(plan, tables, nid, forces, T,
                                  p.delta_t, dtype=jnp.float32)
    u_ref = brick_u_global(plan, state_b[0], mesh.nnum)
    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float32)
    u = mesh_u_global(plan, state_m[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u / scale, u_ref / scale, atol=2e-5)


def test_mesh_nonlinear_on_chip():
    """Nonlinear on the packed mesh path, Mosaic-compiled: matches the
    unstructured oracle in f32 on a mixed soft-layer mesh."""
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
    from hercules_tpu.solver.step import attach_nonlinear, run_solver
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

    nl_u = attach_nonlinear(mesh, p, tables, nlt, dtype=jnp.float32)
    state_u, _ = run_solver(tables, nid, forces, T, p.delta_t,
                            dtype=jnp.float32, nl=nl_u)
    u_ref = np.asarray(state_u[0])

    plan = build_plan(mesh)
    mesh_nl = attach_nonlinear_mesh(mesh, p, tables, nlt, plan,
                                    dtype=jnp.float32)
    state_m, _ = run_mesh_solver(plan, tables, nid, forces, T,
                                 p.delta_t, dtype=jnp.float32,
                                 nl=mesh_nl)
    u_m = mesh_u_global(plan, mesh_carry_views(state_m)[0], mesh.nnum)
    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u_m / scale, u_ref / scale, atol=5e-5)
