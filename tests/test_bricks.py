import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.material import MeshOrigin, correct_properties
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.bricks import build_plan, decompose
from hercules_tpu.solver.brickstep import (brick_u_global,
                                           run_brick_solver)
from hercules_tpu.solver.step import run_solver

SIMPLE = "/root/reference/examples/simple"


def _refined_mesh(p, cvm):
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


def test_decompose_uniform():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    bricks = decompose(mesh)
    assert len(bricks) == 1
    b = bricks[0]
    assert list(b.shape) == [16, 16, 8]
    assert int(np.prod(b.shape)) == mesh.lenum


def test_decompose_covers_all_cells():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = _refined_mesh(p, cvm)
    bricks = decompose(mesh)
    total = sum(int(np.prod(b.shape)) for b in bricks)
    assert total == mesh.lenum
    plan = build_plan(mesh)
    # every global node has at least one brick copy
    assert len(np.unique(plan.gnid_cat)) == mesh.nnum


def _run_both(mesh, p, T=120, damping_tables=None):
    tables = damping_tables or assemble(mesh, p)
    nid = mesh.elem_lnid[mesh.lenum // 3, 0]
    src_ids = np.array([nid], np.int32)
    forces = np.zeros((T, 1, 3))
    forces[:10, 0, :] = 1e8

    state, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                          dtype=jnp.float64)
    u_ref = np.asarray(state[0])

    plan = build_plan(mesh)
    bstate, _ = run_brick_solver(plan, tables, src_ids, forces, T,
                                 p.delta_t, dtype=jnp.float64, chunk=60)
    u_brick = brick_u_global(plan, bstate[0], mesh.nnum)
    return u_ref, u_brick


def test_brick_uniform_matches_unstructured():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    u_ref, u_brick = _run_both(mesh, p)
    assert np.abs(u_ref).max() > 0
    np.testing.assert_allclose(u_brick, u_ref, rtol=1e-9, atol=1e-19)


def test_brick_refined_matches_unstructured():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = _refined_mesh(p, cvm)
    u_ref, u_brick = _run_both(mesh, p)
    np.testing.assert_allclose(u_brick, u_ref, rtol=1e-9, atol=1e-17)


def test_brick_bkt_matches_unstructured():
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    p.type_of_damping = "bkt"
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = _refined_mesh(p, cvm)
    u_ref, u_brick = _run_both(mesh, p)
    assert np.abs(u_ref).max() > 0
    np.testing.assert_allclose(u_brick, u_ref, rtol=1e-9, atol=1e-17)


def test_brick_station_sampling():
    from hercules_tpu.sim import setup_stations
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)
    st = setup_stations(mesh, p)
    nid = mesh.elem_lnid[mesh.lenum // 3, 0]
    src_ids = np.array([nid], np.int32)
    T = 60
    forces = np.zeros((T, 1, 3))
    forces[:10, 0, :] = 1e8
    _, s_ref = run_solver(tables, src_ids, forces, T, p.delta_t,
                          st_nodes=st.nodes, st_phi=st.phi,
                          dtype=jnp.float64)
    plan = build_plan(mesh)
    _, s_brick = run_brick_solver(plan, tables, src_ids, forces, T,
                                  p.delta_t, st_nodes=st.nodes,
                                  st_phi=st.phi, dtype=jnp.float64)
    np.testing.assert_allclose(s_brick, s_ref, rtol=1e-9, atol=1e-19)
