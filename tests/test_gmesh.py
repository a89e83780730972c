"""General graded multi-chip path (parallel/gmesh.py): fused kernels
for LATERALLY graded meshes — brick interfaces that are NOT full
z-planes (gslab's constraint) — sharded over the 8-device CPU mesh
and compared against the single-device unstructured oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.material import MeshOrigin, correct_properties
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.bricks import build_plan
from hercules_tpu.solver.step import run_solver

S = "/root/reference/examples/simple"


def _lateral_mesh(damping="rayleigh"):
    """x/y-graded fixture: level 5 in an x-slab over the FULL depth
    (vertical interfaces), level 4 elsewhere.  gslab cannot decompose
    this (interfaces are x-planes); dangling nodes exist."""
    from hercules_tpu.etree import morton

    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.type_of_damping = damping
    cvm = CVM(f"{S}/simple_case.e")
    tree = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        x, y, z = morton.deinterleave3(hi, lo)
        fine = x < (1 << 28)            # quarter of the x extent
        return lv < np.where(fine, 5, 4)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)
    return p, mesh, tables


@pytest.mark.parametrize("n_dev", [2, 8])
def test_gmesh_matches_unstructured(n_dev):
    """8-device gmesh == single-device unstructured oracle on a
    laterally graded mesh (interface groups + dangling nodes crossing
    the device axis), f64."""
    from hercules_tpu.parallel.gmesh import (build_gmesh_tables,
                                             gmesh_u_global,
                                             run_gmesh_solver)
    from hercules_tpu.parallel.gslab import build_gslab_tables

    p, mesh, tables = _lateral_mesh()
    plan = build_plan(mesh, min_brick_elems=32)
    assert len(plan.bricks) >= 2
    assert len(mesh.dn_ids) > 0           # hanging nodes at interfaces

    # gslab's z-plane reconciler must REJECT this shape (that's the
    # gap this path closes)
    with pytest.raises(RuntimeError):
        build_gslab_tables(mesh, tables, n_dev, src_ids=None,
                           min_brick_elems=32)

    # sources: one interface (group) node + one interior node
    grp_nid = int(mesh.dn_anchors[0, 0])
    interior = int(mesh.elem_lnid[mesh.lenum // 2, 0])
    src_ids = np.array([grp_nid, interior], np.int32)
    T = 40
    rng = np.random.default_rng(7)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    state_u, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                            dtype=jnp.float64)
    u_ref = np.asarray(state_u[0])

    st = build_gmesh_tables(mesh, tables, n_dev, src_ids=src_ids,
                            dtype=jnp.float64, min_brick_elems=32)
    mesh_dev = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    state = run_gmesh_solver(st, mesh_dev, forces, T, p.delta_t,
                             dtype=jnp.float64, chunk=20,
                             interpret=True)
    u_g = gmesh_u_global(st, state)

    scale = np.abs(u_ref).max()
    assert scale > 0
    np.testing.assert_allclose(u_g, u_ref, rtol=0, atol=1e-11 * scale)


def test_gmesh_driver_stations_and_restart():
    """GMeshPath through the multi-chip driver: choose_path(prefer=
    "gmesh"), in-scan station sampling, and a state_from_global
    restart that reproduces the uninterrupted run."""
    from hercules_tpu.parallel.driver import choose_path, run_multichip

    p, mesh, tables = _lateral_mesh()
    n_dev = 8
    interior = int(mesh.elem_lnid[mesh.lenum // 2, 0])
    src_ids = np.array([interior], np.int32)
    T = 30
    rng = np.random.default_rng(3)
    forces = rng.standard_normal((T, 1, 3)) * 1e8

    path = choose_path(mesh, tables, n_dev, src_ids=src_ids,
                       dtype=jnp.float64, prefer="gmesh",
                       interpret=True, min_brick_elems=32)
    assert path.name == "gmesh"
    # stations: one per brick region + near the interface
    st_nodes = np.stack([mesh.elem_lnid[0], mesh.elem_lnid[-1]])
    st_phi = np.full((2, 8), 0.125)
    path.attach_stations(st_nodes, st_phi, jnp.float64)

    m = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    state, ys = run_multichip(path, m, forces, T, p.delta_t, chunk=10)
    u_full = path.u_global(state)
    assert np.abs(u_full).max() > 0
    assert ys.shape == (T, 2, 3)
    assert np.abs(ys).max() > 0

    # restart from the halfway global fields
    H = 15
    sh, _ = run_multichip(path, m, forces[:H], H, p.delta_t, chunk=5)
    u_h, up_h = path.u_global(sh), path.up_global(sh)
    st2 = path.state_from_global(u_h, up_h, [])
    s2, _ = run_multichip(path, m, forces[H:], T - H, p.delta_t,
                          chunk=5, state=st2)
    scale = np.abs(u_full).max()
    np.testing.assert_allclose(path.u_global(s2), u_full,
                               rtol=0, atol=1e-11 * scale)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_gmesh_bkt_matches_unstructured(n_dev):
    """gmesh + BKT (VERDICT r4 item 4): laterally graded mesh with
    attenuation on the multi-chip general path — per-brick uniform-Q
    node-basis kernels, conv needing NO extra exchange (node-local
    recursion; displacement copies stay identical under the existing
    plane/psum reconciliation; damping.c:110-222 +
    psolve.c:4946-5079)."""
    from hercules_tpu.parallel.gmesh import (build_gmesh_tables,
                                             gmesh_u_global,
                                             run_gmesh_solver)
    from hercules_tpu.solver.step import run_solver

    p, mesh, tables = _lateral_mesh(damping="bkt")
    src_ids = np.array([int(mesh.dn_anchors[0, 0]),
                        int(mesh.elem_lnid[mesh.lenum // 2, 0])],
                       np.int32)
    T = 30
    rng = np.random.default_rng(11)
    forces = rng.standard_normal((T, 2, 3)) * 1e8

    state_u, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                            dtype=jnp.float64)
    u_ref = np.asarray(state_u[0])
    scale = np.abs(u_ref).max()
    assert scale > 0

    st = build_gmesh_tables(mesh, tables, n_dev, src_ids=src_ids,
                            dtype=jnp.float64, min_brick_elems=32)
    assert st.bk_scal is not None
    mesh_dev = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    state = run_gmesh_solver(st, mesh_dev, forces, T, p.delta_t,
                             dtype=jnp.float64, chunk=15,
                             interpret=True)
    u_g = gmesh_u_global(st, state)
    np.testing.assert_allclose(u_g, u_ref, rtol=0, atol=1e-11 * scale)


def test_gmesh_rejects_heterogeneous_q():
    """Per-brick mixed Q sets stay off gmesh (the heterogeneous-Q
    node tier is single-chip only)."""
    from hercules_tpu.parallel.gmesh import build_gmesh_tables

    p, mesh, tables = _lateral_mesh(damping="bkt")
    # perturb one element's Q rows so the brick is no longer uniform
    for k in ("a0_shear", "a1_shear"):
        tables.bkt[k] = np.asarray(tables.bkt[k]).copy()
        tables.bkt[k][0] *= 1.5
        tables.bkt[k][0] += 0.01
    with pytest.raises(RuntimeError, match="one Q set per brick"):
        build_gmesh_tables(mesh, tables, 4, min_brick_elems=32)
