import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.parallel import (gather_global, run_sharded,
                                   shard_tables)
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import run_solver

SIMPLE = "/root/reference/examples/simple"


def _setup(damping=None):
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    if damping:
        p.type_of_damping = damping
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)
    # impulse at a node near the middle
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    T = 100
    forces = np.zeros((T, 1, 3))
    forces[:10, 0, :] = 1e8
    return p, mesh, tables, np.array([nid], np.int32), forces, T


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_matches_single(ndev):
    p, mesh, tables, src_ids, forces, T = _setup()
    state, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                          dtype=jnp.float64)
    u_single = np.asarray(state[0])

    st = shard_tables(tables, mesh, ndev, src_ids=src_ids)
    devs = np.array(jax.devices()[:ndev])
    with Mesh(devs, ("d",)) as m:
        sh_state = run_sharded(st, m, forces, T, p.delta_t,
                               dtype=jnp.float64, chunk=50)
    u = gather_global(st, sh_state[0], tables.N)
    np.testing.assert_allclose(u, u_single, rtol=1e-12, atol=1e-18)


def test_sharded_bkt_matches_single():
    p, mesh, tables, src_ids, forces, T = _setup(damping="bkt")
    from hercules_tpu.material import correct_properties, MeshOrigin
    # re-derive props with BKT coefficients
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)
    assert tables.damping == "bkt"

    state, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                          dtype=jnp.float64)
    u_single = np.asarray(state[0])
    assert np.abs(u_single).max() > 0

    st = shard_tables(tables, mesh, 4, src_ids=src_ids)
    devs = np.array(jax.devices()[:4])
    with Mesh(devs, ("d",)) as m:
        sh_state = run_sharded(st, m, forces, T, p.delta_t,
                               dtype=jnp.float64, chunk=50)
    u = gather_global(st, sh_state[0], tables.N)
    np.testing.assert_allclose(u, u_single, rtol=1e-12, atol=1e-18)


def test_sharded_dangling_mesh():
    """Sharded run on a mesh with hanging nodes matches single-device."""
    from hercules_tpu.material import correct_properties, MeshOrigin
    from hercules_tpu.mesh import Octree, extract_mesh

    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
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
    assert len(mesh.dn_ids) > 0
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    tables = assemble(mesh, p)

    nid = mesh.elem_lnid[mesh.lenum // 3, 0]
    T = 80
    forces = np.zeros((T, 1, 3))
    forces[:10, 0, :] = 1e8
    src_ids = np.array([nid], np.int32)

    state, _ = run_solver(tables, src_ids, forces, T, p.delta_t,
                          dtype=jnp.float64)
    u_single = np.asarray(state[0])

    st = shard_tables(tables, mesh, 8, src_ids=src_ids)
    devs = np.array(jax.devices()[:8])
    with Mesh(devs, ("d",)) as m:
        sh_state = run_sharded(st, m, forces, T, p.delta_t,
                               dtype=jnp.float64, chunk=40)
    u = gather_global(st, sh_state[0], tables.N)
    np.testing.assert_allclose(u, u_single, rtol=1e-10, atol=1e-16)
