"""Distributed meshing (mesh/distributed.py): each rank refines,
balances and extracts only its Z-order block; the gathered result
must EXACTLY equal the single-process extract_mesh oracle
(octor.c:4904-5258 / :4397-4776 semantics via bulk-synchronous
boundary exchanges).

LocalComm drives P in-process ranks on threads; the real-process DCN
path (JaxComm) shares every algorithm and is exercised by the
2-process jax.distributed test in test_multihost.py.
"""

import threading

import numpy as np
import pytest

from hercules_tpu.etree import morton
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.mesh.extract import _key128
from hercules_tpu.mesh.distributed import (LocalComm,
                                           balance_distributed,
                                           choose_intervals,
                                           extract_mesh_shard,
                                           gather_mesh,
                                           generate_mesh_shard,
                                           owner_of, shard_tree)

SIMPLE = "/root/reference/examples/simple"


def run_ranks(nproc, fn):
    """Run fn(comm) on P lockstep threads; propagate the first
    failure (aborting the barrier so peers don't deadlock)."""
    comms = LocalComm.group(nproc)
    results = [None] * nproc
    errs = []

    def worker(r):
        try:
            results[r] = fn(comms[r])
        except BaseException as e:   # noqa: BLE001 - test harness
            errs.append((r, e))
            comms[r]._sh["barrier"].abort()

    ts = [threading.Thread(target=worker, args=(r,))
          for r in range(nproc)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errs:
        raise errs[0][1]
    return results


def _graded_te(tr, hi, lo, lv, rec):
    """Graded criterion: level 5 in a z-slab and an x-corner, 4
    elsewhere (>= the coarse-pass depth so the sharded pipeline's
    initial geometric refinement matches the oracle's leaf set)."""
    x, y, z = morton.deinterleave3(hi, lo)
    fine = (z < (1 << 28)) | ((x > (1 << 29)) & (y < (1 << 28)))
    return lv < np.where(fine, 5, 4)


def _oracle():
    tree = Octree.newtree(1000.0, 1000.0, 500.0)
    tree.refine(lambda tr, hi, lo, lv: {}, _graded_te)
    tree.balance()
    return tree


@pytest.mark.parametrize("nproc", [2, 3, 4, 8])
def test_distributed_mesh_equals_oracle(nproc):
    """refine/balance/extract sharded over P ranks == the global
    pipeline, bit-for-bit (elements, node numbering, dangling
    tables)."""
    otree = _oracle()
    ref = extract_mesh(otree)

    def build(comm):
        tree = Octree.newtree(1000.0, 1000.0, 500.0)
        # identical coarse pass on every rank (geometric, level 3)
        while tree.n < 4 * comm.nproc:
            lmin = int(tree.level.min())
            tree.refine(lambda tr, hi, lo, lv: {},
                        lambda tr, hi, lo, lv, rec, _l=lmin:
                        lv <= _l)
        starts = choose_intervals(tree, np.ones(tree.n), comm.nproc)
        tree, _ = shard_tree(tree, starts, comm.rank)
        tree.refine(lambda tr, hi, lo, lv: {}, _graded_te)
        balance_distributed(tree, starts, comm)
        shard = extract_mesh_shard(tree, starts, comm)
        # every rank holds only its block
        assert shard.lenum < ref.lenum
        assert len(shard.node_x) < ref.nnum
        return gather_mesh(shard, comm)

    meshes = run_ranks(nproc, build)
    for m in meshes:
        np.testing.assert_array_equal(m.elem_x, ref.elem_x)
        np.testing.assert_array_equal(m.elem_y, ref.elem_y)
        np.testing.assert_array_equal(m.elem_z, ref.elem_z)
        np.testing.assert_array_equal(m.elem_level, ref.elem_level)
        np.testing.assert_array_equal(m.elem_lnid, ref.elem_lnid)
        np.testing.assert_array_equal(m.node_x, ref.node_x)
        np.testing.assert_array_equal(m.node_y, ref.node_y)
        np.testing.assert_array_equal(m.node_z, ref.node_z)
        np.testing.assert_array_equal(m.dangling, ref.dangling)
        # dn tables: same entries (oracle order is dict-insertion)
        oo = np.argsort(ref.dn_ids, kind="stable")
        np.testing.assert_array_equal(m.dn_ids, ref.dn_ids[oo])
        np.testing.assert_array_equal(m.dn_anchors,
                                      ref.dn_anchors[oo])
        np.testing.assert_array_equal(m.dn_weights,
                                      ref.dn_weights[oo])
        np.testing.assert_allclose(m.edge_m, ref.edge_m)


def test_owner_of_intervals():
    starts_hi = np.array([0, 5, 9], np.uint64)
    starts_lo = np.array([0, 0, 7], np.uint64)
    qhi = np.array([0, 4, 5, 5, 9, 9, 12], np.uint64)
    qlo = np.array([0, 99, 0, 1, 6, 7, 0], np.uint64)
    np.testing.assert_array_equal(
        owner_of(starts_hi, starts_lo, qhi, qlo),
        [0, 0, 1, 1, 1, 2, 2])


def test_generate_mesh_shard_simple_cvm():
    """The full sharded pipeline (coarse pass -> interval table ->
    sharded progressive refine -> distributed balance -> sharded
    extract + per-shard 27-point material pass) against generate_mesh
    on the simple reference case."""
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh

    p = load_params(f"{SIMPLE}/in/physics.in",
                    f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    ref = generate_mesh(p, cvm)

    def build(comm):
        cvm_r = CVM(f"{SIMPLE}/simple_case.e")
        shard = generate_mesh_shard(p, cvm_r, comm,
                                    coarse_leaves_per_rank=8)
        assert shard.lenum < ref.lenum
        return gather_mesh(shard, comm)

    meshes = run_ranks(2, build)
    for m in meshes:
        np.testing.assert_array_equal(m.elem_x, ref.elem_x)
        np.testing.assert_array_equal(m.elem_level, ref.elem_level)
        np.testing.assert_array_equal(m.elem_lnid, ref.elem_lnid)
        np.testing.assert_array_equal(m.node_x, ref.node_x)
        np.testing.assert_array_equal(m.node_z, ref.node_z)
        np.testing.assert_array_equal(m.dangling, ref.dangling)
        for k in ref.props:
            np.testing.assert_allclose(m.props[k], ref.props[k],
                                       rtol=0, atol=0)


def _deep_te(tr, hi, lo, lv, rec):
    """>=3-level gap fixture: a level-6 pocket just below the
    z = 2^29 tick plane (a high Morton bit boundary, so probes from
    the pocket cross a shard-interval end) in a level-3 field."""
    x, y, z = morton.deinterleave3(hi, lo)
    fine = ((z >= (1 << 29) - (1 << 27)) & (z < (1 << 29))
            & (x < (1 << 27)) & (y < (1 << 27)))
    return lv < np.where(fine, 6, 3)


@pytest.mark.parametrize("nproc", [2, 8])
def test_distributed_balance_multilevel_gap(nproc):
    """Regression (round-4 advisor): the balance probe floor search
    must check containment — on an interval-sharded tree a probe key
    past the shard's interval end floors onto the shard's last leaf
    and, without the check, spuriously splits it when >=2 levels
    coarser.  Fixture forms 3-level gaps adjacent to interval
    boundaries; the distributed closure must equal the serial one."""
    otree = Octree.newtree(1000.0, 1000.0, 1000.0)
    otree.refine(lambda tr, hi, lo, lv: {}, _deep_te)
    otree.balance()
    ref = extract_mesh(otree)

    def build(comm):
        tree = Octree.newtree(1000.0, 1000.0, 1000.0)
        while tree.n < 8 * comm.nproc:
            lmin = int(tree.level.min())
            tree.refine(lambda tr, hi, lo, lv: {},
                        lambda tr, hi, lo, lv, rec, _l=lmin:
                        lv <= _l)
        starts = choose_intervals(tree, np.ones(tree.n), comm.nproc)
        tree, _ = shard_tree(tree, starts, comm.rank)
        tree.refine(lambda tr, hi, lo, lv: {}, _deep_te)
        balance_distributed(tree, starts, comm)
        shard = extract_mesh_shard(tree, starts, comm)
        return gather_mesh(shard, comm)

    for m in run_ranks(nproc, build):
        np.testing.assert_array_equal(m.elem_x, ref.elem_x)
        np.testing.assert_array_equal(m.elem_level, ref.elem_level)
        np.testing.assert_array_equal(m.elem_lnid, ref.elem_lnid)
        np.testing.assert_array_equal(m.node_x, ref.node_x)
        np.testing.assert_array_equal(m.dangling, ref.dangling)


def test_choose_intervals_degenerate_weights():
    """Regression (round-4 advisor): concentrated weights must not
    collapse shards — starts must stay strictly increasing so every
    rank gets at least one coarse leaf."""
    tree = Octree.newtree(1000.0, 1000.0, 1000.0)
    while tree.n < 64:
        lmin = int(tree.level.min())
        tree.refine(lambda tr, hi, lo, lv: {},
                    lambda tr, hi, lo, lv, rec, _l=lmin: lv <= _l)
    for wcase in ["first", "last", "middle"]:
        w = np.full(tree.n, 1e-12)
        w[{"first": 0, "last": tree.n - 1,
           "middle": tree.n // 2}[wcase]] = 1e9
        starts = choose_intervals(tree, w, 8)
        keys = _key128(starts[0], starts[1])
        assert (keys[1:] > keys[:-1]).all(), wcase
        sizes = [shard_tree(tree, starts, r)[0].n for r in range(8)]
        assert min(sizes) >= 1, (wcase, sizes)


def _skewed_te(tr, hi, lo, lv, rec):
    """Deliberately skewed load: a level-7 pocket confined to ONE
    corner octant (all inside a single coarse leaf, so the coarse
    vsrule estimate cannot split it), level 3 elsewhere."""
    x, y, z = morton.deinterleave3(hi, lo)
    fine = ((x < (1 << 27)) & (y < (1 << 27)) & (z < (1 << 27)))
    return lv < np.where(fine, 7, 3)


@pytest.mark.parametrize("nproc", [4, 8])
def test_repartition_balances_skewed_load(nproc):
    """octor_partitiontree semantics (octor.c:4904-5258): after
    refinement, shards are re-split by ACTUAL leaf counts — a fine
    region hidden inside one coarse leaf must not leave one rank with
    nearly all elements; the gathered mesh stays bit-exact vs the
    serial oracle."""
    from hercules_tpu.mesh.distributed import repartition

    otree = Octree.newtree(1000.0, 1000.0, 1000.0)
    otree.refine(lambda tr, hi, lo, lv: {}, _skewed_te)
    otree.balance()
    ref = extract_mesh(otree)

    def build(comm):
        tree = Octree.newtree(1000.0, 1000.0, 1000.0)
        while tree.n < 8 * comm.nproc:
            lmin = int(tree.level.min())
            tree.refine(lambda tr, hi, lo, lv: {},
                        lambda tr, hi, lo, lv, rec, _l=lmin:
                        lv <= _l)
        starts = choose_intervals(tree, np.ones(tree.n), comm.nproc)
        tree, _ = shard_tree(tree, starts, comm.rank)
        tree.refine(lambda tr, hi, lo, lv: {}, _skewed_te)
        balance_distributed(tree, starts, comm)
        skew_before = tree.n
        starts = repartition(tree, starts, comm)
        shard = extract_mesh_shard(tree, starts, comm)
        return tree.n, skew_before, gather_mesh(shard, comm)

    results = run_ranks(nproc, build)
    sizes = [r[0] for r in results]
    before = [r[1] for r in results]
    E = ref.lenum
    # the skewed split concentrated most leaves on one rank ...
    assert max(before) > 2.0 * E / nproc, before
    # ... and the repartition spreads them near-evenly
    assert max(sizes) <= 1.2 * E / nproc, sizes
    assert min(sizes) >= 1, sizes
    for _, _, m in results:
        np.testing.assert_array_equal(m.elem_x, ref.elem_x)
        np.testing.assert_array_equal(m.elem_level, ref.elem_level)
        np.testing.assert_array_equal(m.elem_lnid, ref.elem_lnid)
        np.testing.assert_array_equal(m.node_x, ref.node_x)
        np.testing.assert_array_equal(m.dangling, ref.dangling)
