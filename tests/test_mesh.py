import bz2
import io

import numpy as np
import pytest

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.mesh import Octree, extract_mesh, domain_ticks
from hercules_tpu.mesh.octree import PIXELLEVEL
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.etree.reader import EtreeReader

SIMPLE = "/root/reference/examples/simple"


def test_domain_ticks_simple():
    far, ts = domain_ticks(1000.0, 1000.0, 500.0)
    assert list(far) == [1 << 30, 1 << 30, 1 << 29]
    assert ts == 1000.0 / (1 << 30)


def test_newtree_clip():
    t = Octree.newtree(1000.0, 1000.0, 500.0)
    # root crosses z-boundary -> 2x2x1 level-1 leaves
    assert t.n == 4
    assert (t.level == 1).all()
    x, y, z = t.coords()
    assert (z == 0).all()


def test_uniform_refine_and_extract():
    t = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tree, hi, lo, lv):
        return {"edge": tree.ticksize
                * (np.int64(1) << (PIXELLEVEL - lv.astype(np.int64)))}

    def toexpand(tree, hi, lo, lv, rec):
        return rec["edge"] > 62.5

    t.refine(setrec, toexpand)
    assert t.n == 16 * 16 * 8
    t.balance()
    assert t.n == 16 * 16 * 8
    mesh = extract_mesh(t)
    assert mesh.lenum == 2048
    assert mesh.nnum == 17 * 17 * 9
    assert len(mesh.dn_ids) == 0
    # all corner offsets resolve to valid distinct nodes per element
    assert (np.diff(np.sort(mesh.elem_lnid, axis=1), axis=1) > 0).all()


def test_balance_enforces_2to1():
    # refine one corner octant aggressively, then balance
    t = Octree.newtree(1000.0, 1000.0, 1000.0)

    def setrec(tree, hi, lo, lv):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        return {"x": x.astype(np.int64), "y": y.astype(np.int64),
                "z": z.astype(np.int64)}

    def toexpand(tree, hi, lo, lv, rec):
        # refine only the origin-corner region to level 5
        e = np.int64(1) << (PIXELLEVEL - lv.astype(np.int64))
        near = (rec["x"] == 0) & (rec["y"] == 0) & (rec["z"] == 0)
        return near & (lv < 5)

    t.refine(setrec, toexpand)
    t.balance()
    # check 2:1: no leaf adjacent to another with level diff > 1
    from hercules_tpu.etree.reader import floor_indices
    from hercules_tpu.etree import morton
    from hercules_tpu.mesh.octree import _neighbor_probes
    x, y, z = t.coords()
    e = t.edgeticks()
    lv = t.level.astype(np.int64)
    for L in range(int(lv.max()), int(lv.min()), -1):
        sel = lv == L
        qx, qy, qz = _neighbor_probes(x[sel], y[sel], z[sel], e[sel],
                                      t.farendp)
        qhi, qlo = morton.interleave3(qx.astype(np.uint64),
                                      qy.astype(np.uint64),
                                      qz.astype(np.uint64))
        idx = floor_indices(t.hi, t.lo, qhi, qlo)
        ok = idx >= 0
        assert (lv[idx[ok]] >= L - 1).all()


def test_dangling_classification():
    # one level-1 octant refined to level 2 next to level-1 neighbors
    t = Octree.newtree(1000.0, 1000.0, 1000.0)

    def setrec(tree, hi, lo, lv):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        return {"x": x.astype(np.int64), "y": y.astype(np.int64),
                "z": z.astype(np.int64)}

    def toexpand(tree, hi, lo, lv, rec):
        near = (rec["x"] == 0) & (rec["y"] == 0) & (rec["z"] == 0)
        return near & (lv < 2)

    t.refine(setrec, toexpand)
    t.balance()
    mesh = extract_mesh(t)
    # 7 coarse level-1 elements + 8 level-2 elements
    assert mesh.lenum == 15
    D = len(mesh.dn_ids)
    assert D > 0
    # every dangling node's anchors are anchored and weights sum to 1
    w = mesh.dn_weights
    np.testing.assert_allclose(w.sum(axis=1), 1.0)
    assert not mesh.dangling[mesh.dn_anchors[w > 0]].any()
    # face-dangling nodes have 4 anchors, edge-dangling 2
    deps = (w > 0).sum(axis=1)
    assert set(deps.tolist()) <= {2, 4}
    # the center of the refined octant's outer faces are face-dangling:
    # 3 faces shared with coarse neighbors -> 3 face-dangling nodes
    assert (deps == 4).sum() == 3
    # edge-dangling: midpoints of the 3x2x... shared edges
    assert (deps == 2).sum() == 9


def test_golden_mesh_simple(tmp_path):
    """The meshing pipeline reproduces examples/simple's golden mesh.e:
    same element set, same global node ids, same material."""
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)

    assert mesh.lenum == 2048
    assert mesh.nnum == 2601
    assert len(mesh.dn_ids) == 0

    # decode the committed golden mesh
    raw = bz2.decompress(
        open(f"{SIMPLE}/expected-out/mesh.e.bz2", "rb").read())
    gpath = tmp_path / "golden_mesh.e"
    gpath.write_bytes(raw)
    db = EtreeReader(str(gpath))
    gx, gy, gz, glv, gpl = db.octants()
    rec = gpl.reshape(db.n, -1)
    gnid = rec[:, :64].copy().view("<i8").reshape(db.n, 8)
    gmat = rec[:, 64:80].copy().view("<f4").reshape(db.n, 4)

    # our elements are Z-order sorted, as is the golden etree
    np.testing.assert_array_equal(mesh.elem_x, gx.astype(np.int64))
    np.testing.assert_array_equal(mesh.elem_y, gy.astype(np.int64))
    np.testing.assert_array_equal(mesh.elem_z, gz.astype(np.int64))
    np.testing.assert_array_equal(mesh.elem_level, glv)
    np.testing.assert_array_equal(mesh.elem_lnid.astype(np.int64), gnid)
    np.testing.assert_allclose(mesh.edge_m, gmat[:, 0])
    np.testing.assert_allclose(mesh.props["Vp"], gmat[:, 1])
    np.testing.assert_allclose(mesh.props["Vs"], gmat[:, 2])
    np.testing.assert_allclose(mesh.props["rho"], gmat[:, 3])
