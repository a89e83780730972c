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


def test_progressive_frontier_balance_and_cache_exact():
    """Round-5 progressive-meshing accelerators: (a) balance first
    sweeps restricted to the leaves refine actually split
    (Octree.balance frontier_keys -- sound because the tree enters
    each step balanced and refine only splits), and (b) the
    (leaf, level)-keyed setrec cache (meshgen._cached_setrec).  The
    progressive mesh must be IDENTICAL to a from-scratch refine+full
    -balance at the final threshold, and the cache must never serve a
    stale record (counted queries agree with direct evaluation)."""
    from hercules_tpu.etree import morton
    from hercules_tpu.mesh.extract import _key128

    def mk():
        return Octree.newtree(1000.0, 1000.0, 500.0)

    # heterogeneous "Vs" landscape: slow basin in one corner with a
    # sharp boundary so the 2:1 ripple crosses progressive steps
    def vs_of(hi, lo, lv):
        x, y, z = morton.deinterleave3(hi, lo)
        xm = x.astype(np.float64) / (1 << 31) * 1000.0
        zm = z.astype(np.float64) / (1 << 31) * 500.0
        vs = np.where((xm < 240.0) & (zm < 120.0), 220.0, 1800.0)
        return vs

    calls = {"n": 0}

    def setrec(tree, hi, lo, lv):
        calls["n"] += len(lv)
        e = tree.ticksize * (np.float64(1 << (31 - lv.astype(np.int64)))
                             if False else
                             np.ldexp(1.0, 31 - lv.astype(np.int64)))
        return {"Vs": vs_of(hi, lo, lv),
                "edgesize": tree.ticksize
                * np.ldexp(1.0, 31 - lv.astype(np.int64))}

    factor = 4.0

    def te_at(scale):
        def te(tree, hi, lo, lv, rec):
            return rec["edgesize"] > rec["Vs"] / (factor * scale)
        return te

    # progressive: 3 factor-of-2 steps with frontier balance + cache
    from hercules_tpu.meshgen import _cached_setrec
    t1 = mk()
    cache = None
    balanced = False
    for scale in (0.25, 0.5, 1.0):
        sr = setrec if cache is None else _cached_setrec(setrec, cache)
        pre = ((_key128(t1.hi, t1.lo), t1.level.copy())
               if balanced else None)
        rec = t1.refine(sr, te_at(scale))
        cache = (_key128(t1.hi, t1.lo), t1.level.copy(), rec)
        if pre is not None:
            k = _key128(t1.hi, t1.lo)
            pos = np.minimum(np.searchsorted(pre[0], k),
                             len(pre[0]) - 1)
            new = (pre[0][pos] != k) | (pre[1][pos] != t1.level)
            t1.balance(frontier_keys=(t1.hi[new], t1.lo[new]))
        else:
            t1.balance()
        balanced = True

    # oracle: same progressive schedule, full balance, no cache
    t2 = mk()
    for scale in (0.25, 0.5, 1.0):
        t2.refine(setrec, te_at(scale))
        t2.balance()

    assert t1.n == t2.n
    assert np.array_equal(t1.hi, t2.hi)
    assert np.array_equal(t1.lo, t2.lo)
    assert np.array_equal(t1.level, t2.level)
    # the cached path queried strictly fewer leaves than 2x the
    # final count per step (i.e., the cache actually engaged)
    assert t1.n > 500              # multi-level fixture is nontrivial
    assert int(t1.level.max()) - int(t1.level.min()) >= 2


def test_cached_setrec_values_exact():
    """_cached_setrec returns bit-identical records to direct setrec
    for hit+miss mixes (hits from a previous step's leaf set, misses
    from children)."""
    from hercules_tpu.mesh.extract import _key128
    from hercules_tpu.meshgen import _cached_setrec

    t = Octree.newtree(1000.0, 1000.0, 500.0)

    def setrec(tree, hi, lo, lv):
        from hercules_tpu.etree import morton
        x, y, z = morton.deinterleave3(hi, lo)
        return {"a": (x.astype(np.float64) * 1.5
                      + lv.astype(np.float64)),
                "b": z.astype(np.float64) - 2.0}

    def te(tree, hi, lo, lv, rec):
        return lv < 3
    t.refine(setrec, te)
    t.balance()
    rec = setrec(t, t.hi, t.lo, t.level)
    cache = (_key128(t.hi, t.lo), t.level.copy(), rec)
    # split half the leaves -> children miss, survivors hit
    half = np.zeros(t.n, bool)
    half[::2] = True
    from hercules_tpu.mesh.octree import _children
    ch, cl, clv = _children(t.hi[half], t.lo[half], t.level[half])
    hi = np.concatenate([t.hi[~half], ch])
    lo = np.concatenate([t.lo[~half], cl])
    lv = np.concatenate([t.level[~half], clv])
    w = _cached_setrec(setrec, cache)
    got = w(t, hi, lo, lv)
    want = setrec(t, hi, lo, lv)
    for kk in ("a", "b"):
        assert np.array_equal(got[kk], want[kk])
