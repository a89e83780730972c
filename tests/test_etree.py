import numpy as np
import pytest

from hercules_tpu.etree import morton
from hercules_tpu.etree.reader import EtreeReader, floor_indices
from hercules_tpu.etree.writer import EtreeWriter
from hercules_tpu.cvm import CVM

SIMPLE_E = "/root/reference/examples/simple/simple_case.e"


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**31, 1000).astype(np.uint32)
    y = rng.integers(0, 2**31, 1000).astype(np.uint32)
    z = rng.integers(0, 2**31, 1000).astype(np.uint32)
    hi, lo = morton.interleave3(x, y, z)
    x2, y2, z2 = morton.deinterleave3(hi, lo)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    np.testing.assert_array_equal(z, z2)


def test_morton_bit_placement():
    # bit i of x -> morton bit 3i (code.c:390-434)
    hi, lo = morton.interleave3(np.array([1]), np.array([0]), np.array([0]))
    assert lo[0] == 1 and hi[0] == 0
    hi, lo = morton.interleave3(np.array([0]), np.array([1]), np.array([0]))
    assert lo[0] == 2
    hi, lo = morton.interleave3(np.array([0]), np.array([0]), np.array([1]))
    assert lo[0] == 4
    # high bit of z: bit 30 -> morton bit 92 -> hi bit 28
    hi, lo = morton.interleave3(np.array([0]), np.array([0]),
                                np.array([1 << 30]))
    assert hi[0] == (1 << 28) and lo[0] == 0


def test_key_bytes_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**31, 64).astype(np.uint32)
    y = rng.integers(0, 2**31, 64).astype(np.uint32)
    z = rng.integers(0, 2**31, 64).astype(np.uint32)
    lv = rng.integers(0, 31, 64).astype(np.uint8)
    hi, lo, lb = morton.morton_key(x, y, z, lv)
    b = morton.key_to_bytes(hi, lo, lb)
    hi2, lo2, lb2 = morton.bytes_to_key(b)
    np.testing.assert_array_equal(hi, hi2)
    np.testing.assert_array_equal(lo, lo2)
    np.testing.assert_array_equal(lb, lb2)


def test_floor_indices():
    store_hi = np.array([0, 0, 1, 2], dtype=np.uint64)
    store_lo = np.array([5, 9, 0, 3], dtype=np.uint64)
    q_hi = np.array([0, 0, 0, 1, 3], dtype=np.uint64)
    q_lo = np.array([4, 5, 100, 0, 0], dtype=np.uint64)
    idx = floor_indices(store_hi, store_lo, q_hi, q_lo)
    np.testing.assert_array_equal(idx, [-1, 0, 1, 2, 3])


def test_read_simple_case():
    db = EtreeReader(SIMPLE_E)
    assert db.n == 2048
    assert db.keysize == 13 and db.valuesize == 12
    x, y, z, lv, pl = db.octants()
    assert (lv == 4).all()
    # 16 x 16 x 8 grid of level-4 octants (edge = 2**27 ticks)
    assert len(np.unique(x)) == 16
    assert len(np.unique(z)) == 8


def test_cvm_query_simple():
    cvm = CVM(SIMPLE_E)
    ok, vp, vs, rho = cvm.query([500.0, 10.0], [500.0, 990.0], [100.0, 499.0])
    assert ok.all()
    np.testing.assert_allclose(vp, 6000.0)
    np.testing.assert_allclose(vs, 3464.0)
    np.testing.assert_allclose(rho, 2700.0)
    # out of domain fails
    ok, vp, vs, rho = cvm.query([500.0], [500.0], [501.0])
    assert not ok.any()


def test_writer_roundtrip(tmp_path):
    # write a small 2-level octree and read it back
    rng = np.random.default_rng(2)
    # 8 level-1 octants
    e = np.uint32(1 << 30)
    xs, ys, zs, lvs = [], [], [], []
    for w in range(8):
        xs.append((w & 1) * e)
        ys.append(((w >> 1) & 1) * e)
        zs.append(((w >> 2) & 1) * e)
        lvs.append(1)
    payload = rng.integers(0, 255, (8, 12)).astype(np.uint8)
    path = str(tmp_path / "t.e")
    w = EtreeWriter(path, 12, appmeta="hello world",
                    asciischema="L 3 Vp float 4 0 Vs float 4 4 "
                                "density float 4 8 ")
    w.write(np.array(xs, np.uint32), np.array(ys, np.uint32),
            np.array(zs, np.uint32), np.array(lvs, np.uint8), payload)
    db = EtreeReader(path)
    assert db.n == 8
    assert db.appmeta == "hello world"
    x, y, z, lv, pl = db.octants()
    assert (lv == 1).all()
    # query the center of each octant hits the right record
    ok, idx = db.search_points(
        x + np.uint32(e // 2), y + np.uint32(e // 2), z + np.uint32(e // 2))
    assert ok.all()
    np.testing.assert_array_equal(idx, np.arange(8))


def test_writer_multipage(tmp_path):
    # enough records to need several leaf pages + an index level
    n = 4096
    side = 16  # 16^3 = 4096 level-4 octants
    e = np.uint32(1 << 27)
    ii = np.arange(n)
    x = (ii % side).astype(np.uint32) * e
    y = ((ii // side) % side).astype(np.uint32) * e
    z = (ii // side // side).astype(np.uint32) * e
    lv = np.full(n, 4, np.uint8)
    payload = np.arange(n * 12, dtype=np.uint64).reshape(n, 12).astype(
        np.uint8)
    path = str(tmp_path / "big.e")
    EtreeWriter(path, 12).write(x, y, z, lv, payload)
    db = EtreeReader(path)
    assert db.n == n
    ok, idx = db.search_points(x + e // np.uint32(2),
                               y + e // np.uint32(2),
                               z + e // np.uint32(2))
    assert ok.all()
    # every record found exactly once
    assert len(np.unique(idx)) == n


def test_out_of_core_reader_matches_inmemory(tmp_path):
    """Out-of-core (mmap + page-index) mode serves the same records and
    point queries as the in-memory reader without loading the leaves —
    the reference LRU buffer pool equivalent (etree/buffer.c:21-116)
    for CVM DBs larger than RAM."""
    from hercules_tpu.tools.makecvm import build_layered_cvm
    from hercules_tpu.etree.reader import EtreeReader

    path = str(tmp_path / "layered.e")
    layers = [[0.0, 1200.0, 500.0, 2000.0],
              [250.0, 3500.0, 1800.0, 2400.0],
              [600.0, 6000.0, 3464.0, 2700.0]]
    build_layered_cvm(path, 1000.0, 1000.0, 1000.0, 62.5, layers)

    mem = EtreeReader(path, out_of_core=False)
    ooc = EtreeReader(path, out_of_core=True)
    assert ooc.out_of_core and not hasattr(ooc, "payload")
    assert ooc.total_count() == mem.total_count()

    rng = np.random.default_rng(3)
    n = 5000
    far = mem_endpoint = 1 << 31
    x = rng.integers(0, 1 << 31, n).astype(np.uint32)
    y = rng.integers(0, 1 << 31, n).astype(np.uint32)
    z = rng.integers(0, 1 << 31, n).astype(np.uint32)
    ok_m, idx_m = mem.search_points(x, y, z)
    ok_o, idx_o = ooc.search_points(x, y, z)
    np.testing.assert_array_equal(ok_o, ok_m)
    rec_m = mem.payload[idx_m[ok_m]]
    rec_o = ooc.records(idx_o[ok_o])
    for name in mem.schema.names:
        np.testing.assert_array_equal(rec_o[name], rec_m[name])

    # octants() materializes identically (Z-order)
    xm, ym, zm, lm, pm = mem.octants()
    xo, yo, zo, lo_, po = ooc.octants()
    np.testing.assert_array_equal(xo, xm)
    np.testing.assert_array_equal(lo_, lm)
    for name in mem.schema.names:
        np.testing.assert_array_equal(po[name], pm[name])


def test_out_of_core_cvm_query(tmp_path, monkeypatch):
    """CVM forced out-of-core (HT_ETREE_MMAP=1) answers identical
    material queries, end to end through cvm_query."""
    from hercules_tpu.cvm import CVM
    from hercules_tpu.tools.makecvm import build_layered_cvm

    path = str(tmp_path / "l2.e")
    layers = [[0.0, 2000.0, 1000.0, 2100.0],
              [500.0, 6000.0, 3464.0, 2700.0]]
    build_layered_cvm(path, 2000.0, 2000.0, 1000.0, 125.0, layers)

    c_mem = CVM(path)
    monkeypatch.setenv("HT_ETREE_MMAP", "1")
    c_ooc = CVM(path)
    assert c_ooc.db.out_of_core

    rng = np.random.default_rng(7)
    e = rng.uniform(0, 2000, 4000)
    nn = rng.uniform(0, 2000, 4000)
    d = rng.uniform(0, 1000, 4000)
    ok1, vp1, vs1, rho1 = c_mem.query(e, nn, d)
    ok2, vp2, vs2, rho2 = c_ooc.query(e, nn, d)
    np.testing.assert_array_equal(ok2, ok1)
    np.testing.assert_array_equal(vp2[ok1], vp1[ok1])
    np.testing.assert_array_equal(vs2[ok1], vs1[ok1])
    np.testing.assert_array_equal(rho2[ok1], rho1[ok1])
