import numpy as np
import pytest

from hercules_tpu import native
from hercules_tpu.etree import morton
from hercules_tpu.etree.reader import floor_indices


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native kernels unavailable")


def _ref_interleave(x, y, z):
    """Pure-table reference (the original NumPy path)."""
    import os
    os.environ["HT_NO_NATIVE"] = "1"
    try:
        hi = np.zeros(len(x), np.uint64)
        lo = np.zeros(len(x), np.uint64)
        from hercules_tpu.etree.morton import _SPREAD
        x = np.asarray(x, np.uint64)
        y = np.asarray(y, np.uint64)
        z = np.asarray(z, np.uint64)
        for j in range(4):
            shift = np.uint64(8 * j)
            sx = _SPREAD[((x >> shift) & np.uint64(0xFF)).astype(np.int64)]
            sy = _SPREAD[((y >> shift) & np.uint64(0xFF)).astype(np.int64)]
            sz = _SPREAD[((z >> shift) & np.uint64(0xFF)).astype(np.int64)]
            chunk = sx | (sy << np.uint64(1)) | (sz << np.uint64(2))
            s = 24 * j
            if s < 64:
                lo |= chunk << np.uint64(s)
                if s + 24 > 64:
                    hi |= chunk >> np.uint64(64 - s)
            else:
                hi |= chunk << np.uint64(s - 64)
        return hi, lo
    finally:
        del os.environ["HT_NO_NATIVE"]


def test_native_interleave_matches():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**31, 100000).astype(np.uint32)
    y = rng.integers(0, 2**31, 100000).astype(np.uint32)
    z = rng.integers(0, 2**31, 100000).astype(np.uint32)
    hi, lo = native.interleave3(x, y, z)
    rhi, rlo = _ref_interleave(x, y, z)
    np.testing.assert_array_equal(hi, rhi)
    np.testing.assert_array_equal(lo, rlo)
    x2, y2, z2 = native.deinterleave3(hi, lo)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    np.testing.assert_array_equal(z, z2)


def test_native_floor_and_exact():
    rng = np.random.default_rng(1)
    ns, nq = 5000, 100000
    shi = np.sort(rng.integers(0, 1000, ns).astype(np.uint64))
    slo = rng.integers(0, 2**63, ns).astype(np.uint64)
    # sort lexicographically
    order = np.lexsort((slo, shi))
    shi, slo = shi[order], slo[order]
    qhi = rng.integers(0, 1000, nq).astype(np.uint64)
    qlo = rng.integers(0, 2**63, nq).astype(np.uint64)
    out = native.floor_search(shi, slo, qhi, qlo)

    # reference via the merge trick
    import os
    os.environ["HT_NO_NATIVE"] = "1"
    try:
        # recompute with the numpy path by passing small batches
        outs = []
        for s in range(0, nq, 2047):
            outs.append(floor_indices(shi, slo, qhi[s:s+2047],
                                      qlo[s:s+2047]))
        ref = np.concatenate(outs)
    finally:
        del os.environ["HT_NO_NATIVE"]
    np.testing.assert_array_equal(out, ref)

    # exact search: every stored key found, shifted keys not
    hit = native.exact_search(shi, slo, shi, slo)
    np.testing.assert_array_equal(shi[hit], shi)
    np.testing.assert_array_equal(slo[hit], slo)


def test_native_sort_perm():
    rng = np.random.default_rng(2)
    hi = rng.integers(0, 50, 30000).astype(np.uint64)
    lo = rng.integers(0, 2**63, 30000).astype(np.uint64)
    perm = native.sort_perm(hi, lo)
    ref = np.lexsort((lo, hi))
    np.testing.assert_array_equal(perm, ref)


def test_mesh_pipeline_native_equals_numpy():
    """Golden mesh reproduction with native kernels enabled (they are
    already on by default; this exercises the big-array paths)."""
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    S = "/root/reference/examples/simple"
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.freq = 10.0  # -> 31.25m, 16k elements: above native thresholds
    p.finalize()
    cvm = CVM(f"{S}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    assert mesh.lenum == 32 * 32 * 16
    assert mesh.nnum == 33 * 33 * 17
