"""etree mutation API (etree/edit.py): etree_insert/delete/update/
search/cursor semantics (etree.h:328-398, 590-653) with bulk-writer
commit — including the patch-a-CVM-in-place use case."""

import numpy as np
import pytest

from hercules_tpu.cvm import CVM
from hercules_tpu.etree.edit import EtreeEditor, EtreeError
from hercules_tpu.etree.reader import EtreeReader

SIMPLE_E = "/root/reference/examples/simple/simple_case.e"


def test_open_cursor_walk_matches_octants():
    ed = EtreeEditor.open(SIMPLE_E)
    r = EtreeReader(SIMPLE_E, out_of_core=False)
    assert ed.n == r.total_count() == 2048
    # preorder cursor = Z-order record walk
    ed.initcursor()
    seen = 0
    x, y, z, lv, _ = r.octants()
    while True:
        cur = ed.getcursor()
        if cur is None:
            break
        addr, pay = cur
        assert addr["x"] == int(x[seen])
        assert addr["y"] == int(y[seen])
        assert addr["z"] == int(z[seen])
        assert addr["level"] == int(lv[seen])
        seen += 1
        if not ed.advcursor():
            break
    assert seen == ed.n


def test_insert_delete_update_roundtrip(tmp_path):
    ed = EtreeEditor.open(SIMPLE_E)
    n0 = ed.n
    # delete one octant, re-insert it with a modified payload
    ed.initcursor()
    addr, pay = ed.getcursor()
    ed.delete(addr["x"], addr["y"], addr["z"], addr["level"])
    assert ed.n == n0 - 1
    with pytest.raises(EtreeError):
        ed.delete(addr["x"], addr["y"], addr["z"], addr["level"])
    with pytest.raises(EtreeError):
        ed.update(addr["x"], addr["y"], addr["z"], addr["level"], pay)
    ed.insert(addr["x"], addr["y"], addr["z"], addr["level"], pay)
    assert ed.n == n0
    with pytest.raises(EtreeError):
        ed.insert(addr["x"], addr["y"], addr["z"], addr["level"], pay)

    # exact search finds it; region search resolves interior points
    ok, rows, pos = ed.search(addr["x"], addr["y"], addr["z"],
                              addr["level"])
    assert ok.all()
    ok2, _, _ = ed.search(addr["x"] + 1, addr["y"] + 1, addr["z"] + 1)
    assert ok2.all()

    # commit -> reference-readable file, identical content
    out = str(tmp_path / "edited.e")
    ed.commit(out)
    r0 = EtreeReader(SIMPLE_E, out_of_core=False)
    r1 = EtreeReader(out, out_of_core=False)
    assert r1.total_count() == r0.total_count()
    np.testing.assert_array_equal(r1.hi, r0.hi)
    np.testing.assert_array_equal(r1.level, r0.level)


def test_patch_cvm_in_place(tmp_path):
    """The capability etree mutation exists for: patch a CVM region's
    properties and use the edited database as a drop-in CVM."""
    ed = EtreeEditor.open(SIMPLE_E)
    r = EtreeReader(SIMPLE_E, out_of_core=False)
    x, y, z, lv, pay = r.octants()
    dt = r.schema.dtype()
    # soften the top layer: Vs 3464 -> 1200 where z == 0
    sel = np.flatnonzero(z == 0)
    rows = pay[sel].copy()
    rows["Vs"] = 1200.0
    ed.update(x[sel], y[sel], z[sel], lv[sel],
              rows.view(np.uint8).reshape(len(sel), -1))
    out = str(tmp_path / "patched.e")
    ed.commit(out)
    cvm = CVM(out)
    okA, vpA, vsA, rhoA = cvm.query(
        np.array([10.0]), np.array([10.0]), np.array([1.0]))
    okB, vpB, vsB, rhoB = cvm.query(
        np.array([10.0]), np.array([10.0]), np.array([400.0]))
    assert okA.all() and okB.all()
    assert vsA[0] == pytest.approx(1200.0)
    assert vsB[0] == pytest.approx(3464.0)
    assert vpA[0] == pytest.approx(vpB[0])   # only Vs patched
