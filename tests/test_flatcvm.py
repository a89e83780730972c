"""Flat-record material input (the reference's non-USECVMDB path):
sliceCVM (psolve.c:1439-1671) + zsearch/setrec (psolve.c:1402-1437,
1857-1913).  The flat file must feed the same material pass as the
etree CVM and produce the identical mesh."""

import os

import numpy as np
import pytest

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM, FlatCVM, open_material_db
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.tools.cvmtools import flatten
from hercules_tpu.tools.makecvm import build_layered_cvm

S = "/root/reference/examples/simple"

# soft basin over stiff halfspace on the examples/simple domain --
# grades the mesh (fine near the surface) so the parity test covers
# multiple levels, not just a uniform brick
LAYERS = [
    [0.0, 2400.0, 1200.0, 2100.0],
    [250.0, 6000.0, 3464.0, 2700.0],
]


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("flatcvm")
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    p.vscut = 1000.0          # keep the soft layer soft
    p.freq = 2.0
    p.finalize()
    et_path = str(d / "layers.e")
    build_layered_cvm(et_path, p.region_length_east_m,
                      p.region_length_north_m, p.region_depth_deep_m,
                      62.5, LAYERS,
                      origin_lat=p.region_origin_latitude_deg,
                      origin_lon=p.region_origin_longitude_deg)
    flat_path = str(d / "layers.flat")
    flatten(et_path, flat_path, p.region_length_north_m,
            p.region_length_east_m, p.region_depth_deep_m,
            out=open(os.devnull, "w"))
    return p, et_path, flat_path


def test_query_parity(dbs):
    """Random in-domain points answer identically through the etree
    ancestor search and the flat-record Z-order floor search."""
    p, et_path, flat_path = dbs
    cvm = CVM(et_path)
    fcvm = FlatCVM.from_params(flat_path, p)
    rng = np.random.default_rng(7)
    east = rng.uniform(0, p.region_length_east_m, 4096)
    north = rng.uniform(0, p.region_length_north_m, 4096)
    depth = rng.uniform(0, p.region_depth_deep_m, 4096)
    ok_e, vp_e, vs_e, rho_e = cvm.query(east, north, depth)
    ok_f, vp_f, vs_f, rho_f = fcvm.query(east, north, depth)
    assert np.array_equal(ok_e, ok_f) and ok_e.all()
    np.testing.assert_array_equal(vp_e, vp_f)
    np.testing.assert_array_equal(vs_e, vs_f)
    np.testing.assert_array_equal(rho_e, rho_f)


def test_out_of_domain(dbs):
    p, _, flat_path = dbs
    fcvm = FlatCVM.from_params(flat_path, p)
    ok, vp, _, _ = fcvm.query([-1.0, p.region_length_east_m + 1.0],
                              [10.0, 10.0], [10.0, 10.0])
    assert not ok.any() and np.isnan(vp).all()


def test_mesh_parity(dbs):
    """generate_mesh through the flat file == through the etree: same
    octants, same node tables, same corrected material properties."""
    p, et_path, flat_path = dbs
    mesh_e = generate_mesh(p, CVM(et_path))
    mesh_f = generate_mesh(p, FlatCVM.from_params(flat_path, p))
    assert mesh_e.lenum == mesh_f.lenum and mesh_e.nnum == mesh_f.nnum
    np.testing.assert_array_equal(mesh_e.elem_lnid, mesh_f.elem_lnid)
    np.testing.assert_array_equal(mesh_e.elem_level, mesh_f.elem_level)
    np.testing.assert_array_equal(mesh_e.node_x, mesh_f.node_x)
    for k in mesh_e.props:
        np.testing.assert_array_equal(mesh_e.props[k], mesh_f.props[k],
                                      err_msg=k)
    # the graded fixture actually exercised more than one level
    assert len(np.unique(mesh_e.elem_level)) > 1


def test_open_material_db_sniffs(dbs):
    p, et_path, flat_path = dbs
    assert isinstance(open_material_db(et_path, p), CVM)
    assert isinstance(open_material_db(flat_path, p), FlatCVM)
