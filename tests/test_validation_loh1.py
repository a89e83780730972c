"""LOH.1 (B2) layered-halfspace validation.

The reference's second physics benchmark (doc/validationtests.pdf,
Table B2): a layer Vp=4000/Vs=2000/rho=2600 over a halfspace
Vp=6000/Vs=3464/rho=2700, point double-couple source below the
interface, exponential moment ramp M0*(1-(1+t/T)e^{-t/T}) (the
reference's EXPONENTIAL slip function integrates LOH.1's
(t/T^2)e^{-t/T} slip rate).

Without network access to the SCEC reference seismograms, validation is
by (a) a converged-reference comparison -- the production graded-octree
pipeline (hanging nodes across the velocity interface) against a
uniformly fine mesh whose halfspace resolution is 2x higher, exactly
the physics the interface/hanging-node treatment must not corrupt --
and (b) a ray-theoretic first-arrival check: the P wave refracts at the
interface per Fermat's principle, so the direct-path travel time is
computable independently of the solver.

Stations sit at 45/30/60-degree azimuths, off the strike-slip nodal
planes (on-plane stations see the residual of near-cancelling force
couples, which is dominated by source-element discretization rather
than the interface physics under test).
"""

import copy
import os

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.material import MeshOrigin, correct_properties
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.mesh.locate import locate_points, local_coords
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import run_solver
from hercules_tpu.source.model import SourceModel
from hercules_tpu.tools.makecvm import build_layered_cvm

SIMPLE = "/root/reference/examples/simple"

# Table B2 medium
LAYERS = [[0.0, 4000.0, 2000.0, 2600.0],
          [1000.0, 6000.0, 3464.0, 2700.0]]
EAST = NORTH = 12000.0
DEEP = 6000.0
SRC = (6000.0, 6000.0, 2000.0)       # x, y, depth -- in the halfspace
STATIONS = [(9000.0, 9000.0), (9674.0, 8121.0), (8121.0, 9674.0)]
F = 0.5
DT = 0.02
T_END = 4.0

SOURCE_IN = """
type_of_source = point
lonlat_or_cartesian = 1
hypocenter_x = {x}
hypocenter_y = {y}
hypocenter_depth_m = {z}
source_strike_deg = 90
source_dip_deg = 90
source_rake_deg = 0
moment_amplitude = 1e18
source_function_type = exponential
average_risetime_sec = 0.8
source_is_filtered = 1
threshold_frequency = 0.5
number_of_poles = 14
number_of_time_windows = 1
time_windows =
0
domain_surface_corners =
  0.0   0.0
  0.0   0.1
  0.1   0.1
  0.1   0.0
"""


def _params(tmp, cvm_path):
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    p.region_length_east_m = EAST
    p.region_length_north_m = NORTH
    p.region_depth_deep_m = DEEP
    p.freq = F
    p.delta_t = DT
    p.start_time = 0.0
    p.end_time = T_END
    p.vscut = 500.0
    p.type_of_damping = "none"
    srcdir = os.path.join(tmp, "src")
    os.makedirs(srcdir, exist_ok=True)
    with open(os.path.join(srcdir, "source.in"), "w") as f:
        f.write(SOURCE_IN.format(x=SRC[0], y=SRC[1], z=SRC[2]))
    p.source_directory = srcdir
    p.finalize()
    return p


def _stations_for(mesh):
    x = np.array([s[0] for s in STATIONS])
    y = np.array([s[1] for s in STATIONS])
    z = np.zeros(len(STATIONS))
    found, eidx = locate_points(mesh, x, y, z)
    assert found.all()
    cx, cy, cz = local_coords(mesh, eidx, x, y, z)
    XI = np.array([[-1, 1, -1, 1, -1, 1, -1, 1],
                   [-1, -1, 1, 1, -1, -1, 1, 1],
                   [-1, -1, -1, -1, 1, 1, 1, 1]], np.float64)
    phi = ((1 + XI[0][None] * cx[:, None])
           * (1 + XI[1][None] * cy[:, None])
           * (1 + XI[2][None] * cz[:, None]) / 8.0)
    return mesh.elem_lnid[eidx], phi


def _run(mesh, p):
    tables = assemble(mesh, p)
    sm = SourceModel.parse(p)
    src_ids, forces = sm.compute_forces(mesh, p)
    st_nodes, st_phi = _stations_for(mesh)
    _, samples = run_solver(tables, src_ids, forces, p.total_steps,
                            p.delta_t, st_nodes=st_nodes, st_phi=st_phi,
                            dtype=jnp.float64)
    return np.asarray(samples)          # [T, S, 3]


@pytest.fixture(scope="module")
def loh1(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("loh1"))
    cvm_path = os.path.join(tmp, "loh1.e")
    build_layered_cvm(cvm_path, EAST, NORTH, DEEP, 250.0, LAYERS)
    cvm = CVM(cvm_path)
    p = _params(tmp, cvm_path)

    # production path: graded octree from the vs-rule (375 m in the
    # layer, 750 m in the halfspace -> hanging nodes on the interface)
    graded = generate_mesh(p, cvm)

    # converged reference: uniform 375 m everywhere (the halfspace at
    # 2x the vs-rule resolution; the layer resolution unchanged)
    tree = Octree.newtree(EAST, NORTH, DEEP)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        return np.full(np.shape(hi), lv < 5)

    tree.refine(setrec, toexpand)
    tree.balance()
    fine = extract_mesh(tree)
    correct_properties(fine, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    return p, graded, fine


def test_loh1_mesh_is_graded_with_correct_materials(loh1):
    p, graded, fine = loh1
    ts = graded.ticksize
    z = graded.elem_z.astype(np.float64) * ts
    e = ts * (np.int64(1) << (30 - graded.elem_level.astype(np.int64)))
    assert len(np.unique(graded.elem_level)) >= 2
    assert len(graded.dn_ids) > 0
    # material assignment follows the B2 table
    layer = z + e <= 1000.0 + 1e-6
    half = z >= 1000.0 - 1e-6
    assert layer.any() and half.any()
    np.testing.assert_allclose(graded.props["Vs"][layer], 2000.0)
    np.testing.assert_allclose(graded.props["Vs"][half], 3464.0)
    np.testing.assert_allclose(graded.props["Vp"][half], 6000.0)
    # vs-rule grading: layer elements smaller than halfspace elements
    assert e[layer].max() < e[half].max()
    # the fine mesh is uniform at the layer resolution
    assert len(np.unique(fine.elem_level)) == 1


def test_loh1_graded_matches_converged_reference(loh1):
    """Graded-interface seismograms vs the uniformly fine run."""
    p, graded, fine = loh1
    sg = _run(graded, p)
    sf = _run(fine, p)
    assert np.abs(sf).max() > 0
    for s in range(len(STATIONS)):
        for c in range(3):
            ref = sf[:, s, c]
            scale = np.sqrt(np.mean(sf[:, s] ** 2))   # station RMS
            if scale == 0:
                continue
            mis = np.sqrt(np.mean((sg[:, s, c] - ref) ** 2)) / scale
            assert mis < 0.08, (s, c, mis)


def test_loh1_p_arrival_matches_ray_theory(loh1):
    """First motion at the surface station vs the Fermat travel time
    of the refracted direct P through the interface."""
    p, graded, fine = loh1
    sf = _run(fine, p)
    st = 0                               # (9000, 9000): 4243 m offset
    R = np.hypot(STATIONS[st][0] - SRC[0], STATIONS[st][1] - SRC[1])
    d_half = SRC[2] - 1000.0             # source below the interface
    d_lay = 1000.0
    a = np.linspace(0.0, R, 20001)       # crossing-point offset
    t_path = (np.sqrt(a ** 2 + d_half ** 2) / 6000.0
              + np.sqrt((R - a) ** 2 + d_lay ** 2) / 4000.0)
    t_p = t_path.min()
    u = np.linalg.norm(sf[:, st, :], axis=1)
    thresh = 0.01 * u.max()
    t_detect = DT * np.argmax(u > thresh)
    # emergent exponential onset: detection must not precede the ray
    # arrival (beyond grid dispersion) and must follow within a
    # fraction of the rise time
    assert t_detect > t_p - 2 * DT, (t_detect, t_p)
    assert t_detect < t_p + 1.0, (t_detect, t_p)
