"""The LOH.1 (validation B2) benchmark definition, shared by the test
suite and the golden-seismogram generator.

Medium, source and geometry follow the reference's Table B2
(doc/validationtests.pdf): a 1 km layer Vp=4000/Vs=2000/rho=2600 over
a halfspace Vp=6000/Vs=3464/rho=2700, strike-slip point double-couple
at 2 km depth, exponential moment ramp M0*(1-(1+t/T)e^{-t/T}) low-pass
filtered at 0.5 Hz.  Stations sit off the nodal planes.

`python -m hercules_tpu.tools.loh1 <out.npz>` regenerates the
converged f64 golden: the uniformly fine (375 m) mesh run with the
unstructured oracle solver in float64.  The committed artifact
(tests/goldens/loh1_fine_f64.npz) is the physics gate the production
graded pipeline is GOF-scored against (utils/gof.py).
"""

from __future__ import annotations

import os

import numpy as np

SIMPLE = "/root/reference/examples/simple"

# Table B2 medium
LAYERS = [[0.0, 4000.0, 2000.0, 2600.0],
          [1000.0, 6000.0, 3464.0, 2700.0]]
EAST = NORTH = 12000.0
DEEP = 6000.0
SRC = (6000.0, 6000.0, 2000.0)       # x, y, depth — in the halfspace
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


def build_cvm(tmp):
    from ..cvm import CVM
    from .makecvm import build_layered_cvm
    path = os.path.join(tmp, "loh1.e")
    build_layered_cvm(path, EAST, NORTH, DEEP, 250.0, LAYERS)
    return CVM(path)


def make_params(tmp):
    from ..config import load_params
    p = load_params(f"{SIMPLE}/in/physics.in",
                    f"{SIMPLE}/in/numerical.in")
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


def fine_mesh(p, cvm):
    """Uniform 375 m mesh: the halfspace at 2x the vs-rule resolution."""
    from ..material import MeshOrigin, correct_properties
    from ..mesh import Octree, extract_mesh
    tree = Octree.newtree(EAST, NORTH, DEEP)

    def setrec(tr, hi, lo, lv):
        return {"lv": lv}

    def toexpand(tr, hi, lo, lv, rec):
        return np.full(np.shape(hi), lv < 5)

    tree.refine(setrec, toexpand)
    tree.balance()
    mesh = extract_mesh(tree)
    correct_properties(mesh, cvm, p, MeshOrigin.from_params(p, cvm.ctl))
    return mesh


def station_tables(mesh):
    from ..mesh.locate import local_coords, locate_points
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


def run(mesh, p, dtype=None):
    """f64 unstructured-oracle run; returns station samples [T, S, 3]."""
    import jax.numpy as jnp
    from ..solver.assemble import assemble
    from ..solver.step import run_solver
    from ..source.model import SourceModel
    tables = assemble(mesh, p)
    sm = SourceModel.parse(p)
    src_ids, forces = sm.compute_forces(mesh, p)
    st_nodes, st_phi = station_tables(mesh)
    _, samples = run_solver(tables, src_ids, forces, p.total_steps,
                            p.delta_t, st_nodes=st_nodes,
                            st_phi=st_phi,
                            dtype=dtype or jnp.float64)
    return np.asarray(samples)


GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))),
    "tests", "goldens", "loh1_fine_f64.npz")


def main(argv=None):
    import sys
    import tempfile
    out = (argv or sys.argv[1:] or [GOLDEN])[0]
    tmp = tempfile.mkdtemp(prefix="loh1_golden_")
    cvm = build_cvm(tmp)
    p = make_params(tmp)
    mesh = fine_mesh(p, cvm)
    samples = run(mesh, p)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, samples=samples, dt=DT, stations=np.array(STATIONS),
        layers=np.array(LAYERS), src=np.array(SRC),
        note="LOH.1 (validationtests.pdf B2) converged f64 fine-mesh "
             "(375 m uniform) seismograms; regenerate with "
             "python -m hercules_tpu.tools.loh1")
    print(f"golden written: {out} ({samples.shape})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
