import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.buildings import Buildings
from hercules_tpu.config import load_params, ConfigFile
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import run_solver

SIMPLE = "/root/reference/examples/simple"

BLDG_CFG = """
number_of_buildings = 1
buildings_n_factor  = 2
min_octant_size_m   = 62.5
surface_shift_m     = 62.5
consider_fixed_base = no
#                   xmin   xmax   ymin   ymax  depth height bVp  bVs  brho fVp  fVs  frho
building_properties =
  437.5  562.5  437.5  562.5  62.5  62.5  1000 500 2000 2000 1000 2200
"""


def _cfg(tmp_path, text=BLDG_CFG):
    p = tmp_path / "bldg.in"
    p.write_text(text)
    return ConfigFile(str(p))


@pytest.fixture(scope="module")
def bmesh(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bldg")
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    b = Buildings.parse(_cfg(tmp))
    mesh = generate_mesh(p, cvm, buildings=b)
    return p, cvm, b, mesh


def test_parse_and_adjust(tmp_path):
    b = Buildings.parse(_cfg(tmp_path))
    assert b.n == 1
    assert b.surface_shift == 62.5
    np.testing.assert_allclose(b.zmin, [0.0])     # height == shift
    np.testing.assert_allclose(b.zmax, [125.0])   # shift + depth
    np.testing.assert_allclose(b.bldg_props[0], [1000, 500, 2000])


def test_building_mesh_carved(bmesh):
    p, cvm, b, mesh = bmesh
    ts = mesh.ticksize
    z = mesh.elem_z.astype(np.float64) * ts
    x = mesh.elem_x.astype(np.float64) * ts
    y = mesh.elem_y.astype(np.float64) * ts

    # all above-surface elements belong to the building footprint
    above = z < b.surface_shift
    assert above.any()
    assert ((x[above] >= 437.5 - 1e-9) & (x[above] < 562.5)).all()
    assert ((y[above] >= 437.5 - 1e-9) & (y[above] < 562.5)).all()
    # no air: every element has positive Vp
    assert (mesh.props["Vp"] > 0).all()
    # building elements carry building properties
    assert np.allclose(mesh.props["Vs"][above], 500.0)
    # foundation elements carry foundation properties
    fdn = ((z >= b.surface_shift) & (z < 125.0)
           & (x >= 437.5) & (x < 562.5) & (y >= 437.5) & (y < 562.5))
    assert fdn.any()
    assert np.allclose(mesh.props["Vs"][fdn], 1000.0)
    # the soil got meshed below the shifted surface
    soil = z >= b.surface_shift
    assert np.allclose(mesh.props["Vs"][soil & ~fdn], 3464.0)


def test_building_sim_stable(bmesh):
    p, cvm, b, mesh = bmesh
    tables = assemble(mesh, p)
    nid = mesh.elem_lnid[mesh.lenum // 2, 0]
    T = 150
    forces = np.zeros((T, 1, 3))
    forces[:20, 0, :] = 1e8
    state, _ = run_solver(tables, np.array([nid], np.int32), forces, T,
                          p.delta_t, dtype=jnp.float64)
    u = np.asarray(state[0])
    assert np.isfinite(u).all() and np.abs(u).max() > 0


def test_fixed_base(tmp_path, bmesh):
    p, cvm, b, mesh = bmesh
    ids, which = b.base_nodes(mesh)
    # the building vs-rule (Vs=500, factor 40) refines the footprint to
    # 7.8125-m elements: 16x16 -> 17x17 base nodes
    assert len(ids) == 17 * 17
    # drive the base with a ramp in x
    tables = assemble(mesh, p)
    T = 100
    series = np.zeros((T, len(ids), 3))
    series[:, :, 0] = np.linspace(0, 1e-3, T)[:, None]
    forces = np.zeros((T, 1, 3))
    state, _ = run_solver(tables, np.array([0], np.int32), forces, T,
                          p.delta_t, dtype=jnp.float64,
                          fb_ids=ids, fb_series=series)
    u = np.asarray(state[0])
    np.testing.assert_allclose(u[ids, 0], series[-1, :, 0], rtol=1e-12)
    # motion radiated into the rest of the mesh
    others = np.setdiff1d(np.arange(mesh.nnum), ids)
    assert np.abs(u[others]).max() > 0


def test_base_disp_series(tmp_path):
    b = Buildings.parse(_cfg(tmp_path, BLDG_CFG.replace(
        "consider_fixed_base = no",
        "consider_fixed_base = yes\nfixedbase_input_dt = 0.01\n"
        "fixedbase_input_dir = fb\nfixedbase_input_startindex = 0\n"
        "fixedbase_input_sufix = base")))
    d = tmp_path / "fb"
    d.mkdir()
    t = np.arange(60) * 0.01
    np.savetxt(d / "base.0", np.stack([np.sin(t), t, 0 * t], 1))
    series = b.base_disp_series(0.5, 0.001, 400, rundir=str(tmp_path))
    assert series.shape == (400, 1, 3)
    np.testing.assert_allclose(series[0, 0], [0, 0, 0], atol=1e-12)
    # linear interpolation between 10-ms samples at 1-ms steps
    np.testing.assert_allclose(series[105, 0, 1], 0.105, rtol=1e-9)


def test_fixed_base_through_simulation(tmp_path):
    """VERDICT r1 item 8: fixedbase_input_* series load + apply through
    Simulation.run (the reference config surface), not just run_solver."""
    import shutil
    from hercules_tpu.sim import Simulation

    run = tmp_path / "run"
    (run / "in").mkdir(parents=True)
    shutil.copy(f"{SIMPLE}/in/physics.in", run / "in" / "physics.in")
    shutil.copytree(f"{SIMPLE}/in/sourcefiles", run / "in" / "sourcefiles")
    num = open(f"{SIMPLE}/in/numerical.in").read()
    num = num.replace("simulation_end_time_sec        =  20",
                      "simulation_end_time_sec        =  0.1")
    num += ("\ninclude_buildings = yes\n" + BLDG_CFG.replace(
        "consider_fixed_base = no",
        "consider_fixed_base = yes\nfixedbase_input_dt = 0.01\n"
        "fixedbase_input_dir = fb\nfixedbase_input_startindex = 0\n"
        "fixedbase_input_sufix = base"))
    (run / "in" / "numerical.in").write_text(num)
    d = run / "fb"
    d.mkdir()
    t = np.arange(60) * 0.01
    np.savetxt(d / "base.0", np.stack([np.sin(t), 0 * t, 0 * t], 1))

    sim = Simulation.setup(str(run / "in" / "physics.in"),
                           str(run / "in" / "numerical.in"),
                           cvmdb=f"{SIMPLE}/simple_case.e")
    assert sim.mesh.buildings is not None
    assert sim.mesh.buildings.fixed_base
    state, _ = sim.run(dtype=jnp.float64, rundir=str(run))
    u = np.asarray(state[0])
    ids, which = sim.mesh.buildings.base_nodes(sim.mesh)
    series = sim.mesh.buildings.base_disp_series(
        0.1, sim.params.delta_t, sim.params.total_steps,
        rundir=str(run))
    # final base displacement equals the prescribed series
    np.testing.assert_allclose(u[ids], series[-1, which, :], rtol=1e-12)
    assert np.abs(u[ids, 0]).max() > 0
