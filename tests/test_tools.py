import io
import os

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.sim import Simulation, SimOutputs, setup_stations
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.io.meshout import write_mesh_etree
from hercules_tpu.tools import cvmtools
from hercules_tpu.tools.q4 import q4_point, q4_node, show_meta

SIMPLE = "/root/reference/examples/simple"


def test_cvm_tools(capsys):
    db = f"{SIMPLE}/simple_case.e"
    assert cvmtools.querycvm(db, ["500", "500", "100"]) == 0
    out = capsys.readouterr().out
    assert "Vp = 6000.0000" in out and "Vs = 3464.0000" in out
    assert cvmtools.scancvm(db) == 0
    out = capsys.readouterr().out
    assert "records          = 2048" in out
    assert cvmtools.showdbctl(db) == 0
    out = capsys.readouterr().out
    assert "domain_endpoint_x" in out and "2147483648" in out
    assert cvmtools.pickrecord(db, "0") == 0
    assert cvmtools.dumpcvm(db, 3) == 0
    out = capsys.readouterr().out
    assert out.count("\n") >= 3


def test_q4_roundtrip(tmp_path):
    """Run a short sim with 4D output, then single_query the result and
    compare against the in-loop station samples."""
    p = load_params(f"{SIMPLE}/in/physics.in", f"{SIMPLE}/in/numerical.in")
    p.end_time = 0.3
    p.output_displacement = 1
    p.output_rate = 5
    p.output_displacement_file = str(tmp_path / "disp.h4d")
    p.number_output_planes = 0
    p.finalize()
    cvm = CVM(f"{SIMPLE}/simple_case.e")
    mesh = generate_mesh(p, cvm)
    tables = assemble(mesh, p)
    from hercules_tpu.source.model import SourceModel
    src = SourceModel.parse(p)
    src_ids, src_forces = src.compute_forces(mesh, p)
    st = setup_stations(mesh, p)
    sim = Simulation(params=p, cvm=cvm, mesh=mesh, tables=tables,
                     source=src, src_ids=src_ids, src_forces=src_forces,
                     stations=st)
    outputs = SimOutputs(mesh, p, rundir=str(tmp_path))
    state, samples = sim.run(dtype=jnp.float64, outputs=outputs)

    mesh_e = str(tmp_path / "mesh.e")
    write_mesh_etree(mesh_e, mesh)

    # station 0 at (500,500,100): q4_point through mesh.e + disp.h4d
    hdr, series = q4_point(500.0, 500.0, 100.0, mesh_e,
                           p.output_displacement_file)
    assert series.shape[0] == (p.total_steps + 4) // 5
    # compare with in-loop samples at tap steps
    for k in range(series.shape[0]):
        np.testing.assert_allclose(series[k], samples[k * 5, 0],
                                   rtol=1e-12, atol=1e-18)

    # q4_node of a known node equals the snapshot
    hdr2, ns = q4_node(0, p.output_displacement_file)
    assert ns.shape == series.shape

    out = io.StringIO()
    show_meta(p.output_displacement_file, out)
    assert "Hercules 4D output" in out.getvalue()


def test_qmesh_cli(tmp_path, capsys):
    from hercules_tpu.tools.qmesh import main
    mesh_out = str(tmp_path / "m.e")
    rc = main([f"{SIMPLE}/simple_case.e", f"{SIMPLE}/in/physics.in",
               f"{SIMPLE}/in/numerical.in", mesh_out,
               "--matlab", str(tmp_path / "ml")])
    assert rc == 0
    assert os.path.exists(mesh_out)
    assert os.path.exists(tmp_path / "ml" / "mesh_coordinates.0")
    coords = np.fromfile(tmp_path / "ml" / "mesh_coordinates.0", "<i4")
    assert coords.size == 2048 * 8 * 3
    data = np.fromfile(tmp_path / "ml" / "mesh_data.0", "<f4")
    np.testing.assert_allclose(data.reshape(-1, 3)[:, 0], 3464.0)


def test_plotmesh_cli(tmp_path):
    """plotmesh.m equivalent: qmesh --matlab dump -> parameter file
    (reference plot3d_Hercules_v2 layout) -> PNG render, both data
    and processor coloring."""
    from hercules_tpu.tools.qmesh import main as qmesh_main
    from hercules_tpu.tools.plotmesh import (main, read_matlab_mesh,
                                             ticks_to_meters)

    ml = tmp_path / "ml"
    rc = qmesh_main([f"{SIMPLE}/simple_case.e", f"{SIMPLE}/in/physics.in",
                     f"{SIMPLE}/in/numerical.in", str(tmp_path / "m.e"),
                     "--matlab", str(ml)])
    assert rc == 0

    coords, data, part = read_matlab_mesh(str(ml))
    assert coords.shape == (2048, 8, 3) and data.shape == (2048, 3)
    m = ticks_to_meters(coords, (1000.0, 1000.0, 500.0))
    # simple case: 1000x1000x500 m domain, level-4 cubes of 62.5 m
    assert m.max() == 1000.0
    np.testing.assert_allclose(np.ptp(m[0], axis=0), 62.5)

    pfile = tmp_path / "parameters_for_matlab.in"
    pfile.write_text(
        "x dimension in m : 1000\n"
        "y dimension in m : 1000\n"
        "z dimension in m : 500\n"
        "x start : 0\nx end : 1000\n"
        "y start : 0\ny end : 1000\n"
        "z start : 0\nz end : 200\n"
        "4th dim Vs(1) Vp(2) Rho(3) : 1\n"
        "number of processors : 1\n"
        f"coord dir : {ml}\n"
        f"data dir : {ml}\n"
        "plot processor(p) or data(d) : d\n")
    out_png = tmp_path / "mesh.png"
    assert main([str(pfile), str(out_png)]) == 0
    assert out_png.stat().st_size > 10000

    # processor coloring mode
    pfile2 = tmp_path / "p2.in"
    pfile2.write_text(pfile.read_text().replace(
        "plot processor(p) or data(d) : d",
        "plot processor(p) or data(d) : p"))
    out2 = tmp_path / "mesh_pe.png"
    assert main([str(pfile2), str(out2)]) == 0
    assert out2.stat().st_size > 10000
