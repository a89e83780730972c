"""End-to-end terashake-class run: the reference's examples/terashake
config (600x300x84.4 km SCEC box, planewithkinks kinematic rupture)
with an in-tree synthetic layered CVM standing in for the SCEC
database (which is not shipped), at reduced frequency/steps so the
test stays small."""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.cvm import CVM
from hercules_tpu.meshgen import generate_mesh
from hercules_tpu.sim import Simulation
from hercules_tpu.tools.makecvm import build_layered_cvm

TERA = "/root/reference/examples/terashake"


@pytest.fixture(scope="module")
def tera_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tera")
    # synthetic layered crust: soft basin fill over stiff crust
    layers = [
        [0.0, 1200.0, 500.0, 2000.0],
        [9375.0, 3500.0, 1800.0, 2400.0],
        [28125.0, 6000.0, 3464.0, 2700.0],
    ]
    cvm_path = str(d / "tera_layers.e")
    n = build_layered_cvm(cvm_path, 600000.0, 300000.0, 84375.0,
                          4687.5, layers,
                          origin_lat=34.5, origin_lon=-121.0)
    assert n > 0

    # run directory: reference inputs + reduced numerical settings
    (d / "in").mkdir()
    phys = open(f"{TERA}/physics.in").read()
    num = open(f"{TERA}/numerical.in").read()
    # the reference file is tab-separated: patch by key, not literal
    import re
    num = re.sub(r"simulation_wave_max_freq_hz\s*=\s*\S+",
                 "simulation_wave_max_freq_hz = .0125", num)
    num = re.sub(r"^simulation_end_time_sec\s*=\s*\S+",
                 "simulation_end_time_sec = 4", num, flags=re.M)
    num = re.sub(r"number_output_planes\s*=\s*\S+",
                 "number_output_planes = 0", num)
    (d / "in" / "physics.in").write_text(phys)
    (d / "in" / "numerical.in").write_text(num)

    # source dir: reference source.in with a reduced fault grid +
    # synthesized slip/rake tables (not shipped in-tree)
    (d / "src").mkdir()
    src = open(f"{TERA}/sourceterashake/source.in").read()
    src = src.replace("extended_cells_along_strike         = 1000",
                      "extended_cells_along_strike         = 50")
    src = src.replace("extended_cells_down_dip             = 75",
                      "extended_cells_down_dip             = 5")
    src = src.replace("extended_cell_size_down_dip_m       = 200.",
                      "extended_cell_size_down_dip_m       = 3000.")
    (d / "src" / "source.in").write_text(src)
    rows, cols, nw = 5, 50, 6
    rng = np.random.default_rng(0)
    slip = np.abs(rng.normal(1.0, 0.3, (nw, rows, cols)))
    rake = np.full((nw, rows, cols), 180.0)
    np.savetxt(d / "src" / "slip.in", slip.reshape(nw * rows, cols))
    np.savetxt(d / "src" / "rake.in", rake.reshape(nw * rows, cols))
    return d


def test_terashake_mesh_and_run(tera_dir):
    d = tera_dir
    p = load_params(str(d / "in" / "physics.in"),
                    str(d / "in" / "numerical.in"))
    assert p.region_length_east_m == 600000.0
    p.source_directory = str(d / "src")
    cvm = CVM(str(d / "tera_layers.e"))
    mesh = generate_mesh(p, cvm)
    # graded mesh: smaller elements in the soft basin than at depth
    assert len(np.unique(mesh.elem_level)) >= 2
    assert mesh.lenum > 1000
    # hanging nodes exist at the grading interfaces
    assert len(mesh.dn_ids) > 0

    from hercules_tpu.source.model import SourceModel
    from hercules_tpu.solver.assemble import assemble
    from hercules_tpu.solver.step import run_solver

    sm = SourceModel.parse(p)
    assert sm.type_of_source == "planewithkinks"
    ids, forces = sm.compute_forces(mesh, p)
    assert sm.total_m0 > 0
    T = p.total_steps
    assert T == 200

    tables = assemble(mesh, p)
    state, _ = run_solver(tables, ids, forces, T, p.delta_t,
                          dtype=jnp.float64)
    u = np.asarray(state[0])
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 1e-8

    # brick path on the graded mesh agrees with the unstructured one
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.brickstep import (brick_u_global,
                                               run_brick_solver)
    plan = build_plan(mesh)
    # hybrid plan: dense brick(s) + loose graded-shell elements
    assert len(plan.bricks) >= 1
    assert len(plan.loose_eidx) > 0
    assert (sum(int(np.prod(b.shape)) for b in plan.bricks)
            + len(plan.loose_eidx)) == mesh.lenum
    bstate, _ = run_brick_solver(plan, tables, ids, forces, T,
                                 p.delta_t, dtype=jnp.float64)
    ub = brick_u_global(plan, bstate[0], mesh.nnum)
    scale = np.abs(u).max()
    np.testing.assert_allclose(ub / scale, u / scale, atol=1e-9)
