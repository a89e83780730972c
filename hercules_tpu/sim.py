"""End-to-end simulation pipeline: the psolve main() equivalent
(psolve.c:7335-7568) — config, CVM, meshing, solver setup, source,
stations, time loop, outputs."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .config import Params, load_params
from .cvm import CVM
from .meshgen import generate_mesh
from .mesh.locate import locate_points, local_coords
from .physics.consts import critical_dt
from .solver.assemble import assemble
from .solver.step import run_solver
from .source.model import SourceModel, compute_domain_coords_linearinterp

XI = np.array([
    [-1, 1, -1, 1, -1, 1, -1, 1],
    [-1, -1, 1, 1, -1, -1, 1, 1],
    [-1, -1, -1, -1, 1, 1, 1, 1],
], dtype=np.float64)


@dataclass
class StationSet:
    ids: np.ndarray          # [S] original station indices
    nodes: np.ndarray        # [S, 8] node ids to interpolate
    phi: np.ndarray          # [S, 8] trilinear weights
    coords: np.ndarray       # [S, 3] domain coords


def setup_stations(mesh, params: Params) -> Optional[StationSet]:
    """read_stations_info + setup_stations_data (psolve.c:6447-6673):
    lat/lon -> domain coords via the surface-corner bilinear map, element
    search, local coords, phi weights."""
    if not params.number_output_stations or params.stations is None:
        return None
    lat = params.stations[:, 0]
    lon = params.stations[:, 1]
    depth = params.stations[:, 2]
    x, y = compute_domain_coords_linearinterp(
        lon, lat, params.domain_surface_corners[:, 0],
        params.domain_surface_corners[:, 1],
        params.region_length_east_m, params.region_length_north_m)
    found, eidx = locate_points(mesh, x, y, depth)
    keep = np.flatnonzero(found)
    if len(keep) == 0:
        return None
    eidx = eidx[keep]
    cx, cy, cz = local_coords(mesh, eidx, x[keep], y[keep], depth[keep])
    phi = ((1 + XI[0][None, :] * cx[:, None])
           * (1 + XI[1][None, :] * cy[:, None])
           * (1 + XI[2][None, :] * cz[:, None]) / 8.0)
    return StationSet(ids=keep.astype(np.int32),
                      nodes=mesh.elem_lnid[eidx],
                      phi=phi,
                      coords=np.stack([x[keep], y[keep], depth[keep]], 1))


def write_station_files(outdir, stations: StationSet, samples, dt,
                        print_rate=1, velocities=False):
    """Reference station text format (psolve.c:6636-6744): header line
    then time + displacement per step."""
    os.makedirs(outdir, exist_ok=True)
    T = samples.shape[0]
    for k, sid in enumerate(stations.ids):
        path = os.path.join(outdir, f"station.{int(sid)}")
        with open(path, "w") as f:
            f.write("#  Time(s)         X|(m)         Y-(m)         Z.(m)")
            for s in range(0, T, print_rate):
                t = dt * s
                f.write("\n%10.6f % 8e % 8e % 8e"
                        % (t, samples[s, k, 0], samples[s, k, 1],
                           samples[s, k, 2]))
            f.write("\n")


@dataclass
class Simulation:
    params: Params
    cvm: CVM
    mesh: object
    tables: object
    source: SourceModel
    src_ids: np.ndarray
    src_forces: np.ndarray
    stations: Optional[StationSet]

    @classmethod
    def setup(cls, physics_in, numerical_in=None, cvmdb=None,
              verbose=False):
        params = load_params(physics_in, numerical_in)
        rundir = os.path.dirname(os.path.dirname(
            os.path.abspath(physics_in))) or "."
        if cvmdb is None:
            cvmdb = params.cvmdb_input_file
            if cvmdb and not os.path.isabs(cvmdb):
                cvmdb = os.path.join(rundir, cvmdb)
        cvm = CVM(cvmdb)
        mesh = generate_mesh(params, cvm, verbose=verbose)
        if verbose:
            print(f"mesh: {mesh.lenum} elements, {mesh.nnum} nodes, "
                  f"{len(mesh.dn_ids)} dangling; "
                  f"critical dt {critical_dt(mesh.props, mesh.edge_m):.6f}")
        tables = assemble(mesh, params)
        source = SourceModel.parse(params)
        src_ids, src_forces = source.compute_forces(mesh, params)
        stations = setup_stations(mesh, params)
        return cls(params=params, cvm=cvm, mesh=mesh, tables=tables,
                   source=source, src_ids=src_ids, src_forces=src_forces,
                   stations=stations)

    def run(self, dtype=None, chunk=None, total_steps=None, on_chunk=None,
            solver="auto"):
        """solver: 'bricks' (block-structured TPU fast path),
        'unstructured' (reference-layout oracle), or 'auto' (bricks when
        the mesh decomposes cleanly, else unstructured)."""
        import jax
        import jax.numpy as jnp
        if dtype is None:
            dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
        p = self.params
        steps = total_steps if total_steps is not None else p.total_steps
        st = self.stations
        st_nodes = None if st is None else st.nodes
        st_phi = None if st is None else st.phi

        if solver in ("auto", "bricks"):
            try:
                from .solver.bricks import build_plan
                from .solver.brickstep import run_brick_solver
                plan = build_plan(self.mesh)
                return run_brick_solver(
                    plan, self.tables, self.src_ids, self.src_forces,
                    steps, p.delta_t, st_nodes=st_nodes, st_phi=st_phi,
                    dtype=dtype, chunk=chunk, on_chunk=on_chunk)
            except RuntimeError:
                if solver == "bricks":
                    raise
        state, samples = run_solver(
            self.tables, self.src_ids, self.src_forces, steps, p.delta_t,
            st_nodes=st_nodes, st_phi=st_phi,
            dtype=dtype, chunk=chunk, on_chunk=on_chunk)
        return state, samples
