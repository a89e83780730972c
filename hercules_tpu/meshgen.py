"""mesh_generate: the full meshing pipeline (psolve.c:1921-2176).

newtree -> [progressive] refine -> balance -> (carve buildings) ->
extract -> correct properties.  Single global host pass; partitioning
for multi-chip runs happens afterwards (hercules_tpu.parallel).
"""

from __future__ import annotations

import numpy as np

from .config import Params
from .cvm import CVM
from .material import (MeshOrigin, correct_properties, make_setrec,
                       make_toexpand)
from .mesh import Octree, extract_mesh
from .mesh.extract import MeshArrays


def generate_mesh(params: Params, cvm: CVM,
                  buildings=None, verbose=False) -> MeshArrays:
    from .utils.timers import GLOBAL_TIMERS as TM
    origin = MeshOrigin.from_params(params, cvm.ctl)
    with TM.measure("Octor Newtree"):
        tree = Octree.newtree(params.region_length_north_m,
                              params.region_length_east_m,
                              params.region_depth_deep_m)

    setrec = make_setrec(cvm, params, origin, buildings=buildings)
    toexpand = make_toexpand(params, buildings=buildings)

    # progressive meshing (psolve.c:2002-2090): refine towards the target
    # frequency in factor-of-2 steps to keep 2:1 ripple local
    steps = max(0, int(params.step_meshing))
    rec = None
    for mstep_pow in range(steps, -1, -1):
        mstep = 1 << mstep_pow
        scale = 1.0 / mstep

        if mstep == 1:
            te = toexpand
        else:
            def te(tree_, hi, lo, lv, rec_, _s=scale):
                return rec_["edgesize"] > rec_["Vs"] / (params.factor * _s)

        with TM.measure("Octor Refinetree"):
            rec = tree.refine(setrec, te)
        with TM.measure("Octor Balancetree"):
            tree.balance()
        if verbose:
            print(f"  meshing step x{mstep}: {tree.n} leaves")

    if buildings is not None:
        # octor_carvebuildings (octor.c:4817-4897): drop "air" leaves
        # (negative Vp) above the pushed-down surface
        with TM.measure("Carve Buildings"):
            rec = setrec(tree, tree.hi, tree.lo, tree.level)
            tree.carve(buildings.carve_mask(rec))
        if verbose:
            print(f"  carved to {tree.n} leaves")

    with TM.measure("Octor Extractmesh"):
        mesh = extract_mesh(tree)
    with TM.measure("Mesh correct properties"):
        correct_properties(mesh, cvm, params, origin, buildings=buildings)
    mesh.origin = origin
    mesh.buildings = buildings
    return mesh
