"""Resident-kernel timing on the 1M bench fixture (real chip)."""
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from bench import build

import jax
import jax.numpy as jnp
from hercules_tpu.solver.bricks import build_plan
from hercules_tpu.solver.pallas_brick import (PallasBrickTables,
                                              build_resident_call,
                                              init_packed_state,
                                              resident_vmem_bytes)

CH = int(sys.argv[1]) if len(sys.argv) > 1 else 400
p, mesh, tables, t_mesh, t_asm = build(1_000_000, "rayleigh")
plan = build_plan(mesh)
pt = PallasBrickTables(plan, tables, dtype=jnp.float32)
E = mesh.lenum
print(f"# {E} elems, LEN {pt.LEN}, vmem est "
      f"{resident_vmem_bytes(pt.LEN, pt.o7)/2**20:.0f} MB", flush=True)
adv = jax.jit(build_resident_call(
    pt.offs, pt.B, pt.o7, pt.T, pt.LEN, pt.f1e, pt.f2e,
    jnp.float32, CH, tier=pt.tier, kco=pt.kco))
S = init_packed_state(pt)[0]
K = jnp.concatenate([pt.cm, pt.mm, pt.invm,
                     jnp.zeros((1, pt.LEN), jnp.float32)], axis=0)
sf = jnp.zeros((CH, 8, 128), jnp.float32)
t0 = time.time()
S, smp = adv(S, K, pt.dd, sf)
jax.block_until_ready(S)
print(f"# compile+first {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    S, smp = adv(S, K, pt.dd, sf)
    jax.block_until_ready(S)
    dt = time.time() - t0
    print(f"# {CH} steps in {dt:.3f}s -> {E*CH/dt:.3e} eups "
          f"({dt/CH*1e6:.0f} us/step)", flush=True)
