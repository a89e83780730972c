"""Back-to-back A/B timing of solver-path env configs in ONE process
(the tunneled TPU's run-to-run variance swamps cross-process
comparisons).  Builds the 1M-element bench problem once, then for each
config re-traces the packed step and times it.

Usage: python hercules_tpu/tools/perf_ab.py <damping> <steps> KEY=V[,KEY=V...] [...]
e.g.:  python hercules_tpu/tools/perf_ab.py bkt 400 HT_BKT_NOHALO=0 HT_BKT_NOHALO=1
"""
import os
import sys
import time

import numpy as np


def main():
    damping = sys.argv[1]
    steps = int(sys.argv[2])
    configs = sys.argv[3:]
    os.environ.setdefault("BENCH_DAMPING", damping)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from bench import build

    import jax
    import jax.numpy as jnp
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.solver.pallas_brick import (PallasBrickTables,
                                                  init_packed_state,
                                                  make_packed_pallas_step)

    p, mesh, tables, t_mesh, t_asm = build(
        1_000_000, damping if damping != "elastic" else "rayleigh")
    plan = build_plan(mesh)
    print(f"# problem built: {mesh.lenum} elems "
          f"(mesh {t_mesh:.1f}s asm {t_asm:.1f}s)", flush=True)
    E = mesh.lenum

    results = {}
    for rep in range(2):
        for cfg in configs:
            kvs = [kv for kv in cfg.split(",") if kv]
            saved = {}
            for kv in kvs:
                k, v = kv.split("=", 1)
                saved[k] = os.environ.get(k)
                os.environ[k] = v
            try:
                pt = PallasBrickTables(plan, tables,
                                       dtype=jnp.float32)
                step, consts = make_packed_pallas_step(pt)
                state = init_packed_state(pt)
                L = 2
                srcf = jnp.zeros((steps, L, 3), jnp.float32)

                def chunk(carry):
                    def body(c, x):
                        out, _ = step(consts, c, x)
                        return out, ()
                    out, _ = jax.lax.scan(
                        body, carry, (srcf, jnp.arange(steps)))
                    return out

                run = jax.jit(chunk)
                state = run(state)          # compile + warm
                jax.block_until_ready(state)
                t0 = time.time()
                state = run(state)
                jax.block_until_ready(state)
                dt = time.time() - t0
                us = dt / steps * 1e6
                eups = E * steps / dt
                print(f"[{rep}] {cfg or '(default)'}: "
                      f"{us:.0f} us/step  {eups:.3e} eups", flush=True)
                results.setdefault(cfg, []).append(eups)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    print("# best-of-2:")
    for cfg, vals in results.items():
        print(f"#   {cfg or '(default)'}: {max(vals):.3e} eups")


if __name__ == "__main__":
    main()
