"""HBM streaming-ceiling microbench for the solver's kernel shapes.

The fused step is a streaming kernel: its floor is set by how fast a
scan-carried pallas_call can move state through HBM, NOT by the chip's
nominal peak (v5e ~819 GB/s).  This probe measures the achievable
ceiling with the exact dataflow the solver uses:

  1. scan-carried jnp add      S' = S + C      (XLA, donated carry)
  2. trivial pallas stream     out[...] = a[...] + b[...], grid=(T,),
     block (8, 32768) -- the production kernel's tiling
  3. same with input_output_aliases (the scan-carry aliasing the
     solver's step gets)

Each case moves 2 reads + 1 write of an [8, LEN] f32 array per
iteration; GB/s = physical bytes / best wall time.  Measured on the
v5e (2026-08-17): scan add 520 GB/s, pallas 437 GB/s, pallas aliased
537 GB/s -- the number quoted as the "measured streaming ceiling" in
bench.py's roofline report and docs/PERF.md.

Usage: python tools/hbm_ceiling.py   (wants a real TPU)
"""

import sys
import time
from functools import partial

import numpy as np


def _best(fn, n=3):
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dtype = jnp.float32
    B = 32768
    T = 33
    LEN = T * B
    N = 50
    bytes_it = 3 * 8 * LEN * 4          # 2 reads + 1 write

    a = jnp.ones((8, LEN), dtype)
    b = jnp.ones((8, LEN), dtype)

    def report(label, dt):
        gbs = bytes_it * N / dt / 1e9
        print(f"[{label:18s}] {dt/N*1e3:.3f} ms/it  {gbs:.0f} GB/s")

    # 1. scan-carried add (the solver's chunked-scan shape)
    @jax.jit
    def scan_add(s, c):
        return jax.lax.scan(lambda x, _: (x + c, None), s,
                            None, length=N)[0]

    jax.block_until_ready(scan_add(a, b))
    report("scan add", _best(lambda: jax.block_until_ready(
        scan_add(a, b))))

    # 2/3. trivial pallas stream at the kernel's tiling
    def kern(x, y, o):
        o[...] = x[...] + y[...]

    for label, alias in (("pallas T=%d" % T, {}),
                         ("pallas aliased",
                          {"input_output_aliases": {0: 0}})):
        call = pl.pallas_call(
            kern, grid=(T,),
            in_specs=[pl.BlockSpec((8, B), lambda t: (0, t))] * 2,
            out_specs=pl.BlockSpec((8, B), lambda t: (0, t)),
            out_shape=jax.ShapeDtypeStruct((8, LEN), dtype), **alias)

        @jax.jit
        def loop(s, c, _call=call):
            return jax.lax.scan(lambda x, _: (_call(x, c), None), s,
                                None, length=N)[0]

        jax.block_until_ready(loop(a, b))
        report(label, _best(lambda: jax.block_until_ready(loop(a, b))))


if __name__ == "__main__":
    sys.exit(main())
