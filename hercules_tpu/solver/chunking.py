"""Chunked time-loop driver shared by the three solver paths.

Decouples the scan dispatch size from output cadence: instead of
shrinking the whole chunk to the gcd of the active output rates (which
degrades to one dispatch per step for simulation_output_rate = 1, the
reference default), the scan is nested -- an inner scan of
``snap_every`` steps inside an outer scan -- and the outer scan emits a
displacement snapshot per superstep.  One dispatch then covers many
taps, with device memory bounded by the snapshot stack.  This is the
TPU equivalent of the reference's IO-pool overlap
(io_planes.c:1145-1277): compute never stalls on output.

Checkpoint taps still need the full carry (BKT convolution state), so
chunk boundaries are additionally aligned to the checkpoint rate.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


def run_chunked(step, state, make_xs, total_steps, start_step=0,
                chunk=1000, on_chunk=None, on_snap=None,
                snap_every=None, consts=None, snap_of=None,
                on_samples=None):
    """Drive `step` over [start_step, total_steps).

    step: scan-able (carry, x) -> (carry, sample); with `consts`, the
        signature is (consts, carry, x) and the consts pytree is passed
        as a jit *argument* -- closure-captured device tables get
        inlined into the serialized HLO as literals, which breaks
        remote compilation for production-scale meshes (hundreds of MB)
    make_xs(s, k): xs pytree with leading dim k for steps [s, s+k)
    on_chunk(done, state): fires at every chunk boundary
    on_samples(s0, ys): consumes each chunk's per-step sample rows
        (steps [s0, s0+len)) as they land on host and returns what to
        accumulate — lets callers stream large sample streams (e.g.
        DRM part-1 records) to disk instead of holding them
    on_snap(done, (u, up)): fires every `snap_every` steps (host-side,
        with numpy copies of the first two carry slots)
    snap_of(carry): (u, up) views of a carry whose layout is not
        (u, up, ...) -- e.g. the packed-state kernel's (S,) carry

    Returns (state, samples [T, ...]).
    """
    if snap_of is None:
        snap_of = lambda carry: (carry[0], carry[1])
    if consts is not None:
        raw_step = step
        plain_scan = jax.jit(
            lambda c, s0, xs: jax.lax.scan(partial(raw_step, c), s0, xs))
    else:
        plain_scan = jax.jit(partial(jax.lax.scan, step))
    nested = None
    if snap_every:
        if consts is not None:
            def superstep(c, carry, xs):
                carry, samples = jax.lax.scan(partial(raw_step, c),
                                              carry, xs)
                return carry, (samples, snap_of(carry))

            nested = jax.jit(
                lambda c, s0, xs: jax.lax.scan(partial(superstep, c),
                                               s0, xs))
        else:
            def superstep(carry, xs):
                carry, samples = jax.lax.scan(step, carry, xs)
                return carry, (samples, snap_of(carry))

            nested = jax.jit(partial(jax.lax.scan, superstep))
        chunk = max(snap_every, chunk // snap_every * snap_every)

    outs = []
    s = start_step
    while s < total_steps:
        k = min(chunk, total_steps - s)
        use_nested = (nested is not None and k >= snap_every
                      and s % snap_every == 0)
        if use_nested:
            k = k // snap_every * snap_every
            xs = make_xs(s, k)
            K = k // snap_every
            xs = jax.tree.map(
                lambda a: a.reshape((K, snap_every) + a.shape[1:]), xs)
            state, (samples, snaps) = (
                nested(consts, state, xs) if consts is not None
                else nested(state, xs))
            samples = np.asarray(samples).reshape(
                (k,) + samples.shape[2:])
            if on_snap is not None:
                su = jax.tree.map(np.asarray, snaps[0])
                sp = jax.tree.map(np.asarray, snaps[1])
                for i in range(K):
                    on_snap(s + (i + 1) * snap_every,
                            (jax.tree.map(lambda a: a[i], su),
                             jax.tree.map(lambda a: a[i], sp)))
        else:
            xs = make_xs(s, k)
            state, samples = (plain_scan(consts, state, xs)
                              if consts is not None
                              else plain_scan(state, xs))
            samples = np.asarray(samples)
            if (on_snap is not None and snap_every
                    and (s + k) % snap_every == 0):
                su, sp = snap_of(state)
                on_snap(s + k, (jax.tree.map(np.asarray, su),
                                jax.tree.map(np.asarray, sp)))
        if on_samples is not None:
            samples = on_samples(s, samples)
        outs.append(samples)
        if on_chunk is not None:
            on_chunk(s + k, state)
        s += k
    samples = (np.concatenate(outs) if outs
               else np.zeros((0, 0, 3)))
    return state, samples
