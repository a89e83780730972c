"""Fused Pallas TPU kernel for the single-brick (uniform mesh) solver
step: one pass over HBM per step instead of the XLA brick path's many
materialized [24, S] intermediates.

The whole central-difference update

  ue[24]   8 shifted reads of the node field
  f[24]    spectral stencil: 8-point Hadamard butterflies + ~60 sparse
           multiply-adds (physics/kmats.py:spectral_factors) -- the
           same Walsh factorization the reference's "effective"
           stiffness method exploits (stiffness.c:245-424), here used
           to keep the element kernel on the VPU instead of a
           lane-padded [24,48] MXU matmul
  force    24 shifted adds onto the node grid
  u_next   (force + mass2_minusaM*u - mass_minusaM*up) * inv_mass

runs per 1-D tile of B elements in VMEM.  Element tile t produces the
complete forces for nodes [tB, tB+B): contributions from elements of
earlier tiles arrive through an O(plane) "tail" scratch carried across
the (sequential) TPU grid.  Per step the kernel streams u, up (twice,
for the one-tile halo), c1..c4, the mass arrays and writes u_next --
~100 MB at 1M elements, vs the several-hundred-MB XLA dataflow.

Source injection and station sampling stay in XLA outside the kernel
(the update is linear in the force, so adding srcf * inv_mass at the
few source nodes after the kernel is exact).

Scope: a single uniform brick (no hanging nodes, no reconciliation
groups).  Damping: rayleigh/mass/none via build_call, and full BKT
convolutional viscoelasticity via build_bkt_call (damping.c:110-416
semantics with on-chip memory-variable recursion).  Graded meshes use
the multi-brick mesh kernel (pallas_mesh.py), the XLA brick path, or
the unstructured path.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.kmats import (hadamard8_stages, spectral_factors,
                             stiffness_matrices_24)

# row order of the packed BKT coefficient table streamed to the kernel
BK_ROWS = ("shear_c1", "shear_c2", "shear_c3", "shear_c4",
           "shear_e0", "shear_e1", "a0_shear", "a1_shear", "shear_coef",
           "kappa_c1", "kappa_c2", "kappa_c3", "kappa_c4",
           "kappa_e0", "kappa_e1", "a0_kappa", "a1_kappa", "kappa_coef",
           "mu_f", "kappa_f")
# shear-only (infinite Qk) runs never touch the 9 kappa recursion rows;
# dropping them from the stream saves ~10% of the BKT kernel's HBM
# traffic (the kernel is bandwidth-bound)
BK_ROWS_SHEAR = BK_ROWS[:9] + BK_ROWS[18:]


def bk_row_names(shear_only: bool):
    return BK_ROWS_SHEAR if shear_only else BK_ROWS


def diag_dd(f1e, f2e, dtype=None):
    """[48, 1] stacked diagonal coefficients of the two spectral
    stiffness operators (minus folded in) -- the dd table every kernel
    call streams."""
    dd = np.zeros((48, 1))
    for base, ent in ((0, f1e), (24, f2e)):
        for mo, co, mi, ci, k in ent:
            if (mo, co) == (mi, ci):
                dd[base + 3 * mo + co, 0] = -k
    return dd if dtype is None else jnp.asarray(dd, dtype)


def _butterfly(slabs):
    """In-kernel unnormalized 8-point Hadamard over the corner index of
    8 [3, B] slabs (matches kmats.hadamard8_matrix)."""
    for stage in hadamard8_stages():
        new = [None] * 8
        for j, pj in stage:
            new[j] = slabs[j] + slabs[pj] if j < pj else slabs[pj] - slabs[j]
        slabs = new
    return slabs


def _mxu_mode(default="b3"):
    """Per-kernel MXU precision default, overridable by HT_MXU_PREC.

    Elastic kernels default to "b3": manual split-bf16 3-pass matmul
    (_mxu_dot) — ~2^-17 relative force error (golden 20k-step
    seismogram error 5.9e-4 vs 1.17e-4 at exact f32, budget 1e-2),
    ~12% faster steps than XLA's bf16x6.  The BKT kernels default to
    "highest": their [48, C] operand doubles the split overhead and b3
    measures ~2x SLOWER there.  HT_MXU_PREC=highest restores exact f32
    everywhere; f64 (validation) runs always take the precise path."""
    return os.environ.get("HT_MXU_PREC", default)


def _bf16_gather_mode(tier, dtype, mxu_mode):
    """Stage the b3/b4 split-bf16 operand halves per TILE instead of
    splitting per chunk: the staged scratch holds (Wh; Wl) bf16 rows,
    gathers/rolls move the same bytes as the f32 W they replace, and
    the per-chunk convert+sub+convert (the bulk of the split-matmul's
    vector time) disappears.  Bit-identical to the per-chunk split
    (same Wh/Wl values).  f32 + staged tiers only.

    DEFAULT ON (measured 2.16e9 vs 1.99e9 eups with the per-chunk
    split at HT_PALLAS_CHUNK=16384).  Mosaic still crashes lowering
    pltpu.roll on bf16 operands directly; the kernel's roll helper
    routes even-row bf16 blocks through an f32 bitcast view (the
    16-bit layout packs sublane pairs into 32-bit register rows, so
    lane shifts never mix values — probe-verified bit-exact on v5e).
    HT_PALLAS_BF16GATHER=0 restores the per-chunk split."""
    import os
    return (tier in ("ubeta", "umat") and dtype == jnp.float32
            and mxu_mode in ("b3", "b4")
            and os.environ.get("HT_PALLAS_BF16GATHER", "1") == "1")


def _stackk() -> bool:
    """Issue the split-bf16 cross terms as ONE K-stacked MXU dot
    ([Ah Ah Al] @ [Wh; Wl; Wh]) instead of 3-4 separate dots + f32
    adds: the systolic array streams C columns once per <=128-wide K,
    so stacking K 24 -> 72/96 is free and drops the extra passes and
    the result additions (same partial products, f32 MXU accumulate).
    HT_MXU_STACKK=0 restores the separate-dot form (measurement)."""
    return os.environ.get("HT_MXU_STACKK", "1") != "0"


def _split_dot(Ah, Al, Wh, Wl, mode):
    """The b3/b4 term sum from pre-split bf16 halves."""
    bd = lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if _stackk():
        parts = [Ah, Ah, Al], [Wh, Wl, Wh]
        if mode == "b4":
            parts[0].append(Al)
            parts[1].append(Wl)
        return bd(jnp.concatenate(parts[0], axis=1),
                  jnp.concatenate(parts[1], axis=0))
    F = bd(Ah, Wh) + bd(Ah, Wl) + bd(Al, Wh)
    if mode == "b4":
        F = F + bd(Al, Wl)
    return F


def _mxu_dot_presplit(A, Wh, Wl, mode):
    """Split-bf16 matmul with the W halves already staged (see
    _bf16_gather_mode); A is the f32 constant operator."""
    Ah = A.astype(jnp.bfloat16)
    Al = (A - Ah.astype(A.dtype)).astype(jnp.bfloat16)
    return _split_dot(Ah, Al, Wh, Wl, mode)


def _mxu_dot(A, W, mode, prec):
    """Constant-operator matmul on the MXU.

    mode "b3"/"b4": manual split-bf16 passes, each at single-pass MXU
    speed — A and W split into bf16 hi+lo parts, cross terms summed in
    f32.  b3 = Ah·Wh + Ah·Wl + Al·Wh drops the lo·lo term (~2^-17
    relative force error); b4 keeps it (~2^-20).  XLA's own HIGHEST
    (bf16x6) is the exact-f32 reference; Precision.HIGH lowers
    catastrophically under Mosaic (measured 7x slower than HIGHEST) —
    use b3 instead.  f64 runs (validation) always take the precise
    path."""
    if mode not in ("b3", "b4") or A.dtype == jnp.float64:
        return jax.lax.dot(A, W, precision=prec)
    Ah = A.astype(jnp.bfloat16)
    Al = (A - Ah.astype(A.dtype)).astype(jnp.bfloat16)
    Wh = W.astype(jnp.bfloat16)
    Wl = (W - Wh.astype(W.dtype)).astype(jnp.bfloat16)
    return _split_dot(Ah, Al, Wh, Wl, mode)


def _modes(tier, dtype, packed):
    """Shared dataflow-mode predicate for _make_kernel and the
    builders (the scratch shapes must mirror the kernel's choices).
    packed = the corner-major [24, C] dataflow flag (_kernel_mode)."""
    staged = packed and tier in ("ubeta", "umat")
    mxu_mode = _mxu_mode()
    preshift = (staged
                and os.environ.get("HT_PALLAS_PRESHIFT", "0") == "1")
    gather_concat = (os.environ.get("HT_PALLAS_GATHER", "concat")
                     == "concat")
    ablate = os.environ.get("HT_PALLAS_ABLATE", "")
    bf16g = (staged and not preshift and gather_concat
             and _use_mxu() and not ablate
             and _bf16_gather_mode(tier, dtype, mxu_mode))
    # 8-row-aligned gather dataflow (default ON): stage W as 8-row
    # bf16 blocks (Wh 0:3, Wl 3:6, zero pad 6:8) so the per-chunk
    # class concats and the MXU operand assembly touch only 8-row
    # vreg-aligned pieces — the misaligned 3-row concat relayouts
    # that dominate the gather time (~220 us of a 509 us step at the
    # 1M bench, HT_PALLAS_ABLATE attribution) disappear.  The MXU
    # consumes X = [X8; X8] (K = 128, one systolic pass) against a
    # column-matched constant carrying (Ah, Ah) then (Al, Al): the
    # full b4 split product at single-pass cost (_align8_operator).
    align8 = (bf16g
              and os.environ.get("HT_PALLAS_ALIGN8", "1") == "1")
    # 8-row-aligned scatter (requires align8): the MXU constant's
    # output rows are permuted into 8-row-per-corner slots
    # (_align8_operator out8) so the scatter rolls whole aligned
    # class blocks — no relayouts; invalid-element masking moves to
    # the bf16 operand (umat)
    # align8 + tile-wide class pre-rolls (default ON): roll the whole
    # staged [8, L] block once per shift class into scr_sv, so every
    # per-chunk gather is a pure aligned slice with zero rolls
    # (measured 394 -> 367 us/step at the 1M bench)
    pre8 = (align8
            and os.environ.get("HT_PALLAS_PRESHIFT8", "1") == "1")
    # aligned slot scatter: default follows pre8 (with the gather
    # rolls gone it wins ~4%: 330 vs 347 us/step at the 1M bench;
    # WITHOUT pre8 the 64 slot rows roll 2.7x the volume and it
    # measures ~5% slower, so it defaults off there)
    s8 = (align8
          and os.environ.get("HT_PALLAS_SCATTER", "val") == "val"
          and os.environ.get("HT_PALLAS_SCATTER8",
                             "1" if pre8 else "0") == "1")
    return {"staged": staged, "preshift": preshift, "bf16g": bf16g,
            "align8": align8, "s8": s8, "pre8": pre8}


def _align8_blocks(offs):
    """Trace-time layout of the align8 gather operand: class blocks in
    ascending lane-shift order; within a class, corners ascending.
    Returns [(shift, [bases], [corner js])]; the operand row block at
    position p (8 rows each) holds corner js-flattened[p]'s (Wh; Wl;
    pad) and _align8_operator permutes the constant's columns to
    match."""
    classes = {}
    for j, o in enumerate(offs):
        classes.setdefault(o % 128, []).append(j)
    out = []
    for s in sorted(classes):
        js = classes[s]
        out.append((s, [offs[j] - s for j in js], js))
    return out


def _align8_operator(am_np, offs, out8=False):
    """[M, 128] bf16 MXU constant for the align8 gather (see _modes):
    block position p covers X rows 8p+(0:3) = Wh and 8p+(3:6) = Wl of
    its corner, duplicated at rows 64+8p+... by the [X8; X8] stack;
    columns 0:64 carry (Ah, Ah) and 64:128 carry (Al, Al), so one
    K=128 dot yields Ah*Wh + Ah*Wl + Al*Wh + Al*Wl — the b4 split
    product (~2^-20 relative force error, tighter than the b3
    default it replaces) in a single MXU pass.

    out8: additionally permute the OUTPUT rows into 8-row-per-corner
    slots in the same class-block order (row 8p+c = force comp c of
    block position p's corner, rows 8p+3:8p+8 zero), each 24-row
    operator group expanding to 64 rows.  The scatter then rolls whole
    aligned class blocks and every per-corner extraction lands at
    sublane offset 0 — no relayouts (see the s8 scatter in
    _make_kernel)."""
    import ml_dtypes
    A = np.asarray(am_np, np.float32)
    if out8:
        ng = A.shape[0] // 24
        P = np.zeros((64 * ng, A.shape[0]), np.float32)
        p = 0
        for s, bases, js in _align8_blocks(offs):
            for j in js:
                for g in range(ng):
                    for c in range(3):
                        P[64 * g + 8 * p + c, 24 * g + 3 * j + c] = 1.0
                p += 1
        A = P @ A
    Ah = A.astype(ml_dtypes.bfloat16)
    Al = (A - Ah.astype(np.float32)).astype(ml_dtypes.bfloat16)
    out = np.zeros((A.shape[0], 128), ml_dtypes.bfloat16)
    p = 0
    for s, bases, js in _align8_blocks(offs):
        for j in js:
            for (half, base) in ((Ah, 0), (Al, 64)):
                out[:, base + 8 * p:base + 8 * p + 3] = \
                    half[:, 3 * j:3 * j + 3]
                out[:, base + 8 * p + 3:base + 8 * p + 6] = \
                    half[:, 3 * j:3 * j + 3]
            p += 1
    return out


def _align8_operator_cols(A, offs, fields=2):
    """Column-permute a [M, 24*fields] constant to the 8-row
    class-block operand layout: block position p (corner jp) supplies
    operand rows 8p+3f+(0:3) = field f's gathered window, so columns
    8p+3f+(0:3) take A[:, 24f+3jp+(0:3)]; pad columns stay zero."""
    A = np.asarray(A, np.float64)
    out = np.zeros((A.shape[0], 64))
    p = 0
    for s, bases, js in _align8_blocks(offs):
        for j in js:
            for fx in range(fields):
                out[:, 8 * p + 3 * fx:8 * p + 3 * fx + 3] = \
                    A[:, 24 * fx + 3 * j:24 * fx + 3 * j + 3]
            p += 1
    return out


def _align8_operator_rows(A, offs):
    """Row-permute a [24*G, N] constant into 8-row-per-corner output
    slots in class-block order (the s8 scatter layout): group g's
    corner-jp rows land at 64g + 8p + (0:3)."""
    A = np.asarray(A, np.float64)
    ng = A.shape[0] // 24
    out = np.zeros((64 * ng, A.shape[1]))
    p = 0
    for s, bases, js in _align8_blocks(offs):
        for j in js:
            for g in range(ng):
                out[64 * g + 8 * p:64 * g + 8 * p + 3] = \
                    A[24 * g + 3 * j:24 * g + 3 * j + 3]
            p += 1
    return out


def _gather_blocks8(load, offs, c0, C, W0, roll, blocks, pre=None,
                    pre_ref=None):
    """Aligned class-block gather: load(start) -> [8, W0] rows of the
    staged field pair; whole class blocks roll once; returns the
    [64, C] operand in _align8_blocks order (zero relayouts).  pre:
    optional dict shift -> first row of that class's tile-pre-rolled
    block in the pre_ref scratch (the pre8 mode) — every block then
    reads as one aligned slice."""
    out = []
    for s, bases, js in blocks:
        if s == 0:
            for b in bases:
                out.append(load(c0 + b)[:, :C])
            continue
        if pre is not None:
            k0 = pre[s]
            for b in bases:
                out.append(pre_ref[k0:k0 + 8, pl.ds(c0 + b, C)])
            continue
        parts = [load(c0 + b) for b in bases]
        g = (parts[0] if len(parts) == 1
             else jnp.concatenate(parts, axis=0))
        out.append(roll(g, W0 - s)[:, :C])
    return jnp.concatenate(out, axis=0)


def _slot_scatter8(nf, F, blocks, roll, offs, c0, W0, dtype):
    """s8 scatter of a [64, C] slot-layout force block: roll whole
    aligned class blocks, extract each corner at sublane offset 0,
    merge per scatter base (_merged_scatter)."""
    Fv8 = jnp.concatenate([F, jnp.zeros((64, 128), dtype)], axis=1)
    rows = {}
    p0 = 0
    for s, bases, js in blocks:
        blk = Fv8[8 * p0:8 * (p0 + len(js))]
        if s:
            blk = roll(blk, s)
        for i, j in enumerate(js):
            rows[j] = blk[8 * i:8 * i + 3]
        p0 += len(js)
    _merged_scatter(nf, rows, offs, c0, W0)


def _gather_windows(load, offs, c0, W0, roll):
    """Per-corner rolled gather windows, minimizing vector work:

    - one region load per distinct 128-aligned base (x-neighbor
      corners share a base and differ only in lane shift),
    - one lane-roll per shift class, over the CONCAT of that class's
      regions (a roll of [3, W] pads to 8 sublanes anyway, so rolling
      [9, W] for three corners costs ~half of three separate rolls).

    load(start) -> [nr, W0] region at 128-aligned lane offset start.
    Returns the per-corner list of [nr, W0] windows (entries shared
    when corners alias the same (base, shift))."""
    bases = sorted({o - o % 128 for o in offs})
    gv = {b: load(c0 + b) for b in bases}
    nr = None
    by_s = {}
    order = []
    for o in offs:
        s = o % 128
        key = (o - s, s)
        order.append(key)
        if key not in by_s.setdefault(s, {}):
            by_s[s][key] = None
    out = {}
    for s, kv in by_s.items():
        ks = list(kv)
        if s == 0:
            for b, _ in ks:
                out[(b, 0)] = gv[b]
            continue
        parts = [gv[b] for b, _ in ks]
        g = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                             axis=0)
        nr = parts[0].shape[0]
        r = roll(g, W0 - s)
        for i, k in enumerate(ks):
            out[k] = r[nr * i:nr * i + nr]
    return [out[k] for k in order]


def _class_rolled_rows(Fv, offs, roll):
    """Per-corner [3, W] force rows shifted to their 128-aligned
    scatter base: one lane-roll per shift class, rolling only the
    concat of that class's rows."""
    classes = {}
    for j, o in enumerate(offs):
        classes.setdefault(o % 128, []).append(j)
    rows = {}
    for s, js in classes.items():
        if s == 0:
            for j in js:
                rows[j] = Fv[3 * j:3 * j + 3]
            continue
        sel = (Fv[3 * js[0]:3 * js[0] + 3] if len(js) == 1
               else jnp.concatenate([Fv[3 * j:3 * j + 3] for j in js],
                                    axis=0))
        Rv = roll(sel, s)
        for i, j in enumerate(js):
            rows[j] = Rv[3 * i:3 * i + 3]
    return rows


def _merged_scatter(nf, rows, offs, c0, W0):
    """Accumulate the shifted per-corner force rows into nf with ONE
    read-modify-write per distinct 128-aligned target: x-neighbor
    corner pairs (offsets o, o+1) share a target base, so their rows
    sum in registers first — half the nf VMEM traffic of per-corner
    adds.  c0 may be a tracer (dynamic chunk grids)."""
    contrib = {}
    for j, o in enumerate(offs):
        contrib.setdefault(o - o % 128, []).append(rows[j])
    for b, rs in contrib.items():
        acc = rs[0]
        for r in rs[1:]:
            acc = acc + r
        idx = pl.ds(c0 + b, W0)
        nf[:, idx] = nf[:, idx] + acc


def pallas_fits(offs) -> bool:
    """The fused kernel's tile+halo design needs the stencil reach
    (o7 = one xy node plane) to fit a VMEM tile: o7 + 129 <= 32768.
    Bricks with larger planes (e.g. terashake's 961x481) fall back to
    the XLA brick path."""
    return offs[7] + 129 <= int(os.environ.get("HT_PALLAS_TILE", 32768))


def plan_applies(plan, damping) -> bool:
    """True if the single-brick fused kernel covers this brick plan."""
    return (len(plan.bricks) == 1
            and len(plan.loose_eidx) == 0
            and len(plan.grp_node) == 0
            and damping in ("rayleigh", "mass", "none", "bkt")
            and pallas_fits(plan.bricks[0].corner_offsets()))


def _bf24_stage(U, k):
    """One butterfly stage j -> j^bit_k on a [24, C] corner-major
    array, as a concat of contiguous block sums/differences (no
    gathers, no captured sign constants)."""
    w = 3 << k                         # rows per half-block
    parts = []
    for a in range(0, 24, 2 * w):
        lo, hi = U[a:a + w], U[a + w:a + 2 * w]
        parts.append(lo + hi)          # j < j^bit: old[j] + old[pj]
        parts.append(lo - hi)          # j > j^bit: old[pj] - old[j]
    return jnp.concatenate(parts, axis=0)


def _halo_block(B, o7):
    """Lane width of the +1-tile halo operand: the smallest power-of-2
    divisor of B that covers the stencil reach o7 + 129.  The halo
    operand only needs the first o7 + 128 columns of the next tile;
    streaming a full (rows, B) block doubles the state read traffic
    for nothing (~17 MB/step at the 1M-element bench shape)."""
    hb = 128
    while hb < o7 + 129:
        hb *= 2
    assert B % hb == 0 or hb >= B
    return min(hb, B)


def _elastic_nohalo() -> bool:
    """Delay-by-one pipelined dataflow for the packed elastic kernel
    (HT_PALLAS_NOHALO; see the BKT _bkt_nohalo twin): the next-tile
    halo reads the block currently streaming in instead of a separate
    halo operand, removing 36.7 of 146.8 MB/step (25%) of traffic at
    the 1M bench shape (o7+129 = 16900 rounds the halo block up to a
    FULL tile).  Default OFF: the one-process A/B measured 283
    us/step legacy vs 287-297 nohalo — the legacy layout fully
    overlaps compute under its larger DMA stream, while the
    delay-by-one structure exposes ~80 us of compute/copies, netting
    slightly negative for the DMA-bound elastic kernel.  Kept as an
    opt-in ablation; the VMEM-resident loop is the byte-cut that
    actually pays (run_resident)."""
    return os.environ.get("HT_PALLAS_NOHALO", "0") == "1"


def _use_mxu() -> bool:
    """Route the 24x24 element operator through the MXU (one
    [48,24]@[24,C] constant matmul) instead of the VPU butterfly +
    sparse path.  The kernel is VPU-bound with the MXU idle, so this
    removes ~60% of the vector work per chunk; precision=HIGHEST keeps
    f32 accuracy (bf16x6 passes)."""
    return os.environ.get("HT_PALLAS_MXU", "1") != "0"


def _kernel_mode(B, chunk=None):
    """(C, packed) sub-chunk width and dataflow mode.

    Elastic default 8192 (4 sub-chunks per 32768 tile): with the
    align8+pre8 dataflow the chunk size barely matters (8k/16k within
    1%); 8192 keeps Mosaic compiles fast and VMEM headroom wide.  The BKT
    kernels keep their own 4096 default — their conv streams raise
    the per-chunk VMEM footprint."""
    import os
    if chunk is None:
        chunk = int(os.environ.get("HT_PALLAS_CHUNK", 8192))
    packed = os.environ.get("HT_PALLAS_PACKED", "1") != "0"
    C = min(chunk, B)
    # user-set HT_PALLAS_TILE widths need not be a multiple of the
    # chunk default: shrink to the largest divisor of B <= C instead
    # of asserting (B is a multiple of 8*128 by construction)
    while B % C != 0:
        C = math.gcd(B, C)
    return C, packed


def detect_tier(c1, c2, beta, valid):
    """Kernel specialization tier from the element coefficient rows.

    The kernel is VPU-bound (DMA fully overlaps), so the wins come from
    cutting vector work, not bytes:

    - "ubeta": beta = c3/c1 = b*dt is one global scalar (compute_setab's
      Rayleigh b is global, psolve.c:5813-5876; "mass"/"none" have
      beta = 0), so the damping fold W = u + beta*(u - up) is staged
      once per tile into VMEM and every corner gather rolls a [3, W]
      window instead of [6, W] -- half the roll volume.
    - "umat": additionally c1, c2 are brick-constant (homogeneous
      material region), so they fold into the spectral coefficients at
      trace time; the streamed c1 row only supplies the element
      validity mask.
    Env cap: HT_PALLAS_TIER=general|ubeta|umat caps the auto tier (it
    can only downgrade -- an unsound force would corrupt results)."""
    import os
    if not np.any(valid):
        return "general"
    c1v, c2v, btv = c1[valid], c2[valid], beta[valid]
    if np.ptp(btv) != 0.0:
        tier = "general"
    elif np.ptp(c1v) == 0.0 and np.ptp(c2v) == 0.0 and c1v[0] != 0.0:
        tier = "umat"
    else:
        tier = "ubeta"
    rank = {"general": 0, "ubeta": 1, "umat": 2}
    cap = os.environ.get("HT_PALLAS_TIER", "")
    if cap in rank and rank[cap] < rank[tier]:
        tier = cap
    return tier


def _make_kernel(offs, B, o7, T, f1e, f2e, dtype, chunk=None,
                 interpret=False, tier="general", kco=None,
                 packed_state=False):
    """packed_state: the [8, LEN] state/const layout (build_call_packed)
    — TPU HBM stores rank-2 f32 arrays in (8, 128) tiles, so the legacy
    separate (3, LEN) u/up/cm/mm and (1, LEN) invm streams each move
    8 physical rows for 3 (or 1) useful ones.  Packing u+up into one
    8-row state array and c1,c2,beta,mm,invm into one 8-row const
    array exactly halves the physical HBM traffic per step."""
    C, packed = _kernel_mode(B, chunk)
    W0 = C + 128                        # gather region width
    # lane-shift classes: o mod 128 (= corner popcount when the brick's
    # x/y/z node strides are all == 1 mod 128, the usual case)
    NR = sorted({o % 128 for o in offs} - {0})
    # corners grouped by shift class (the scatter rolls only the rows
    # of each class instead of the whole 24-row force block)
    CLASSES = {}
    for j, o in enumerate(offs):
        CLASSES.setdefault(o % 128, []).append(j)
    modes = _modes(tier, dtype, packed)
    staged = modes["staged"]
    # measured ~10% slower than per-chunk rolls on v5e (the
    # tile-wide roll + scratch round-trip outweighs the saved
    # per-chunk rolls); kept as an experiment flag
    preshift = modes["preshift"]
    if tier == "umat":
        c1s, c2s, beta_s = kco
        if c1s == 0.0:                  # degenerate: no fold possible
            tier, staged = "ubeta", packed
    if staged:
        beta_s = kco[2]

    def roll(x, shift):
        if interpret:                   # pltpu.roll is mosaic-only
            return jnp.roll(x, shift, axis=1)
        if x.dtype == jnp.bfloat16:
            # Mosaic crashes lowering pltpu.roll on bf16 operands;
            # the TPU 16-bit layout packs sublane pairs into 32-bit
            # register rows, so an even-row bf16 block rolls for free
            # through an f32 bitcast view (lane shifts never mix
            # sublanes) — and at HALF the f32 roll volume
            assert x.shape[0] % 2 == 0
            v = pltpu.bitcast(x, jnp.float32)
            return pltpu.bitcast(pltpu.roll(v, jnp.int32(shift), 1),
                                 jnp.bfloat16)
        return pltpu.roll(x, jnp.int32(shift), 1)

    # packed-mode constant tables: diagonal coefficient vectors and
    # row-level off-diagonal entries (row = 3*m + c), minus folded in
    off1, off2 = [], []
    for ent, off in ((f1e, off1), (f2e, off2)):
        for mo, co, mi, ci, k in ent:
            ro, ri = 3 * mo + co, 3 * mi + ci
            if ro != ri:
                off.append((ro, ri, -k))
    if tier == "umat":
        # fold the uniform c1/c2 into the sparse coefficients
        offu = ([(ro, ri, k * c1s) for ro, ri, k in off1]
                + [(ro, ri, k * c2s) for ro, ri, k in off2])

    # MXU path: the element force is F = c1*(A1 @ W) + c2*(A2 @ W)
    # with A_i = -M_i the node-major stiffness operators (column
    # scaling by the per-element c1/c2 commutes with the row-mixing
    # matmul), so the whole butterfly + diag + sparse VPU pipeline
    # collapses into one constant [48,24] @ [24,C] MXU matmul (umat:
    # a single folded [24,24] in rows 0:24).  The matrix is streamed
    # as a tiny (48, 24) operand (Pallas kernels cannot capture array
    # constants).
    use_mxu = _use_mxu() and packed
    # perf ablations (measurement only — WRONG PHYSICS): "stream"
    # skips the element pass (pure state/const streaming + node
    # update), "nogather"/"noroll" skip/unshift the corner gather,
    # "noop" skips the element operator, "noscatter" collapses the
    # class-rolled scatter to one aligned add.  Used to attribute
    # kernel time (see bench.py roofline notes).
    ablate = os.environ.get("HT_PALLAS_ABLATE", "")
    # dataflow modes (bench ablations: the scr_w / scr_f VMEM
    # round-trips are ~2/3 of the kernel's non-DMA time): by default
    # the MXU operand is built as a register concat of the rolled
    # windows and the force block is padded/rolled as values — no
    # VMEM staging.  HT_PALLAS_GATHER/SCATTER=scratch restores the
    # scratch-staged path (also the non-MXU fallback).
    gather_mode = os.environ.get("HT_PALLAS_GATHER", "concat")
    gather_concat = gather_mode == "concat"
    # value-scatter needs the dot result's canonical layout — the VPU
    # butterfly output is offset-mismatched and must stage through
    # scr_f (Mosaic rejects its pad-concat), so gate on the MXU path
    # exactly like the concat gather
    scatter_mode = os.environ.get("HT_PALLAS_SCATTER", "val")
    scatter_val = use_mxu and scatter_mode == "val"
    # experiment modes (bench-only): direct misaligned dynamic slices
    # instead of roll-to-aligned — measures Mosaic's relayout cost
    # against the class-batched rolls
    scatter_dslice = scatter_mode == "dslice"
    gather_dslice = gather_mode == "dslice"
    # elastic MXU precision (HT_MXU_PREC): "highest" = XLA bf16x6
    # (exact f32), "b3"/"b4" = manual split-bf16 passes (_mxu_dot),
    # "default" single-pass bf16 trades ~3 decimal digits for MXU time
    mxu_mode = _mxu_mode()
    mxu_prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH}.get(
        mxu_mode, jax.lax.Precision.DEFAULT)
    # staged-bf16 gather: Wh/Wl split once per tile (see
    # _bf16_gather_mode); must agree with the builders' scratch dtype
    bf16g = modes["bf16g"] and use_mxu
    # 8-row-aligned gather + K=128 b4 MXU operand (see _modes)
    align8 = modes["align8"] and use_mxu
    s8 = modes["s8"] and use_mxu
    pre8 = modes["pre8"] and use_mxu
    A8B = _align8_blocks(offs) if align8 else None
    M1d, M2d = stiffness_matrices_24()
    if tier == "umat":
        am_np = np.zeros((48, 24))
        am_np[:24] = -(c1s * M1d + c2s * M2d)
    else:
        am_np = np.concatenate([-M1d, -M2d])
    if align8:
        # the streamed constant IS the column-permuted bf16 split pair
        am_dev = jnp.asarray(
            _align8_operator(am_np[:24] if tier == "umat" else am_np,
                             offs, out8=s8), jnp.bfloat16)
    else:
        am_dev = jnp.asarray(am_np, dtype)

    def bf24(U):
        for k in range(3):
            U = _bf24_stage(U, k)
        return U

    nohalo = (packed_state and _elastic_nohalo()
              and o7 + 128 <= B)

    def make_run(dd, amv, out, tail, nf, scr_s, scr_sv, scr_w,
                 scr_f):
        """Factory for the per-tile compute body: returns
        run(Sv, Sbv, ua, upa, ub, upb, cm, mm, invm, write_out=None)
        closing over the scratch refs.  The streaming kernels call it
        once per grid step on their block operands; the VMEM-resident
        kernel (build_resident_call) calls it per TILE with slices of
        the resident state and a write_out callback."""
        def run(Sv, Sbv, ua, upa, ub, upb, cm, mm, invm,
                write_out=None):
            nf[...] = jnp.zeros_like(nf)
            cmv = cm[...]
            ddv = dd[...]

            if staged:
                # stage W = u + beta*(u - up) for the tile + halo once,
                # then pre-shift it once per lane-shift class: every corner
                # window in every chunk becomes a plain aligned slice (the
                # per-chunk [3, W0] rolls collapse into one tile-wide roll
                # per class)
                H = o7 + 128
                L = B + H
                ut0, ub0 = ua[...], ub[:, :H]
                up0, upb0 = upa[...], upb[:, :H]
                if bf16g:
                    # rows 0:3 = Wh, 3:6 = Wl (bf16): same staged bytes as
                    # one f32 W, no per-chunk split
                    Wt = ut0 + beta_s * (ut0 - up0)
                    Wh = Wt.astype(jnp.bfloat16)
                    scr_s[0:3, :B] = Wh
                    scr_s[3:6, :B] = (Wt - Wh.astype(dtype)).astype(
                        jnp.bfloat16)
                    Wb = ub0 + beta_s * (ub0 - upb0)
                    Whb = Wb.astype(jnp.bfloat16)
                    scr_s[0:3, B:] = Whb
                    scr_s[3:6, B:] = (Wb - Whb.astype(dtype)).astype(
                        jnp.bfloat16)
                else:
                    scr_s[:, :B] = ut0 + beta_s * (ut0 - up0)
                    scr_s[:, B:] = ub0 + beta_s * (ub0 - upb0)
                if preshift:
                    sv = scr_s[...]
                    for k, s in enumerate(NR):
                        scr_sv[3 * k:3 * k + 3] = roll(sv, L - s)
                if pre8:
                    # tile-wide class pre-rolls of the whole staged 8-row
                    # bf16 block: per-chunk gathers become aligned slices
                    sv = scr_s[...]
                    for k, s in enumerate(NR):
                        scr_sv[8 * k:8 * k + 8] = roll(sv, L - s)

            def region(start):
                """[6, W0] stacked (u; u-up) at 128-aligned offset start,
                assembled from the tile block and its +1 halo block."""
                if start + W0 <= B:
                    gu = ua[:, start:start + W0]
                    gp = upa[:, start:start + W0]
                elif start >= B:
                    gu = ub[:, start - B:start - B + W0]
                    gp = upb[:, start - B:start - B + W0]
                else:
                    gu = jnp.concatenate([ua[:, start:B],
                                          ub[:, :start + W0 - B]], axis=1)
                    gp = jnp.concatenate([upa[:, start:B],
                                          upb[:, :start + W0 - B]], axis=1)
                return jnp.concatenate([gu, gu - gp], axis=0)

            # compute in C-wide sub-chunks to bound live VMEM (the full-B
            # dataflow blows the 16 MB scoped-vmem budget)
            for c0 in ([] if ablate == "stream" else range(0, B, C)):
                if packed:
                    f24 = _chunk_packed(region, cmv, ddv, amv, c0, scr_s,
                                        scr_sv, scr_w)
                    F = f24
                    if ablate == "noscatter":
                        nf[:, c0:c0 + C] = nf[:, c0:c0 + C] + F[0:3]
                        continue
                    if s8:
                        # aligned slot scatter (_align8_operator out8): F
                        # is [64, C] with corner forces in 8-row slots, in
                        # class-block order — roll whole aligned class
                        # blocks, every extraction lands at sublane
                        # offset 0; no relayouts
                        Fv8 = jnp.concatenate(
                            [F, jnp.zeros((64, 128), dtype)], axis=1)
                        rows = {}
                        p0 = 0
                        for s, bases, js in A8B:
                            blk = Fv8[8 * p0:8 * (p0 + len(js))]
                            if s:
                                blk = roll(blk, s)
                            for i, j in enumerate(js):
                                rows[j] = blk[8 * i:8 * i + 3]
                            p0 += len(js)
                        _merged_scatter(nf, rows, offs, c0, W0)
                        continue
                    if scatter_dslice:
                        for j, o in enumerate(offs):
                            idx = pl.ds(c0 + o, C)
                            nf[:, idx] = nf[:, idx] + F[3 * j:3 * j + 3]
                        continue
                    # scatter through a zero-padded scratch + one roll per
                    # shift class: all nf updates are lane-aligned (a
                    # direct misaligned slice store costs a relayout per
                    # corner; Mosaic also rejects pad-concats of
                    # offset-mismatched vectors).  Only the rows of each
                    # class are rolled.
                    if scatter_val:
                        # F is a dot result with canonical layout; pad it
                        # as a value, skipping the scr_f round-trip
                        Fv = jnp.concatenate(
                            [F, jnp.zeros((24, 128), dtype)], axis=1)
                    else:
                        scr_f[:, :C] = F
                        scr_f[:, C:] = jnp.zeros((24, 128), dtype)
                        Fv = scr_f[...]
                    rows = _class_rolled_rows(Fv, offs, roll)
                    _merged_scatter(nf, rows, offs, c0, W0)
                else:
                    ue = jnp.concatenate([ua[...], ub[...]], axis=1)
                    upe = jnp.concatenate([upa[...], upb[...]], axis=1)
                    f = _chunk_slabs(ue, upe, cmv, c0)
                    for j in range(8):
                        a = c0 + offs[j]
                        nf[:, a:a + C] = nf[:, a:a + C] + f[j]

            force = jnp.concatenate(
                [nf[:, :o7] + tail[...], nf[:, o7:B]], axis=1)
            tail[...] = nf[:, B:B + o7]

            # mass2_minusaM - mass_minusaM == mass_simple exactly (the
            # dashpot and dangling-distribution terms cancel; consts.py
            # node_masses), so the update needs only mass_minusaM:
            #   u+ = (F + m2*u - m*up)/ms = u + (F + m*(u - up))/ms
            ut = ua[...]
            un = ut + (force + mm[...] * (ut - upa[...])) * invm[...]
            if packed_state:
                # the output IS the next step's packed state: rows 3:6
                # get the u -> up shift for free inside the same 8-row
                # physical write
                res = jnp.concatenate([un, ut, Sv[6:8]], axis=0)
            else:
                res = un
            if write_out is not None:
                write_out(res)          # resident: slice of the VMEM state
            else:
                out[...] = res
        return run

    def kernel(*refs):
        if packed_state:
            # S rows 0:3 = u, 3:6 = up; K rows 0:3 = (c1, c2, beta),
            # 3:6 = mass_minusaM, 6 = inv_mass.  Loaded as VALUES
            # (Mosaic memref views must be sublane-aligned; row
            # slices of loaded blocks lower fine)
            if nohalo:
                (Sa, K, dd, am, out, tail, nf,
                 scr_s, scr_sv, scr_w, scr_f, Sp) = refs
            else:
                (Sa, Sb, K, dd, am, out, tail, nf,
                 scr_s, scr_sv, scr_w, scr_f) = refs
                # load the blocks FIRST (the pre-refactor statement
                # order): Mosaic schedules these whole-block loads
                # against the in-flight DMAs, and issuing them after
                # the t==0 conditional measurably degrades the
                # overlap (TeraShake mesh-path bricks ran 24.6 ->
                # 44.9 ms/step with the loads below the when-block)
                pSv, pSbv, pKv = Sa[...], Sb[...], K[...]
        else:
            (ua, ub, upa, upb, cm, mm, invm, dd, am, out, tail, nf,
             scr_s, scr_sv, scr_w, scr_f) = refs
        amv = am[...] if use_mxu else None
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            tail[...] = jnp.zeros_like(tail)
            if align8:
                # align8 pad rows: multiplied by zero constant columns,
                # but uninitialized VMEM could hold NaN bit patterns
                # (MXU nan*0 = nan) — zero once; rows 0:6 are restaged
                # per tile, 6:8 never written again
                scr_s[6:8, :] = jnp.zeros(
                    (2, B + o7 + 128), jnp.bfloat16)

        run = make_run(dd, amv, out, tail, nf, scr_s, scr_sv, scr_w,
                       scr_f)


        if packed_state:
            def packed_run(Sv, Sbv, Kv):
                run(Sv, Sbv, Sv[0:3], Sv[3:6], Sbv[0:3], Sbv[3:6],
                    Kv[0:3], Kv[3:6], Kv[6:7])
            if not nohalo:
                run(pSv, pSbv, pSv[0:3], pSv[3:6], pSbv[0:3],
                    pSbv[3:6], pKv[0:3], pKv[3:6], pKv[6:7])
            elif nohalo:
                # delay-by-one pipelined dataflow (HT_PALLAS_NOHALO,
                # default): the compute tile t-1 reads its packed
                # state from the Sp scratch copy while block t
                # streams in and supplies the halo as its first
                # o7+128 columns -- the separate halo stream (a full
                # extra tile at shapes where o7+129 rounds hb up to
                # B) disappears.  Bit-identical: the last tile's
                # halo columns are garbage masked by element
                # validity exactly like the legacy clamped halo.
                @pl.when(t > 0)
                def _():
                    packed_run(Sp[...], Sa[...], K[...])
                Sp[...] = Sa[...]
        else:
            run(None, None, ua, upa, ub, upb, cm, mm, invm)

    def _chunk_packed(region, cmv, ddv, amv, c0, scr_s, scr_sv, scr_w):
        """Corner-major [24, C] dataflow: full-sublane VPU utilization
        (a [3, C] slab wastes 5/8 of every vector register).

        Gather: the corner windows sit at misaligned lane offsets.
        Each distinct (128-aligned base, shift) pair is loaded as a
        region and lane-rolled once by its shift class, so every window
        read is an aligned slice.  The damping combine is folded via
        the reference identity c3 = beta*c1, c4 = beta*c2
        (element_coefficients):

          W = u + beta*(u - up),  Z = H W,
          stiffness+damping = H(D1 (c1 Z) + D2 (c2 Z) + offdiag)

        -- one butterfly instead of three (su, sd, F -> Z, F).
        In the staged tiers the fold happens once per tile (scr_s);
        the general tier folds per corner with the per-element beta
        row.  Mosaic rejects concats of offset-mismatched vectors, so
        W is staged through a VMEM scratch with static-slice stores;
        the reload has the clean layout the butterfly concats accept."""
        c1 = cmv[0, c0:c0 + C]
        c2 = cmv[1, c0:c0 + C]

        wv = None     # register-resident W (gather_concat path)
        regs = {}
        if staged and preshift:
            # tile-wide pre-rolled classes (scr_sv): every corner
            # window is an aligned slice — zero per-chunk rolls
            cls = {s: k for k, s in enumerate(NR)}
            if gather_concat and use_mxu:
                parts = []
                for j, o in enumerate(offs):
                    s = o % 128
                    start = c0 + (o - s)
                    if s == 0:
                        parts.append(scr_s[:, pl.ds(start, C)])
                    else:
                        k = 3 * cls[s]
                        parts.append(scr_sv[k:k + 3, pl.ds(start, C)])
                wv = jnp.concatenate(parts, axis=0)
            else:
                for j, o in enumerate(offs):
                    s = o % 128
                    start = c0 + (o - s)
                    if s == 0:
                        scr_w[3 * j:3 * j + 3] = \
                            scr_s[:, pl.ds(start, C)]
                    else:
                        k = 3 * cls[s]
                        scr_w[3 * j:3 * j + 3] = \
                            scr_sv[k:k + 3, pl.ds(start, C)]
        elif staged:
            if ablate == "nogather":
                pass
            elif gather_dslice:
                for j, o in enumerate(offs):
                    scr_w[3 * j:3 * j + 3] = scr_s[:, pl.ds(c0 + o, C)]
            elif ablate == "noroll":
                g = scr_s[:, pl.ds(c0, C)]
                for j in range(8):
                    scr_w[3 * j:3 * j + 3] = g
            elif pre8:
                # tile-wide pre-rolled classes (scr_sv): zero per-chunk
                # rolls, every block an aligned [8, C] bf16 slice
                cls = {s: k for k, s in enumerate(NR)}
                blocks = []
                for s, bases, js in A8B:
                    for b in bases:
                        if s == 0:
                            blocks.append(scr_s[:, pl.ds(c0 + b, C)])
                        else:
                            k = 8 * cls[s]
                            blocks.append(
                                scr_sv[k:k + 8, pl.ds(c0 + b, C)])
                wv = jnp.concatenate(blocks, axis=0)   # [64, C] bf16
            elif align8:
                # 8-row-aligned gather (see _modes): the operand is a
                # concat of WHOLE rolled class blocks — every piece is
                # an 8-row bf16 block, so no per-corner extraction and
                # no misaligned-concat relayouts; the constant's
                # columns are permuted to the block order
                # (_align8_operator)
                blocks = []
                for s, bases, js in A8B:
                    if s == 0:
                        for b in bases:
                            blocks.append(scr_s[:, pl.ds(c0 + b, C)])
                        continue
                    parts = [scr_s[:, pl.ds(c0 + b, W0)]
                             for b in bases]
                    g = (parts[0] if len(parts) == 1
                         else jnp.concatenate(parts, axis=0))
                    blocks.append(roll(g, W0 - s)[:, :C])
                wv = jnp.concatenate(blocks, axis=0)   # [64, C] bf16
            elif gather_concat and use_mxu:
                # value-concat gather: the rolled windows have
                # canonical layouts, so the [24, C] MXU operand is
                # built as one register concat -- no scr_w VMEM
                # round-trip (the staging copies are ~1/3 of the
                # kernel's non-DMA time, see bench ablations); rolls
                # are class-batched (_gather_windows)
                wins = _gather_windows(
                    lambda b: scr_s[:, pl.ds(b, W0)], offs, c0, W0,
                    roll)
                if bf16g:
                    # (Wh, Wl) bf16 operand pair, already split
                    wv = (jnp.concatenate([w[0:3, :C] for w in wins],
                                          axis=0),
                          jnp.concatenate([w[3:6, :C] for w in wins],
                                          axis=0))
                else:
                    wv = jnp.concatenate([w[:, :C] for w in wins],
                                         axis=0)
            else:
                for j, o in enumerate(offs):
                    s = o % 128
                    start = c0 + (o - s)
                    key = (o - s, s)
                    if key not in regs:
                        g = scr_s[:, pl.ds(start, W0)]
                        regs[key] = g if s == 0 else roll(g, W0 - s)
                    scr_w[3 * j:3 * j + 3] = regs[key][:, :C]
        else:
            bt = cmv[2, c0:c0 + C]
            for j, o in enumerate(offs):
                s = o % 128
                start = (o - s) + c0
                key = (start, s)
                if key not in regs:
                    g = region(start)
                    regs[key] = g if s == 0 else roll(g, W0 - s)
                r = regs[key]
                scr_w[3 * j:3 * j + 3] = r[0:3, :C] + bt * r[3:6, :C]

        if use_mxu:
            Wv = wv if wv is not None else scr_w[...]
            if ablate == "noop":
                return Wv * (c1 != 0.0).astype(dtype)
            if align8:
                # X = [X8; X8]: K=128, one systolic pass; the b4 split
                # lives in the constant's column layout
                if s8 and tier == "umat":
                    # invalid-element mask on the bf16 operand (exact
                    # 0/1): the s8 output needs no epilogue mask
                    Wv = Wv * (c1 != 0.0).astype(jnp.bfloat16)
                X = jnp.concatenate([Wv, Wv], axis=0)
                F = jax.lax.dot_general(
                    amv, X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if s8:
                    if tier == "umat":
                        return F                       # [64, C] slots
                    return F[:64] * c1 + F[64:] * c2   # [64, C] slots
                if tier == "umat":
                    return F * (c1 != 0.0).astype(dtype)
                return F[:24] * c1 + F[24:] * c2
            if isinstance(Wv, tuple):
                A = amv[:24] if tier == "umat" else amv
                F = _mxu_dot_presplit(A, Wv[0], Wv[1], mxu_mode)
                if tier == "umat":
                    return F * (c1 != 0.0).astype(dtype)
                return F[:24] * c1 + F[24:] * c2
            if tier == "umat":
                F = _mxu_dot(amv[:24], Wv, mxu_mode, mxu_prec)
                return F * (c1 != 0.0).astype(dtype)
            Y = _mxu_dot(amv, Wv, mxu_mode, mxu_prec)
            return Y[:24] * c1 + Y[24:] * c2

        Z = bf24(scr_w[...])
        zero = jnp.zeros((1, C), dtype)
        if tier == "umat":
            # uniform material: coefficients folded at trace time; the
            # streamed c1 row only supplies the validity mask
            y = Z * (ddv[:24, :1] * c1s + ddv[24:, :1] * c2s)
            rows = [None] * 24
            for ro, ri, k in offu:
                r = k * Z[ri:ri + 1]
                rows[ro] = r if rows[ro] is None else rows[ro] + r
            corr = jnp.concatenate([r if r is not None else zero
                                    for r in rows], axis=0)
            # validity mask from the streamed c1 row (exact 1.0/0.0)
            return bf24(y + corr) * (c1 != 0.0).astype(dtype)
        e1 = Z * c1
        e2 = Z * c2
        y = e1 * ddv[:24, :1] + e2 * ddv[24:, :1]
        # off-diagonal corrections as a row-concat (no scatter: Mosaic
        # cannot lower scatter-add)
        rows = [None] * 24
        for src, off in ((e1, off1), (e2, off2)):
            for ro, ri, k in off:
                r = k * src[ri:ri + 1]
                rows[ro] = r if rows[ro] is None else rows[ro] + r
        corr = jnp.concatenate([r if r is not None else zero
                                for r in rows], axis=0)
        return bf24(y + corr)   # H symmetric -> inverse = forward

    def _chunk_slabs(ue, upe, cmv, c0):
        c1, c2, bt = (cmv[k, c0:c0 + C] for k in range(3))
        uj = [ue[:, c0 + o:c0 + o + C] for o in offs]
        dj = [upe[:, c0 + o:c0 + o + C] for o in offs]
        # damping folded via c3 = beta*c1, c4 = beta*c2:
        # W = u + beta*(u - up), one butterfly for both operators
        wz = _butterfly([a + bt * (a - b) for a, b in zip(uj, dj)])
        p = [wz[m] * c1 for m in range(8)]
        q = [wz[m] * c2 for m in range(8)]

        # sparse spectral operator: y = -(F1 p + F2 q) (minus folded
        # into the coefficients at trace time)
        rows = {}
        for ent, x in ((f1e, p), (f2e, q)):
            for mo, co, mi, ci, k in ent:
                r = x[mi][ci] * (-k)
                rows[mo, co] = rows.get((mo, co), 0.0) + r
        z = jnp.zeros((C,), dtype)
        y = [jnp.stack([rows.get((m, cc), z) for cc in range(3)])
             for m in range(8)]
        return _butterfly(y)   # H symmetric -> inverse = forward
        # (the 1/8 Hadamard normalization is in the coefficients)

    return kernel, am_dev, make_run


def _bkt_bf16g(a8, dtype, interpret, default="1"):
    """Staged-bf16 b4 operand mode for the node-basis BKT kernels
    (the elastic bf16g dataflow re-derived for the two-field
    dvs/dvk stream — see _make_bkt_uniform_kernel).  Engages for f32
    runs when align8 is on and HT_MXU_PREC resolves to a split mode
    (the K=256 duplicated operand carries the full b4 product in one
    dot, so b3 costs the same); HT_MXU_PREC=highest or
    HT_BKT_BF16G=0 restore the exact f32 operand + 6-pass HIGHEST
    matmul.  Engages identically under interpret so
    mosaic-vs-interpret tests compare the same math.

    Per-kernel default: ON for the compute-bound nodeq kernel
    (measured 7.1e8 -> 8.7e8 eups on the 1M qlayers fixture), OFF
    for the uniform-Q kernel — that one is DMA-bound at 454 GB/s and
    the staged split only adds vector time (measured 1.85e9 ->
    1.53e9)."""
    del interpret
    if not a8 or dtype != jnp.float32:
        return False
    if os.environ.get("HT_BKT_BF16G", default) != "1":
        return False
    return _mxu_mode("b4") in ("b3", "b4")


def _bkt_nohalo():
    """Pipelined delay-by-one dataflow for the node-basis BKT
    kernels (HT_BKT_NOHALO): the next-tile halo is read from the
    block currently streaming in instead of a separate halo operand,
    removing the extra hb-block of S and conv traffic per tile
    (73.4 of 256.9 MB/step at the 1M bench).  Bit-identical to the
    halo-stream path (the last tile's garbage halo columns are
    masked by element validity in both).  Default OFF: the
    one-process A/B measured 571 us/step legacy vs 581 nohalo — the
    delay-by-one structure loses as much compute/DMA overlap as it
    saves in bytes (same finding as the elastic twin).  Kept as an
    opt-in ablation; the VMEM-resident loop is the byte cut that
    pays (run_resident)."""
    return os.environ.get("HT_BKT_NOHALO", "0") == "1"


def _bf16_split3(A):
    """Exact 3-term bf16 decomposition of an f32 array (Dekker-style:
    each residual is exactly representable, 8+8+8 mantissa bits cover
    f32's 24), concatenated along axis=1 -> [R, 3*nb].  Returns None
    if any entry fails to reconstruct exactly (subnormal edge)."""
    import ml_dtypes
    A = np.asarray(A, np.float32)
    A1 = A.astype(ml_dtypes.bfloat16)
    r = A - A1.astype(np.float32)
    A2 = r.astype(ml_dtypes.bfloat16)
    r2 = r - A2.astype(np.float32)
    A3 = r2.astype(ml_dtypes.bfloat16)
    if not np.array_equal(
            A1.astype(np.float32) + A2.astype(np.float32)
            + A3.astype(np.float32), A):
        return None
    return np.concatenate([A1, A2, A3], axis=1)


def bkt_kappa_zero(bkt) -> bool:
    """True when the volumetric (kappa) attenuation is off (infinite
    Qk, the use_infinite_qk default): the kappa memory variables are
    multiplied by zero everywhere, so dv_kappa == ue and the kernel
    can drop half the convolution state."""
    return (not np.asarray(bkt["a0_kappa"]).any()
            and not np.asarray(bkt["a1_kappa"]).any()
            and not np.asarray(bkt["kappa_coef"]).any())


def bkt_conv_dtype(dtype):
    """Storage dtype of the streamed convolution state.  The memory
    variables enter the force only through a0/a1 ~ O(0.01) weights
    (QTABLE anelastic coefficients), so bf16 storage costs ~6e-5
    relative force error while halving the dominant HBM stream; f64
    runs (validation) keep full precision.  HT_BKT_CONV=f32 opts out."""
    if (dtype == jnp.float32
            and os.environ.get("HT_BKT_CONV", "bf16") == "bf16"):
        return jnp.bfloat16
    return dtype


def _make_bkt_kernel(offs, B, o7, T, C, dtype,
                     shear_only=False, conv_dtype=None,
                     interpret=False):
    """Fused BKT (constant-Q viscoelastic) step kernel
    (damping.c:110-416 fused into one HBM pass).

    Grid is (T, NC): tiles x C-wide column blocks, so the 96-row
    convolution state streams through VMEM in (96, C) blocks instead of
    a whole (96, B) tile (which would blow the scoped-vmem budget).
    The memory variables are carried in the NODAL corner basis: the
    recursion
        s0' = c2*u + c1*up + e0*s0          (calc_conv, damping.c:110)
    has per-element (column-scalar) coefficients, so it holds verbatim
    in any fixed row basis; keeping the state nodal makes the whole
    viscoelastic force one constant matmul
        f24 = FM_mu @ (mu_f * dvs) + FM_kappa @ (kappa_f * dvk)
         (= FM [24,48] @ X [48,C] on the MXU)
    with FM_* = bkt_matrices_24() node-major operators -- no Hadamard
    butterflies at all, which removes ~60% of the VPU work of the
    previous spectral-basis kernel (the kernel streams ~350 MB/step at
    1M elements, so freed VPU time goes straight into DMA overlap)."""
    from ..physics.kmats import bkt_matrices_24

    NC = B // C
    W0 = C + 128
    kmu, kk = bkt_matrices_24()
    fm_np = np.concatenate([kmu, kk], axis=1)   # [24, 48]
    if conv_dtype is None:
        conv_dtype = dtype

    def roll(x, shift):
        if interpret:
            return jnp.roll(x, shift, axis=1)
        return pltpu.roll(x, jnp.int32(shift), 1)

    def kernel(ua, ub, upa, upb, bk, mm, invm, fm, conv, out,
               conv_out, tail, nf, scr_u, scr_p):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(jnp.logical_and(t == 0, c == 0))
        def _():
            tail[...] = jnp.zeros_like(tail)

        @pl.when(c == 0)
        def _():
            nf[...] = jnp.zeros_like(nf)
            # stage tile + one-tile halo contiguously so the per-chunk
            # corner windows are lane-aligned dynamic slices
            scr_u[:, :B] = ua[...]
            scr_u[:, B:] = ub[:, :o7 + 128]
            scr_p[:, :B] = upa[...]
            scr_p[:, B:] = upb[:, :o7 + 128]

        c0 = c * C

        def region(start):
            gu = scr_u[:, pl.ds(start, W0)]
            gp = scr_p[:, pl.ds(start, W0)]
            return jnp.concatenate([gu, gu - gp], axis=0)

        # register-concat gather of the [6, W0] (u; u - up) corner
        # windows, rolls class-batched (_gather_windows) — no scr_w
        # VMEM round-trip
        wins = _gather_windows(region, offs, c0, W0, roll)
        u24 = jnp.concatenate([w[0:3, :C] for w in wins], axis=0)
        du24 = jnp.concatenate([w[3:6, :C] for w in wins], axis=0)
        up24 = u24 - du24
        bkv = bk[...]

        cv = conv[...].astype(dtype)
        s0, s1 = cv[0:24, :], cv[24:48, :]
        s0n = bkv[1:2] * u24 + bkv[0:1] * up24 + bkv[4:5] * s0
        s1n = bkv[3:4] * u24 + bkv[2:3] * up24 + bkv[5:6] * s1
        if shear_only:
            conv_out[...] = jnp.concatenate(
                [s0n, s1n], axis=0).astype(conv_dtype)
            dvk = u24
        else:
            k0, k1 = cv[48:72, :], cv[72:96, :]
            k0n = bkv[10:11] * u24 + bkv[9:10] * up24 + bkv[13:14] * k0
            k1n = bkv[12:13] * u24 + bkv[11:12] * up24 + bkv[14:15] * k1
            conv_out[...] = jnp.concatenate(
                [s0n, s1n, k0n, k1n], axis=0).astype(conv_dtype)
            dvk = (bkv[17:18] * du24 + u24 - bkv[15:16] * k0n
                   - bkv[16:17] * k1n)

        dvs = bkv[8:9] * du24 + u24 - bkv[6:7] * s0n - bkv[7:8] * s1n
        imf = 9 if shear_only else 18   # mu_f/kappa_f rows (bk_row_names)
        mode = _mxu_mode("highest")
        prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                else jax.lax.Precision.DEFAULT)
        fmv = fm[...]
        if os.environ.get("HT_BKT_OP", "dot48") == "dot48":
            X = jnp.concatenate([dvs * bkv[imf:imf + 1],
                                 dvk * bkv[imf + 1:imf + 2]], axis=0)
            F = _mxu_dot(fmv, X, mode, prec)
        else:
            F = (_mxu_dot(fmv[:, 0:24], dvs * bkv[imf:imf + 1],
                          mode, prec)
                 + _mxu_dot(fmv[:, 24:48], dvk * bkv[imf + 1:imf + 2],
                            mode, prec))

        # value scatter (dot result has the canonical layout), rolls
        # class-batched, targets merged (see _merged_scatter)
        Fv = jnp.concatenate([F, jnp.zeros((24, 128), dtype)], axis=1)
        rows = _class_rolled_rows(Fv, offs, roll)
        _merged_scatter(nf, rows, offs, c0, W0)

        @pl.when(c == NC - 1)
        def _():
            force = jnp.concatenate(
                [nf[:, :o7] + tail[...], nf[:, o7:B]], axis=1)
            tail[...] = nf[:, B:B + o7]
            ut = ua[...]
            out[...] = ut + (force + mm[...] * (ut - upa[...])) \
                * invm[...]

    return kernel, jnp.asarray(fm_np, dtype)


def build_bkt_call(offs, B, o7, T, LEN, dtype, chunk=None,
                   shear_only=False, conv_dtype=None, interpret=False):
    """pallas_call for one BKT brick: (u, u, up, up, bk, mm, invm,
    conv) -> (u_next [3, LEN], conv_next [R, LEN]) with R = 48
    (shear-only, infinite Qk) or 96; conv is in the nodal corner
    basis."""
    if chunk is None:
        # same throughput as 4096 but ~5x faster Mosaic compile, and
        # the (R, C) conv blocks stay well inside VMEM
        chunk = int(os.environ.get("HT_PALLAS_BKT_CHUNK", 2048))
    C, _ = _kernel_mode(B, chunk)
    NC = B // C
    if conv_dtype is None:
        conv_dtype = dtype
    R = 48 if shear_only else 96
    RB = len(bk_row_names(shear_only))
    kernel, fm = _make_bkt_kernel(offs, B, o7, T, C, dtype,
                                  shear_only=shear_only,
                                  conv_dtype=conv_dtype,
                                  interpret=interpret)
    blk = lambda t, c: (0, t)
    # halo operand narrowed to the stencil reach (see build_call)
    hb = _halo_block(B, o7)
    nh = B // hb
    blk1 = lambda t, c: (0, jnp.minimum((t + 1) * nh, T * nh - 1))
    blkc = lambda t, c: (0, t * NC + c)
    call = pl.pallas_call(
        kernel,
        grid=(T, NC),
        in_specs=[
            pl.BlockSpec((3, B), blk), pl.BlockSpec((3, hb), blk1),
            pl.BlockSpec((3, B), blk), pl.BlockSpec((3, hb), blk1),
            pl.BlockSpec((RB, C), blkc),
            pl.BlockSpec((3, B), blk),
            pl.BlockSpec((1, B), blk),
            pl.BlockSpec((24, 48), lambda t, c: (0, 0)),
            pl.BlockSpec((R, C), blkc),
        ],
        out_specs=[pl.BlockSpec((3, B), blk),
                   pl.BlockSpec((R, C), blkc)],
        out_shape=[jax.ShapeDtypeStruct((3, LEN), dtype),
                   jax.ShapeDtypeStruct((R, LEN), conv_dtype)],
        scratch_shapes=[pltpu.VMEM((3, o7), dtype),
                        pltpu.VMEM((3, B + o7 + 128), dtype),
                        pltpu.VMEM((3, B + o7 + 128), dtype),
                        pltpu.VMEM((3, B + o7 + 128), dtype)],
        interpret=interpret,
    )
    return lambda u, ub, up, upb, bk, mm, invm, conv: call(
        u, ub, up, upb, bk, mm, invm, fm, conv)


def _make_bkt_uniform_kernel(offs, B, o7, T, dtype, scal,
                             shear_only=False, conv_dtype=None,
                             chunk=None, interpret=False):
    """Uniform-Q BKT kernel: node-basis memory variables.

    The memory-variable recursion (calc_conv, damping.c:110-222)
        s0' = c2*u_n + c1*u_n(t-1) + e0*s0
    is driven purely by the NODE displacement with per-element
    coefficients.  When every element shares one coefficient set
    (homogeneous-Q region: one material, or one Q bin after the
    Qs(Vs) fit), the variable for (element, corner) depends only on
    the corner's node — so the state collapses from the corner basis
    (8 corners x 3 comps x 4 vars = 96 rows/element,
    build_bkt_call) to 4 vars x 3 comps = 12 rows/NODE (6 shear-only),
    an 8x cut of the dominant HBM stream.  The damping vectors
        dvs = coef*du + u - a0*s0' - a1*s1'
    become node fields, staged once per tile (+halo) and gathered at
    the 8 corners exactly like the elastic kernel's W — same
    aligned-slice + lane-roll pipeline, one [24,48] @ [48,C] MXU
    matmul with mu_f/kappa_f folded into the operator.  Packed state:
    carry = (S [8, LEN], conv [R2s, LEN]).
    """
    from ..physics.kmats import bkt_matrices_24

    if chunk is None:
        chunk = int(os.environ.get("HT_PALLAS_CHUNK", 4096))
    C = min(chunk, B)
    W0 = C + 128
    H = o7 + 128
    if conv_dtype is None:
        conv_dtype = dtype
    R2 = 6 if shear_only else 12         # meaningful conv rows
    R2s = 8 if shear_only else 16        # padded to the physical tile

    kmu, kk = bkt_matrices_24()
    # 8-row-aligned dataflow (default ON; the same relayout removal
    # as the elastic align8): scr_v staged as [8, L] (dvs 0:3, dvk
    # 3:6, zero pad 6:8), tile-wide class pre-rolls, class-block
    # operand against the column-permuted constant, 8-row-slot output
    # for the aligned scatter
    a8 = os.environ.get("HT_BKT_ALIGN8", "1") == "1"
    s8 = a8 and os.environ.get("HT_BKT_SCATTER8", "0") == "1"
    # staged-bf16 split operand (the elastic bf16g/align8 dataflow,
    # re-derived for the two-field BKT stream): dvs and dvk are
    # staged as (hi 0:3, lo 3:6, pad) bf16 blocks — SAME staged bytes
    # as one f32 field, HALF the per-chunk roll volume — and the MXU
    # consumes [Xs8; Xs8; Xk8; Xk8] (K = 256) against per-field
    # _align8_operator constants: the full b4 split product
    # (~2^-20 relative force error) in ONE dot, replacing the
    # 6-pass XLA HIGHEST matmul.  HT_MXU_PREC=highest opts out
    # (exact f32); HT_BKT_BF16G=0 restores the f32 operand.
    bf16g = _bkt_bf16g(a8, dtype, interpret, default="0")
    # pre8 repurposes scr_vv, which bf16g uses as the dvk block
    p8 = (a8 and not bf16g
          and os.environ.get("HT_BKT_PRESHIFT8", "0") == "1")
    A8B = _align8_blocks(offs) if a8 else None
    NR = sorted({o % 128 for o in offs} - {0})
    if bf16g:
        fm_np = np.concatenate(
            [_align8_operator(scal["mu_f"] * kmu, offs, out8=s8),
             _align8_operator(scal["kappa_f"] * kk, offs, out8=s8)],
            axis=1)                      # [24|64, 256] bf16
    else:
        fm_np = np.concatenate(
            [scal["mu_f"] * kmu, scal["kappa_f"] * kk],
            axis=1)                      # [24, 48]
        if a8:
            fm_np = _align8_operator_cols(fm_np, offs, fields=2)
            if s8:
                fm_np = _align8_operator_rows(fm_np, offs)

    # python-float coefficients fold into the trace as weak-typed
    # scalars (no dtype promotion)
    s = {k: float(v) for k, v in scal.items()}

    def roll(x, shift):
        if interpret:
            return jnp.roll(x, shift, axis=1)
        if x.dtype == jnp.bfloat16:
            # Mosaic cannot lower pltpu.roll on bf16; even-row blocks
            # roll for free through an f32 bitcast view (sublane
            # pairs pack into 32-bit rows; lane shifts never mix)
            assert x.shape[0] % 2 == 0
            v = pltpu.bitcast(x, jnp.float32)
            return pltpu.bitcast(pltpu.roll(v, jnp.int32(shift), 1),
                                 jnp.bfloat16)
        return pltpu.roll(x, jnp.int32(shift), 1)

    def rec(u3, up3, cv):
        """(conv_next [R2, W], dvs [3, W], dvk [3, W]) node fields."""
        du = u3 - up3
        s0, s1 = cv[0:3], cv[3:6]
        s0n = s["shear_c2"] * u3 + s["shear_c1"] * up3 \
            + s["shear_e0"] * s0
        s1n = s["shear_c4"] * u3 + s["shear_c3"] * up3 \
            + s["shear_e1"] * s1
        dvs = (s["shear_coef"] * du + u3
               - s["a0_shear"] * s0n - s["a1_shear"] * s1n)
        if shear_only:
            return jnp.concatenate([s0n, s1n], axis=0), dvs, u3
        k0, k1 = cv[6:9], cv[9:12]
        k0n = s["kappa_c2"] * u3 + s["kappa_c1"] * up3 \
            + s["kappa_e0"] * k0
        k1n = s["kappa_c4"] * u3 + s["kappa_c3"] * up3 \
            + s["kappa_e1"] * k1
        dvk = (s["kappa_coef"] * du + u3
               - s["a0_kappa"] * k0n - s["a1_kappa"] * k1n)
        return jnp.concatenate([s0n, s1n, k0n, k1n], axis=0), dvs, dvk

    sdt = jnp.bfloat16 if bf16g else dtype
    # the streamed block must cover the stencil reach to serve as the
    # next-tile halo (always true at production tiles; tiny test
    # bricks fall back to the legacy halo stream)
    nohalo = _bkt_nohalo() and H <= B
    # measurement-only ablations (WRONG PHYSICS; see the elastic
    # HT_PALLAS_ABLATE): "norec" skips the conv recursion math,
    # "stream" skips the whole element pass, "nogather" skips
    # gather+dot, "noop" gathers but skips the dot
    abl = os.environ.get("HT_BKT_ABLATE", "")

    def body(Sv, Shalo, Kv, cvt, cvh, fm, out, conv_out, tail, nf,
             scr_v, scr_vv, write_out=None, write_conv=None):
        """One compute tile: Sv/cvt = the tile's packed state and conv
        block, Shalo/cvh = the NEXT tile's first H columns (under
        nohalo these are the prefix of the block currently streaming
        in; the legacy path streams them as separate halo operands).
        write_out/write_conv: resident-mode callbacks writing slices
        of the VMEM-resident state instead of the out blocks."""
        nf[...] = jnp.zeros_like(nf)
        u, up = Sv[0:3], Sv[3:6]

        # node-basis recursion on tile + halo; only tile rows persist
        if abl == "norec":
            cvt3 = cvt[:R2].astype(dtype)
            cn_t, dvs_t, dvk_t = cvt3, u, up
            cn_h = cvh[:R2].astype(dtype)
            dvs_h, dvk_h = Shalo[0:3], Shalo[3:6]
        else:
            cn_t, dvs_t, dvk_t = rec(u, up, cvt[:R2].astype(dtype))
            cn_h, dvs_h, dvk_h = rec(Shalo[0:3], Shalo[3:6],
                                     cvh[:R2].astype(dtype))
        pad = jnp.zeros((R2s - R2, B), dtype)
        cnv = jnp.concatenate([cn_t, pad], axis=0).astype(conv_dtype)
        if write_conv is not None:
            write_conv(cnv)
        else:
            conv_out[...] = cnv
        if bf16g:
            # stage each field as (hi 0:3, lo 3:6, pad) bf16: same
            # staged bytes as one f32 field, half the roll volume;
            # scr_v = dvs block, scr_vv = dvk block
            for dst, tv, hv in ((scr_v, dvs_t, dvs_h),
                                (scr_vv, dvk_t, dvk_h)):
                th = tv.astype(jnp.bfloat16)
                dst[0:3, :B] = th
                dst[3:6, :B] = (tv - th.astype(dtype)).astype(
                    jnp.bfloat16)
                hh = hv.astype(jnp.bfloat16)
                dst[0:3, B:] = hh
                dst[3:6, B:] = (hv - hh.astype(dtype)).astype(
                    jnp.bfloat16)
        else:
            scr_v[0:3, :B] = dvs_t
            scr_v[0:3, B:] = dvs_h
            scr_v[3:6, :B] = dvk_t
            scr_v[3:6, B:] = dvk_h
        pre = None
        if p8:
            # tile-wide class pre-rolls: per-chunk gathers become
            # aligned slices (the elastic pre8 mode; default off for
            # BKT — the extra scratch crowds the conv-heavy VMEM)
            sv = scr_v[...]
            for k, sh in enumerate(NR):
                scr_vv[8 * k:8 * k + 8] = roll(sv, B + H - sh)
            pre = {sh: 8 * k for k, sh in enumerate(NR)}

        valid = Kv[4:5]
        mode = _mxu_mode("highest")
        prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                else jax.lax.Precision.DEFAULT)
        for c0 in ([] if abl == "stream" else range(0, B, C)):
            if abl == "nogather":
                nf[:, c0:c0 + C] = nf[:, c0:c0 + C] + scr_v[0:3,
                                                            c0:c0 + C]
                continue
            if abl == "noop" and a8 and not bf16g:
                X8 = _gather_blocks8(
                    lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B)
                F = X8[0:24] * valid[:, c0:c0 + C]
                Fv = jnp.concatenate(
                    [F, jnp.zeros((24, 128), dtype)], axis=1)
                rows = _class_rolled_rows(Fv, offs, roll)
                _merged_scatter(nf, rows, offs, c0, W0)
                continue
            if bf16g:
                # [Xs8; Xs8; Xk8; Xk8] (K=256) against the per-field
                # duplicated-column constants: full b4 split product
                # of both fields in ONE dot
                Xs = _gather_blocks8(
                    lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B)
                Xk = _gather_blocks8(
                    lambda b: scr_vv[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B)
                X = jnp.concatenate([Xs, Xs, Xk, Xk], axis=0)
                F = jax.lax.dot_general(
                    fm[...], X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                F = F * valid[:, c0:c0 + C]
                if s8:
                    _slot_scatter8(nf, F, A8B, roll, offs, c0, W0,
                                   dtype)
                else:
                    Fv = jnp.concatenate(
                        [F, jnp.zeros((24, 128), dtype)], axis=1)
                    rows = _class_rolled_rows(Fv, offs, roll)
                    _merged_scatter(nf, rows, offs, c0, W0)
                continue
            if a8:
                # aligned class-block operand [64, C] against the
                # column/row-permuted constant; slot-layout output
                # feeds the aligned scatter
                X8 = _gather_blocks8(
                    lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B, pre=pre, pre_ref=scr_vv)
                F = _mxu_dot(fm[...], X8, mode, prec)
                F = F * valid[:, c0:c0 + C]
                if s8:
                    _slot_scatter8(nf, F, A8B, roll, offs, c0, W0,
                                   dtype)
                else:
                    Fv = jnp.concatenate(
                        [F, jnp.zeros((24, 128), dtype)], axis=1)
                    rows = _class_rolled_rows(Fv, offs, roll)
                    _merged_scatter(nf, rows, offs, c0, W0)
                continue
            # register-concat gather of the [6, W0] (dvs; dvk) node
            # fields, rolls class-batched; MXU operand [48, C] with
            # dvs rows 0:24, dvk rows 24:48 — no scr_w round-trip
            wins = _gather_windows(
                lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, W0, roll)
            wv = jnp.concatenate(
                [w[0:3, :C] for w in wins]
                + [w[3:6, :C] for w in wins], axis=0)
            F = _mxu_dot(fm[...], wv, mode, prec)
            F = F * valid[:, c0:c0 + C]
            # value scatter (dot result has the canonical layout)
            Fv = jnp.concatenate([F, jnp.zeros((24, 128), dtype)],
                                 axis=1)
            rows = _class_rolled_rows(Fv, offs, roll)
            _merged_scatter(nf, rows, offs, c0, W0)

        force = jnp.concatenate(
            [nf[:, :o7] + tail[...], nf[:, o7:B]], axis=1)
        tail[...] = nf[:, B:B + o7]
        un = u + (force + Kv[0:3] * (u - up)) * Kv[3:4]
        res = jnp.concatenate([un, u, Sv[6:8]], axis=0)
        if write_out is not None:
            write_out(res)
        else:
            out[...] = res

    def _zero_once(tail, scr_v, scr_vv):
        tail[...] = jnp.zeros_like(tail)
        if a8:
            # pad rows: never rewritten; zero once (the constant's
            # pad columns are zero, but NaN garbage would poison
            # the dot)
            scr_v[6:8, :] = jnp.zeros((2, B + H), sdt)
            if bf16g:
                scr_vv[6:8, :] = jnp.zeros((2, B + H), sdt)

    def kernel_halo(Sa, Sb, K, cva, cvb, fm, out, conv_out, tail, nf,
                    scr_v, scr_vv):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            _zero_once(tail, scr_v, scr_vv)

        body(Sa[...], Sb[...][:, :H], K[...], cva[...],
             cvb[...][:, :H], fm, out, conv_out, tail, nf,
             scr_v, scr_vv)

    def kernel_nohalo(Sa, K, cva, fm, out, conv_out, tail, nf,
                      scr_v, scr_vv, Sp, cvp):
        """Pipelined delay-by-one dataflow (HT_BKT_NOHALO, default):
        grid T+1; at step t the COMPUTE tile is t-1 (state/conv from
        the Sp/cvp scratch copies, K/out/conv_out blocks mapped to
        t-1) while block t streams in and supplies the halo as its
        first H columns — the separate halo streams (a full extra
        hb-block of S and conv per tile, ~15% of step traffic at the
        1M bench) disappear; the last tile's halo columns read its
        own block prefix, masked by the element validity row exactly
        like the legacy clamped halo."""
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            _zero_once(tail, scr_v, scr_vv)

        @pl.when(t > 0)
        def _():
            Sav = Sa[...]
            body(Sp[...], Sav[:, :H], K[...], cvp[...],
                 cva[...][:, :H], fm, out, conv_out, tail, nf,
                 scr_v, scr_vv)

        # keep the streamed block for the next step's compute tile
        Sp[...] = Sa[...]
        cvp[...] = cva[...]

    kernel = kernel_nohalo if nohalo else kernel_halo
    return (kernel,
            jnp.asarray(fm_np, jnp.bfloat16 if bf16g else dtype),
            R2s, body, _zero_once)


def build_bkt_uniform_call(offs, B, o7, T, LEN, dtype, scal,
                           shear_only=False, conv_dtype=None,
                           interpret=False):
    """pallas_call for the uniform-Q node-basis BKT kernel:
    (S, S_halo, K, conv, conv_halo) -> (S_next [8, LEN],
    conv_next [R2s, LEN]).  K rows: mass_minusaM 0:3, inv_mass 3,
    valid 4."""
    kernel, fm, R2s, _, _ = _make_bkt_uniform_kernel(
        offs, B, o7, T, dtype, scal, shear_only=shear_only,
        conv_dtype=conv_dtype, interpret=interpret)
    if conv_dtype is None:
        conv_dtype = dtype
    C = min(int(os.environ.get("HT_PALLAS_CHUNK", 4096)), B)
    blk = lambda t: (0, t)
    hb = _halo_block(B, o7)
    nh = B // hb
    blk1 = lambda t: (0, jnp.minimum((t + 1) * nh, T * nh - 1))
    # a8 dataflow scratches (must mirror _make_bkt_uniform_kernel)
    a8 = os.environ.get("HT_BKT_ALIGN8", "1") == "1"
    bf16g = _bkt_bf16g(a8, dtype, interpret, default="0")
    p8 = (a8 and not bf16g
          and os.environ.get("HT_BKT_PRESHIFT8", "0") == "1")
    nohalo = _bkt_nohalo() and o7 + 128 <= B
    nshift = len({o % 128 for o in offs} - {0})
    sdt = jnp.bfloat16 if bf16g else dtype
    scr_v = ((8, B + o7 + 128) if a8 else (6, B + o7 + 128))
    scr_vv = ((8, B + o7 + 128) if bf16g else
              (8 * max(nshift, 1), B + o7 + 128) if p8 else (8, 128))
    params = None
    if not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    scratch = [pltpu.VMEM((3, o7), dtype),
               pltpu.VMEM((3, B + o7 + 128), dtype),
               pltpu.VMEM(scr_v, sdt),
               pltpu.VMEM(scr_vv, sdt)]
    if nohalo:
        # delay-by-one pipeline: grid T+1, compute tile t-1 from the
        # Sp/cvp scratch copies; S/conv stream at t, K/out at t-1
        blkc = lambda t: (0, jnp.maximum(t - 1, 0))
        blks = lambda t: (0, jnp.minimum(t, T - 1))
        call = pl.pallas_call(
            kernel,
            grid=(T + 1,),
            in_specs=[
                pl.BlockSpec((8, B), blks),
                pl.BlockSpec((8, B), blkc),
                pl.BlockSpec((R2s, B), blks),
                pl.BlockSpec(fm.shape, lambda t: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((8, B), blkc),
                       pl.BlockSpec((R2s, B), blkc)],
            out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                       jax.ShapeDtypeStruct((R2s, LEN), conv_dtype)],
            scratch_shapes=scratch + [
                pltpu.VMEM((8, B), dtype),
                pltpu.VMEM((R2s, B), conv_dtype)],
            interpret=interpret,
            compiler_params=params,
        )
        return lambda S, Sb, K, cv, cvb: call(S, K, cv, fm)
    call = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, B), blk), pl.BlockSpec((8, hb), blk1),
            pl.BlockSpec((8, B), blk),
            pl.BlockSpec((R2s, B), blk), pl.BlockSpec((R2s, hb), blk1),
            pl.BlockSpec(fm.shape, lambda t: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((8, B), blk),
                   pl.BlockSpec((R2s, B), blk)],
        out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                   jax.ShapeDtypeStruct((R2s, LEN), conv_dtype)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )
    return lambda S, Sb, K, cv, cvb: call(S, Sb, K, cv, cvb, fm)


def build_resident_bkt_call(offs, B, o7, T, LEN, dtype, scal, CH,
                            shear_only=False, conv_dtype=None,
                            src_pos=(), st_pos=None, st_phi=None,
                            interpret=False):
    """VMEM-resident time loop for the uniform-Q node-basis BKT
    kernel (see build_resident_call): S, K and the convolution state
    all live in VMEM scratch for the whole CH-step chunk — the
    streaming kernel's 256.9 MB/step at the 1M bench drops to the
    amortized chunk entry/exit DMAs.  S+K+conv is ~114 MB at 1M
    nodes (v5e: 128 MB/core).  Per-tile compute is the identical
    _make_bkt_uniform_kernel body — bit-identical trajectories.

    Returns advance(S [8, LEN], CV [R2s, LEN], K [8, LEN],
    srcf_pad [CH, 8, 128]) -> (S', CV', samples [CH, 8, 128])."""
    _, fm, R2s, body, zero_once = _make_bkt_uniform_kernel(
        offs, B, o7, T, dtype, scal, shear_only=shear_only,
        conv_dtype=conv_dtype, interpret=interpret)
    if conv_dtype is None:
        conv_dtype = dtype
    a8 = os.environ.get("HT_BKT_ALIGN8", "1") == "1"
    bf16g = _bkt_bf16g(a8, dtype, interpret, default="0")
    p8 = (a8 and not bf16g
          and os.environ.get("HT_BKT_PRESHIFT8", "0") == "1")
    nshift = len({o % 128 for o in offs} - {0})
    sdt = jnp.bfloat16 if bf16g else dtype
    scr_v = ((8, B + o7 + 128) if a8 else (6, B + o7 + 128))
    scr_vv = ((8, B + o7 + 128) if bf16g else
              (8 * max(nshift, 1), B + o7 + 128) if p8 else (8, 128))
    H = o7 + 128
    Hp = -(-H // 128) * 128
    LENR = LEN + Hp
    src_pos = [int(p) for p in np.asarray(src_pos).reshape(-1)]
    ns = 0 if st_pos is None else len(st_pos)
    if ns:
        st_pos = np.asarray(st_pos, np.int64).reshape(ns, -1)
        st_phi = np.asarray(st_phi, np.float64).reshape(ns, -1)
    assert len(src_pos) <= 128 and ns <= 128

    def kernel(S0, CV0, K0, fm_r, srcf, Sfin, CVfin, samples, tail,
               nf, scr_va, scr_vb, Sres, Kres, CVres, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if interpret:
                Sres[:, :LEN] = S0[...]
                Kres[...] = K0[...]
                CVres[:, :LEN] = CV0[...]
            else:
                for src, dst in ((S0, Sres.at[:, :LEN]),
                                 (K0, Kres),
                                 (CV0, CVres.at[:, :LEN])):
                    cp = pltpu.make_async_copy(src, dst, sem)
                    cp.start()
                    cp.wait()
            Sres[:, LEN:] = jnp.zeros((8, Hp), dtype)
            CVres[:, LEN:] = jnp.zeros((R2s, Hp), conv_dtype)
            zero_once(tail, scr_va, scr_vb)

        if ns:
            cols = []
            for s in range(ns):
                acc = None
                for j in range(st_pos.shape[1]):
                    p = int(st_pos[s, j])
                    v = float(st_phi[s, j]) * Sres[0:3, p:p + 1]
                    acc = v if acc is None else acc + v
                cols.append(acc)
            blk = jnp.concatenate(cols, axis=1)
            blk = jnp.concatenate(
                [blk, jnp.zeros((3, 128 - ns), dtype)], axis=1)
            samples[...] = jnp.concatenate(
                [blk, jnp.zeros((5, 128), dtype)], axis=0)[None]
        else:
            samples[...] = jnp.zeros((1, 8, 128), dtype)

        tail[...] = jnp.zeros_like(tail)

        def tile_body(i, carry):
            tb = i * B
            Sv = Sres[:, pl.ds(tb, B)]
            Shalo = Sres[:, pl.ds(tb + B, H)]
            Kv = Kres[:, pl.ds(tb, B)]
            cvt = CVres[:, pl.ds(tb, B)]
            cvh = CVres[:, pl.ds(tb + B, H)]

            def wout(v):
                Sres[:, pl.ds(tb, B)] = v

            def wconv(v):
                CVres[:, pl.ds(tb, B)] = v

            body(Sv, Shalo, Kv, cvt, cvh, fm_r, None, None, tail,
                 nf, scr_va, scr_vb, write_out=wout,
                 write_conv=wconv)
            return carry

        jax.lax.fori_loop(0, T, tile_body, 0)

        if src_pos:
            sv = srcf[...]
            for l, p in enumerate(src_pos):
                Sres[0:3, p:p + 1] = (Sres[0:3, p:p + 1]
                                      + sv[0, 0:3, l:l + 1])

        @pl.when(t == CH - 1)
        def _():
            if interpret:
                Sfin[...] = Sres[:, :LEN]
                CVfin[...] = CVres[:, :LEN]
            else:
                for src, dst in ((Sres.at[:, :LEN], Sfin),
                                 (CVres.at[:, :LEN], CVfin)):
                    co = pltpu.make_async_copy(src, dst, sem)
                    co.start()
                    co.wait()

    cbytes = jnp.zeros((), conv_dtype).dtype.itemsize
    params = None
    if not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(resident_vmem_bytes(LEN, o7, dtype,
                                        conv_rows=R2s,
                                        conv_bytes=cbytes))
                + (8 << 20),
                127 * 1024 * 1024))
    call = pl.pallas_call(
        kernel,
        grid=(CH,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # S0
            pl.BlockSpec(memory_space=pl.ANY),          # CV0
            pl.BlockSpec(memory_space=pl.ANY),          # K
            pl.BlockSpec(fm.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                   jax.ShapeDtypeStruct((R2s, LEN), conv_dtype),
                   jax.ShapeDtypeStruct((CH, 8, 128), dtype)],
        scratch_shapes=[pltpu.VMEM((3, o7), dtype),
                        pltpu.VMEM((3, B + o7 + 128), dtype),
                        pltpu.VMEM(scr_v, sdt),
                        pltpu.VMEM(scr_vv, sdt),
                        pltpu.VMEM((8, LENR), dtype),
                        pltpu.VMEM((8, LEN), dtype),
                        pltpu.VMEM((R2s, LENR), conv_dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        compiler_params=params,
    )
    return lambda S, CV, K, srcf_pad: call(S, CV, K, fm, srcf_pad)


# ---------------------------------------------------------------------------
# Heterogeneous-Q BKT: node-basis general kernel + mixed-element epilogue
#
# The uniform-Q node-basis collapse (_make_bkt_uniform_kernel) needs ONE
# coefficient set; a real CVM's Qs(Vs) fit (psolve.c:7252-7311) gives
# per-element sets quantized to the <=18-row QTABLE, so production
# attenuation runs used to fall back to the corner-basis kernel (8x the
# convolution traffic).  Observation: the memory-variable recursion
# (calc_conv, damping.c:110-222) is driven purely by the NODE
# displacement -- the coefficients may vary per NODE with zero extra
# vector work (row-vector multiplies cost the same as scalar
# broadcasts).  So:
#
#   - assign every node the coefficient set of one adjacent element
#     (assign_bkt_node_coeffs), stream the 9 (shear; 18 full)
#     per-node recursion rows in a widened K block, and run the same
#     node-basis kernel dataflow;
#   - elements whose 8 corner nodes all carry the element's own set
#     (everything except one element plane per material interface in a
#     layered model) are then EXACT;
#   - the few "mixed" elements get an XLA epilogue: carry their
#     corner-basis state [R2, 8, M], recompute both the element-basis
#     and the node-basis damping vectors at their corners, and add
#     FM @ (mu_f (dvs_e - dvs_n)) through the same linear update --
#     restoring exactness (for matching corners the difference is
#     identically zero).
#
# mu_f / kappa_f (element material scales, damping.c:376-377) stay
# per-element rows applied to the gathered MXU operand, so arbitrary
# heterogeneous MATERIAL is exact in-kernel; only heterogeneous Q-bins
# touch the epilogue.
# ---------------------------------------------------------------------------

# per-channel recursion/combine coefficient row order of the node table
BKN_COEF = ("c1", "c2", "c3", "c4", "e0", "e1", "a0", "a1", "coef")


def bkn_coef_keys(shear_only: bool):
    """bkt-table keys of the per-element recursion rows, channel-major
    in BKN_COEF order (mu_f/kappa_f live in the K header instead)."""
    def chan(name):
        return [f"{name}_c1", f"{name}_c2", f"{name}_c3", f"{name}_c4",
                f"{name}_e0", f"{name}_e1", f"a0_{name}", f"a1_{name}",
                f"{name}_coef"]
    return chan("shear") + ([] if shear_only else chan("kappa"))


def assign_bkt_node_coeffs(coef_e, evalid, offs):
    """Node coefficient assignment for the general-Q node-basis kernel.

    coef_e: [RC, LEN] per-element recursion rows (zero at invalid
    columns).  Every node column gets the rows of one adjacent valid
    element (the last corner writer in ascending-j order -- on the
    z-major brick layout the element ABOVE an interface, so exactly one
    element plane per interface ends up mixed).  Returns
    (node_rows [RC, LEN], node_src [LEN] int64 source element column or
    -1, mixed_cols [M] element columns whose corners carry a foreign
    set, sets [nsets, RC] distinct coefficient sets, node_bin [LEN]
    set index per node with nsets = "no adjacent element")."""
    LEN = coef_e.shape[1]
    ecols = np.flatnonzero(np.asarray(evalid))
    node_src = np.full(LEN, -1, np.int64)
    for o in offs:
        node_src[ecols + o] = ecols
    # coefficient-set ids (identical values from different elements
    # dedupe, so e.g. a Q-uniform region never counts as mixed)
    sets, cid_e = np.unique(coef_e[:, ecols].T, axis=0,
                            return_inverse=True)
    cid = np.full(LEN, -1, np.int64)
    cid[ecols] = cid_e
    ns = np.maximum(node_src, 0)
    node_rows = np.where(node_src >= 0, coef_e[:, ns], 0.0)
    node_cid = np.where(node_src >= 0, cid[ns], -1)
    mixed = np.zeros(len(ecols), bool)
    for o in offs:
        mixed |= node_cid[ecols + o] != cid[ecols]
    node_bin = np.where(node_cid >= 0, node_cid, len(sets))
    return node_rows, node_src, ecols[mixed], sets, node_bin


def bkt_nodeq_tables(coef_e, muf, kaf, mm, invm, evalid, offs,
                     shear_only, dtype):
    """Device tables for the general-Q node-basis tier from padded
    per-element arrays (shared by the single-brick and multi-brick
    table builders).

    coef_e [RC, LEN]: per-element recursion rows (bkn_coef_keys order);
    muf/kaf/invm [LEN]; mm [3, LEN]; evalid [LEN] bool.  Returns a dict
    with the node assignment (always), "declined" (HT_BKT_NODEQ=0 or
    mixed fraction above HT_BKT_NODEQ_MAX_MIXED), and -- when accepted
    -- the K block and the mixed-element epilogue constants."""
    from ..physics.kmats import bkt_matrices_24

    LEN = coef_e.shape[1]
    node_rows, node_src, mixed, sets, node_bin = \
        assign_bkt_node_coeffs(coef_e, evalid, offs)
    out = {"node_src": node_src, "mixed_cols": mixed,
           "M": len(mixed), "declined": True,
           "sets": sets, "node_bin": node_bin.astype(np.float64)}
    n_valid = max(int(np.asarray(evalid).sum()), 1)
    max_mixed = float(os.environ.get("HT_BKT_NODEQ_MAX_MIXED", "0.25"))
    max_bins = int(os.environ.get("HT_BKT_NODEQ_MAX_BINS", "18"))
    # absolute cap: the per-step mixed-element XLA pass intermittently
    # faults the v5e runtime above ~8k elements (bisected on-chip;
    # reproduced in a pure-XLA gather+dot+scatter scan, so it is a
    # runtime issue, not a kernel bug) — decline to the corner-basis
    # kernel beyond it until the toolchain resolves it
    max_abs = int(os.environ.get("HT_BKT_NODEQ_MAX_MIXED_ABS", "8192"))
    # run coalescing: mixed elements of a layered model are whole
    # element PLANES of the brick — near-contiguous column ranges
    # broken only by the invalid node-row columns (the +1 node per
    # axis).  Coalescing across small gaps gives a handful of DENSE
    # ranges, and the epilogue becomes static slices (_bkt_mix_runs):
    # no gather, no scatter (the op the v5e runtime faults on at
    # large M), HBM-bandwidth execution — the absolute mixed cap then
    # only applies to the scattered-gather fallback.  Bridged columns
    # need no masking: invalid columns carry zero coefficients, and a
    # VALID un-mixed element's carried state recurses with exactly
    # the coefficients of its corners' node recursion, so its
    # correction muf*(dvs_e - dvs_n) is identically zero.
    mix_runs = None
    n_mixed_true = len(mixed)
    if len(mixed):
        gap_tol = int(os.environ.get("HT_BKT_MIX_GAP", "512"))
        max_runs = int(os.environ.get("HT_BKT_MIX_RUNS", "64"))
        brk = np.flatnonzero(np.diff(mixed) > gap_tol)
        rstarts = np.concatenate([[0], brk + 1])
        rends = np.concatenate([brk + 1, [len(mixed)]])
        spans = [(int(mixed[s]), int(mixed[e - 1]) + 1)
                 for s, e in zip(rstarts, rends)]
        width = sum(e - s for s, e in spans)
        if (len(spans) <= max_runs
                and width <= 2 * len(mixed) + 64 * len(spans)):
            # redefine the mixed set as the dense ranges (carry,
            # tables, and conversions all use the same column list)
            mixed = np.concatenate(
                [np.arange(s, e) for s, e in spans])
            mix_runs = []
            q = 0
            for s, e in spans:
                mix_runs.append((s, q, e - s))
                q += e - s
    # the DENSE set is canonical for carries AND conversions in both
    # the accepted and declined cases, so cross-basis restores of a
    # nodeq checkpoint always agree on the mix layout
    out["mixed_cols"] = mixed
    out["M"] = len(mixed)
    if (os.environ.get("HT_BKT_NODEQ", "1") == "0"
            or n_mixed_true > max_mixed * n_valid
            or (mix_runs is None and len(mixed) > max_abs)
            or len(sets) > max_bins):
        return out
    out["declined"] = False
    out["mix_runs"] = mix_runs
    f = lambda x: jnp.asarray(x, dtype)
    # K block (build_bkt_node_call layout): mass_minusaM 0:3,
    # inv_mass 3, mu_f 4, kappa_f 5, set index 6
    K = np.zeros((8, LEN))
    K[0:3] = mm
    K[3] = invm
    K[4] = muf
    K[5] = kaf
    K[6] = out["node_bin"]
    out["K"] = f(K)
    M = len(mixed)
    if M:
        idx24 = (np.asarray(offs, np.int64)[:, None]
                 + mixed[None, :])                        # [8, M]
        out["mix_idx"] = jnp.asarray(idx24, jnp.int32)
        out["mix_ce"] = f(coef_e[:, mixed][:, None, :])   # [RC, 1, M]
        out["mix_cn"] = f(node_rows[:, idx24])            # [RC, 8, M]
        out["mix_invm"] = f(invm[idx24])                  # [8, M]
        out["mix_muf"] = f(muf[mixed])                    # [M]
        out["mix_kaf"] = f(kaf[mixed])
        kmu, kk = bkt_matrices_24()
        fm = kmu if shear_only else np.concatenate([kmu, kk], axis=1)
        out["mix_fm"] = f(fm)
        # per-chunk sorted-segment scatter tables (see
        # bkt_mix_epilogue): the duplicate-index scatter-add becomes
        # a presorted segment-sum + a unique-sorted column add.
        # Only the scattered-gather fallback needs them
        sc = []
        if mix_runs is None:
            for s0, s1 in _mix_chunk_bounds(M):
                tgt = idx24[:, s0:s1].reshape(-1)
                perm = np.argsort(tgt, kind="stable")
                st = tgt[perm]
                uniq, seg = np.unique(st, return_inverse=True)
                sc.append((jnp.asarray(perm, jnp.int32),
                           jnp.asarray(seg, jnp.int32),
                           jnp.asarray(uniq, jnp.int32)))
        out["mix_sc"] = sc
    return out


def _mix_chunk_bounds(M):
    """Static slice bounds of the mixed-element epilogue: slices of
    <= HT_BKT_MIX_CHUNK elements (8192 default; single-shot passes
    above ~8k intermittently fault the v5e runtime), capped at 32
    slices to bound program growth."""
    chunk = int(os.environ.get("HT_BKT_MIX_CHUNK", 8192))
    nseg = -(-M // chunk)
    if nseg > 32:
        chunk = -(-M // 32)
    return [(s0, min(s0 + chunk, M)) for s0 in range(0, M, chunk)]


def _make_bkt_node_kernel(offs, B, o7, T, dtype, sets,
                          shear_only=False, conv_dtype=None,
                          chunk=None, interpret=False):
    """General-Q BKT kernel: node-basis memory variables with PER-NODE
    recursion coefficients.

    The coefficient sets take at most len(QTABLE) distinct values per
    brick, so instead of streaming RC coefficient rows (+ their halo --
    which blows the 16 MB scoped-VMEM budget at production tiles), the
    kernel streams a one-row SET INDEX and reconstructs each
    coefficient row as a masked sum of trace-time constants,
        cf_r = sum_b (bin == b) * sets[b][r]
    -- exactly one term is nonzero per node, so the rows equal the
    streamed-row values bit-for-bit.  The bin row rides in the conv
    carry's padding row R2 (the conv halo operand already streams it),
    so the K block stays 8 rows with NO halo: same VMEM and HBM
    footprint as the uniform-Q kernel, plus nsets*RC cheap row-MACs.

    K rows: mass_minusaM 0:3, inv_mass 3, mu_f 4, kappa_f 5, bin 6.
    mu_f/kappa_f scale the gathered MXU operand (per-element material,
    exact in-kernel)."""
    from ..physics.kmats import bkt_matrices_24

    if chunk is None:
        chunk = int(os.environ.get("HT_PALLAS_CHUNK", 4096))
    C = min(chunk, B)
    W0 = C + 128
    H = o7 + 128
    if conv_dtype is None:
        conv_dtype = dtype
    R2 = 6 if shear_only else 12
    R2s = 8 if shear_only else 16
    RC = 9 if shear_only else 18
    sets = [list(map(float, s)) for s in np.asarray(sets)]
    nb = len(sets)
    assert R2 < R2s, "no spare conv row for the bin index"

    kmu, kk = bkt_matrices_24()
    fm_np = np.concatenate([kmu, kk], axis=1)   # [24, 48]
    # 8-row-aligned dataflow (see _make_bkt_uniform_kernel); the
    # per-element mu_f/kappa_f operand scaling moves to the OUTPUT
    # side (column scalars commute with the row-mixing matmul):
    # Y = [kmu' ; kk'] @ X8, F = Y[:64]*mu + Y[64:]*ka
    a8 = os.environ.get("HT_BKT_ALIGN8", "1") == "1"
    s8 = a8 and os.environ.get("HT_BKT_SCATTER8", "0") == "1"
    # staged-bf16 b4 operand (see _make_bkt_uniform_kernel); the
    # per-field constants stay block-diagonal so Y splits into the
    # mu/ka output groups for the per-element material scaling
    bf16g = _bkt_bf16g(a8, dtype, interpret)
    p8 = (a8 and not bf16g
          and os.environ.get("HT_BKT_PRESHIFT8", "0") == "1")
    A8B = _align8_blocks(offs) if a8 else None
    NR = sorted({o % 128 for o in offs} - {0})
    if bf16g:
        a_mu = _align8_operator(kmu, offs, out8=s8)  # [24|64, 128]
        a_ka = _align8_operator(kk, offs, out8=s8)
        Z = np.zeros_like(a_mu)
        fm_np = np.concatenate(
            [np.concatenate([a_mu, Z], axis=1),
             np.concatenate([Z, a_ka], axis=1)],
            axis=0)                                  # [48|128, 256]
    elif a8:
        stack = np.zeros((48, 48))
        stack[0:24, 0:24] = kmu
        stack[24:48, 24:48] = kk
        fm_np = _align8_operator_cols(stack, offs, fields=2)
        if s8:
            fm_np = _align8_operator_rows(fm_np, offs)

    def roll(x, shift):
        if interpret:
            return jnp.roll(x, shift, axis=1)
        if x.dtype == jnp.bfloat16:
            # even-row bf16 blocks roll through an f32 bitcast view
            # (see _make_bkt_uniform_kernel's roll)
            assert x.shape[0] % 2 == 0
            v = pltpu.bitcast(x, jnp.float32)
            return pltpu.bitcast(pltpu.roll(v, jnp.int32(shift), 1),
                                 jnp.bfloat16)
        return pltpu.roll(x, jnp.int32(shift), 1)

    # [RC, nb] operand of the distinct coefficient sets (pallas
    # kernels may not capture array constants — it rides the call
    # like fm does).  For f32 runs the operand is pre-split into an
    # exact 3-term bf16 decomposition [RC, 3*nb] (cf3): the one-hot
    # contraction then runs as ONE default-precision bf16 dot whose
    # f32 accumulation reconstructs the coefficients bit-exactly
    # (one-hot entries are exact in bf16; A1+A2+A3 == A by
    # construction), replacing the 6-pass HIGHEST matmul.
    sets_f = np.asarray(sets, np.float64).T
    cf3 = (dtype == jnp.float32
           and os.environ.get("HT_BKT_CF3", "1") == "1")
    if cf3:
        sets_rc = _bf16_split3(sets_f.astype(np.float32))
        cf3 = sets_rc is not None
    if not cf3:
        sets_rc = sets_f.astype(np.dtype(jnp.zeros((), dtype).dtype))

    def cf_rows(binrow, sc):
        """[RC, W] per-node coefficient rows from the set index row
        (nodes with bin == nb -- no adjacent element -- get zeros).

        One-hot masks contracted against the set operand on the MXU:
        exactly one term per column is nonzero and the products are
        exact (cf3: bf16 halves x exact 0/1, f32 accumulate; else
        HIGHEST precision), so the rows equal the streamed-row
        values bit-for-bit — at ~1/RC'th the VPU cost of the masked
        row sums this replaces (round 5: the nodeq kernel was
        VPU-bound on exactly that masked reconstruction)."""
        if cf3:
            oh = jnp.concatenate(
                [(binrow == float(b)).astype(jnp.bfloat16)
                 for b in range(nb)], axis=0)          # [nb, W]
            oh3 = jnp.concatenate([oh, oh, oh], axis=0)
            return jax.lax.dot_general(
                sc, oh3, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
        oh = jnp.concatenate(
            [(binrow == float(b)).astype(dtype) for b in range(nb)],
            axis=0)                                    # [nb, W]
        return jax.lax.dot(sc, oh,
                           precision=jax.lax.Precision.HIGHEST)

    def rec(u3, up3, cv, cf):
        """(conv_next [R2, W], dvs [3, W], dvk [3, W]) node fields;
        cf [RC, W] = per-node coefficient rows (BKN_COEF per channel).
        Identical op order to _make_bkt_uniform_kernel's rec so the
        epilogue's XLA recomputation reproduces the kernel values."""
        du = u3 - up3
        s0, s1 = cv[0:3], cv[3:6]
        s0n = cf[1:2] * u3 + cf[0:1] * up3 + cf[4:5] * s0
        s1n = cf[3:4] * u3 + cf[2:3] * up3 + cf[5:6] * s1
        dvs = cf[8:9] * du + u3 - cf[6:7] * s0n - cf[7:8] * s1n
        if shear_only:
            return jnp.concatenate([s0n, s1n], axis=0), dvs, u3
        g = cf[9:18]
        k0, k1 = cv[6:9], cv[9:12]
        k0n = g[1:2] * u3 + g[0:1] * up3 + g[4:5] * k0
        k1n = g[3:4] * u3 + g[2:3] * up3 + g[5:6] * k1
        dvk = g[8:9] * du + u3 - g[6:7] * k0n - g[7:8] * k1n
        return jnp.concatenate([s0n, s1n, k0n, k1n], axis=0), dvs, dvk

    sdt = jnp.bfloat16 if bf16g else dtype
    nohalo = _bkt_nohalo() and H <= B
    abl = os.environ.get("HT_BKT_ABLATE", "")

    def body(Sv, Shalo, Kv, cvt, cvh, fm, sc, out, conv_out, tail,
             nf, scr_v, scr_vv):
        """One compute tile (see _make_bkt_uniform_kernel's body):
        cvh's row R2 carries the halo bin index so no K halo operand
        is needed in either dataflow."""
        nf[...] = jnp.zeros_like(nf)
        u, up = Sv[0:3], Sv[3:6]
        cvav = cvt.astype(dtype)
        cvbv = cvh.astype(dtype)
        scv = sc[...]

        if abl == "nocf":
            # measurement-only: price the one-hot coefficient
            # reconstruction by replacing it with a broadcast of
            # set 0 (wrong physics for every bin != 0)
            cf_t = jnp.broadcast_to(scv[:, 0:1], (RC, B)).astype(dtype)
            cf_h = jnp.broadcast_to(scv[:, 0:1], (RC, H)).astype(dtype)
        else:
            cf_t = cf_rows(Kv[6:7], scv)
            cf_h = cf_rows(cvbv[R2:R2 + 1], scv)
        cn_t, dvs_t, dvk_t = rec(u, up, cvav[:R2], cf_t)
        cn_h, dvs_h, dvk_h = rec(Shalo[0:3], Shalo[3:6],
                                 cvbv[:R2], cf_h)
        # padding rows carry the (constant) bin index so the halo
        # stream serves next tile's cf_rows without a K halo operand
        pad = jnp.zeros((R2s - R2 - 1, B), dtype)
        conv_out[...] = jnp.concatenate([cn_t, Kv[6:7], pad],
                                        axis=0).astype(conv_dtype)
        if bf16g:
            # (hi, lo, pad) bf16 field blocks: scr_v = dvs,
            # scr_vv = dvk (see _make_bkt_uniform_kernel)
            for dst, tv, hv in ((scr_v, dvs_t, dvs_h),
                                (scr_vv, dvk_t, dvk_h)):
                th = tv.astype(jnp.bfloat16)
                dst[0:3, :B] = th
                dst[3:6, :B] = (tv - th.astype(dtype)).astype(
                    jnp.bfloat16)
                hh = hv.astype(jnp.bfloat16)
                dst[0:3, B:] = hh
                dst[3:6, B:] = (hv - hh.astype(dtype)).astype(
                    jnp.bfloat16)
        else:
            scr_v[0:3, :B] = dvs_t
            scr_v[0:3, B:] = dvs_h
            scr_v[3:6, :B] = dvk_t
            scr_v[3:6, B:] = dvk_h
        pre = None
        if p8:
            sv = scr_v[...]
            for k, sh in enumerate(NR):
                scr_vv[8 * k:8 * k + 8] = roll(sv, B + H - sh)
            pre = {sh: 8 * k for k, sh in enumerate(NR)}

        muf = Kv[4:5]
        kaf = Kv[5:6]
        mode = _mxu_mode("highest")
        prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                else jax.lax.Precision.DEFAULT)
        for c0 in ([] if abl == "stream" else range(0, B, C)):
            # invalid elements have mu_f = kappa_f = 0, so no validity
            # row is needed -- the mu/ka scaling zeroes their force
            mu_c = muf[:, c0:c0 + C]
            ka_c = kaf[:, c0:c0 + C]
            if bf16g:
                Xs = _gather_blocks8(
                    lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B)
                Xk = _gather_blocks8(
                    lambda b: scr_vv[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B)
                X = jnp.concatenate([Xs, Xs, Xk, Xk], axis=0)
                Y = jax.lax.dot_general(
                    fm[...], X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                if s8:
                    F = Y[:64] * mu_c + Y[64:] * ka_c
                    _slot_scatter8(nf, F, A8B, roll, offs, c0, W0,
                                   dtype)
                    continue
                F = Y[:24] * mu_c + Y[24:] * ka_c
                Fv = jnp.concatenate(
                    [F, jnp.zeros((24, 128), dtype)], axis=1)
                rows = _class_rolled_rows(Fv, offs, roll)
                _merged_scatter(nf, rows, offs, c0, W0)
                continue
            if a8:
                X8 = _gather_blocks8(
                    lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, C,
                    W0, roll, A8B, pre=pre, pre_ref=scr_vv)
                Y = _mxu_dot(fm[...], X8, mode, prec)
                if s8:
                    F = Y[:64] * mu_c + Y[64:] * ka_c
                    _slot_scatter8(nf, F, A8B, roll, offs, c0, W0,
                                   dtype)
                    continue
                F = Y[:24] * mu_c + Y[24:] * ka_c
                Fv = jnp.concatenate(
                    [F, jnp.zeros((24, 128), dtype)], axis=1)
                rows = _class_rolled_rows(Fv, offs, roll)
                _merged_scatter(nf, rows, offs, c0, W0)
                continue
            wins = _gather_windows(
                lambda b: scr_v[:, pl.ds(b, W0)], offs, c0, W0, roll)
            wv = jnp.concatenate(
                [w[0:3, :C] * mu_c for w in wins]
                + [w[3:6, :C] * ka_c for w in wins], axis=0)
            F = _mxu_dot(fm[...], wv, mode, prec)
            Fv = jnp.concatenate([F, jnp.zeros((24, 128), dtype)],
                                 axis=1)
            rows = _class_rolled_rows(Fv, offs, roll)
            _merged_scatter(nf, rows, offs, c0, W0)

        force = jnp.concatenate(
            [nf[:, :o7] + tail[...], nf[:, o7:B]], axis=1)
        tail[...] = nf[:, B:B + o7]
        un = u + (force + Kv[0:3] * (u - up)) * Kv[3:4]
        out[...] = jnp.concatenate([un, u, Sv[6:8]], axis=0)

    def _zero_once(tail, scr_v, scr_vv):
        tail[...] = jnp.zeros_like(tail)
        if a8:
            scr_v[6:8, :] = jnp.zeros((2, B + H), sdt)
            if bf16g:
                scr_vv[6:8, :] = jnp.zeros((2, B + H), sdt)

    def kernel_halo(Sa, Sb, Ka, cva, cvb, fm, sc, out, conv_out,
                    tail, nf, scr_v, scr_vv):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            _zero_once(tail, scr_v, scr_vv)

        body(Sa[...], Sb[...][:, :H], Ka[...], cva[...],
             cvb[...][:, :H], fm, sc, out, conv_out, tail, nf,
             scr_v, scr_vv)

    def kernel_nohalo(Sa, Ka, cva, fm, sc, out, conv_out, tail, nf,
                      scr_v, scr_vv, Sp, cvp):
        """Delay-by-one pipelined dataflow (HT_BKT_NOHALO; see
        _make_bkt_uniform_kernel's kernel_nohalo)."""
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            _zero_once(tail, scr_v, scr_vv)

        @pl.when(t > 0)
        def _():
            body(Sp[...], Sa[...][:, :H], Ka[...], cvp[...],
                 cva[...][:, :H], fm, sc, out, conv_out, tail, nf,
                 scr_v, scr_vv)

        Sp[...] = Sa[...]
        cvp[...] = cva[...]

    kernel = kernel_nohalo if nohalo else kernel_halo
    return (kernel,
            jnp.asarray(fm_np, jnp.bfloat16 if bf16g else dtype),
            R2s, jnp.asarray(sets_rc))


def build_bkt_node_call(offs, B, o7, T, LEN, dtype, sets,
                        shear_only=False, conv_dtype=None,
                        interpret=False):
    """pallas_call for the general-Q node-basis BKT kernel:
    (S, S_halo, K, conv, conv_halo) -> (S_next [8, LEN],
    conv_next [R2s, LEN]).  K rows: mass_minusaM 0:3, inv_mass 3,
    mu_f 4, kappa_f 5, bin 6; conv row R2 carries the bin index (must
    be pre-filled by init/restore)."""
    kernel, fm, R2s, sc = _make_bkt_node_kernel(
        offs, B, o7, T, dtype, sets, shear_only=shear_only,
        conv_dtype=conv_dtype, interpret=interpret)
    if conv_dtype is None:
        conv_dtype = dtype
    blk = lambda t: (0, t)
    hb = _halo_block(B, o7)
    nh = B // hb
    blk1 = lambda t: (0, jnp.minimum((t + 1) * nh, T * nh - 1))
    # bricks whose stencil reach o7 is ~B/2 make every halo operand a
    # full extra tile; the double-buffered blocks then sit just above
    # Mosaic's default 16 MB scoped-VMEM budget -- raise the
    # per-kernel cap mildly (v5e has 128 MB VMEM/core)
    params = None
    if not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    a8 = os.environ.get("HT_BKT_ALIGN8", "1") == "1"
    bf16g = _bkt_bf16g(a8, dtype, interpret)
    p8 = (a8 and not bf16g
          and os.environ.get("HT_BKT_PRESHIFT8", "0") == "1")
    nohalo = _bkt_nohalo() and o7 + 128 <= B
    nshift = len({o % 128 for o in offs} - {0})
    sdt = jnp.bfloat16 if bf16g else dtype
    scr_v = ((8, B + o7 + 128) if a8 else (6, B + o7 + 128))
    scr_vv = ((8, B + o7 + 128) if bf16g else
              (8 * max(nshift, 1), B + o7 + 128) if p8 else (8, 128))
    scratch = [pltpu.VMEM((3, o7), dtype),
               pltpu.VMEM((3, B + o7 + 128), dtype),
               pltpu.VMEM(scr_v, sdt),
               pltpu.VMEM(scr_vv, sdt)]
    if nohalo:
        blkc = lambda t: (0, jnp.maximum(t - 1, 0))
        blks = lambda t: (0, jnp.minimum(t, T - 1))
        call = pl.pallas_call(
            kernel,
            grid=(T + 1,),
            in_specs=[
                pl.BlockSpec((8, B), blks),
                pl.BlockSpec((8, B), blkc),
                pl.BlockSpec((R2s, B), blks),
                pl.BlockSpec(fm.shape, lambda t: (0, 0)),
                pl.BlockSpec(sc.shape, lambda t: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((8, B), blkc),
                       pl.BlockSpec((R2s, B), blkc)],
            out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                       jax.ShapeDtypeStruct((R2s, LEN), conv_dtype)],
            scratch_shapes=scratch + [
                pltpu.VMEM((8, B), dtype),
                pltpu.VMEM((R2s, B), conv_dtype)],
            interpret=interpret,
            compiler_params=params,
        )
        return lambda S, Sb, K, cv, cvb: call(S, K, cv, fm, sc)
    call = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, B), blk), pl.BlockSpec((8, hb), blk1),
            pl.BlockSpec((8, B), blk),
            pl.BlockSpec((R2s, B), blk), pl.BlockSpec((R2s, hb), blk1),
            pl.BlockSpec(fm.shape, lambda t: (0, 0)),
            pl.BlockSpec(sc.shape, lambda t: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((8, B), blk),
                   pl.BlockSpec((R2s, B), blk)],
        out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                   jax.ShapeDtypeStruct((R2s, LEN), conv_dtype)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )
    return lambda S, Sb, K, cv, cvb: call(S, Sb, K, cv, cvb, fm, sc)


def detect_bkt_uniform(bkt_tables, eidx, evalid, shear_only):
    """One coefficient set across the valid elements of a (sub)plan
    slice -> {row_name: float} for the node-basis uniform-Q kernel
    (_make_bkt_uniform_kernel), else None (also None when the slice
    has no valid element)."""
    if not np.any(evalid):
        return None
    scal = {}
    for k in bk_row_names(shear_only):
        v = np.asarray(bkt_tables[k])[eidx][evalid]
        if v.size and np.all(v == v[0]):
            scal[k] = float(v[0])
        else:
            return None
    return scal


def conv_corner_to_node(offs, evalid, conv_corner):
    """Corner-basis conv [R, LEN] -> node-basis [R2, LEN] (uniform Q).

    Under one coefficient set the (element, corner-j) variable equals
    the node field at column e + offs[j]; all corners of all valid
    elements agree, so any one determines the node value."""
    conv_corner = np.asarray(conv_corner, np.float64)
    R, LEN = conv_corner.shape
    nvar = R // 24
    out = np.zeros((3 * nvar, LEN))
    seen = np.zeros(LEN, bool)
    e = np.flatnonzero(np.asarray(evalid))
    for j, o in enumerate(offs):
        cols = e + o
        take = ~seen[cols]
        for v in range(nvar):
            out[3 * v:3 * v + 3, cols[take]] = \
                conv_corner[24 * v + 3 * j:24 * v + 3 * j + 3,
                            e[take]]
        seen[cols[take]] = True
    return out


def conv_node_to_corner(offs, evalid, conv_node, R):
    """Node-basis conv [>=R2, LEN] -> corner basis [R, LEN]."""
    conv_node = np.asarray(conv_node, np.float64)
    LEN = conv_node.shape[1]
    nvar = R // 24
    out = np.zeros((R, LEN))
    e = np.flatnonzero(np.asarray(evalid))
    for j, o in enumerate(offs):
        for v in range(nvar):
            out[24 * v + 3 * j:24 * v + 3 * j + 3, e] = \
                conv_node[3 * v:3 * v + 3, e + o]
    return out


def conv_corner_to_nodeq(offs, node_src, conv_corner):
    """Corner-basis conv [R, LEN] -> the general-Q node basis
    [R2, LEN]: node n takes the variable of its ASSIGNED element
    node_src[n] at the corner j with n = node_src[n] + offs[j] -- the
    one the node-basis recursion would have produced (exact, unlike
    the any-corner pick of conv_corner_to_node under heterogeneous
    Q)."""
    conv_corner = np.asarray(conv_corner, np.float64)
    R, LEN = conv_corner.shape
    nvar = R // 24
    out = np.zeros((3 * nvar, LEN))
    node_src = np.asarray(node_src)
    n_all = np.flatnonzero(node_src >= 0)
    for j, o in enumerate(offs):
        n = n_all[node_src[n_all] == n_all - o]
        for v in range(nvar):
            out[3 * v:3 * v + 3, n] = \
                conv_corner[24 * v + 3 * j:24 * v + 3 * j + 3, n - o]
    return out


def conv_mix_of_corner(offs, mixed_cols, conv_corner):
    """Corner-basis conv -> the mixed-element epilogue carry
    [R2, 8, M] (element-basis state of the mixed elements)."""
    conv_corner = np.asarray(conv_corner, np.float64)
    nvar = conv_corner.shape[0] // 24
    M = len(mixed_cols)
    out = np.zeros((3 * nvar, 8, M))
    for j in range(8):
        for v in range(nvar):
            out[3 * v:3 * v + 3, j, :] = \
                conv_corner[24 * v + 3 * j:24 * v + 3 * j + 3,
                            mixed_cols]
    return out


def conv_nodeq_to_corner(offs, evalid, mixed_cols, conv_node, conv_mix,
                         R):
    """(node-basis conv, mixed-element carry) -> corner basis [R, LEN]
    (exact: non-mixed corners read the node field, mixed elements read
    their epilogue state)."""
    out = conv_node_to_corner(offs, evalid, conv_node, R)
    if conv_mix is not None and len(mixed_cols):
        cm = np.asarray(conv_mix, np.float64)
        nvar = R // 24
        for j in range(8):
            for v in range(nvar):
                out[24 * v + 3 * j:24 * v + 3 * j + 3, mixed_cols] = \
                    cm[3 * v:3 * v + 3, j, :]
    return out


class PallasBrickTables:
    """Padded device tables + geometry for the fused kernel."""

    def __init__(self, plan, tables, src_ids=None, st_nodes=None,
                 st_phi=None, dtype=jnp.float32, tile=None):
        assert plan_applies(plan, tables.damping)
        b = plan.bricks[0]
        offs = tuple(b.corner_offsets())
        o7 = offs[7]
        nb, S = b.nb, b.nb - o7
        B, T, LEN = pallas_geometry(offs, nb, tile)
        self.B, self.o7, self.T, self.LEN = B, o7, T, LEN
        self.offs = offs
        self.nb, self.S = nb, S
        self.dtype = dtype

        g = plan.gnid_cat
        f = lambda x: jnp.asarray(x, dtype)

        def pad1(x, fill=0.0):
            out = np.full(LEN, fill, np.float64)
            out[:len(x)] = x
            return out

        def etab_arr(v):
            return np.where(plan.evalid_cat, v[plan.eidx_cat], 0.0)

        def etab(k):
            return etab_arr(getattr(tables, k))

        # element-validity mask over the padded columns (needed by the
        # BKT tier detection below and by conv basis conversions)
        self.evalid = np.zeros(LEN, bool)
        self.evalid[:len(plan.evalid_cat)] = plan.evalid_cat

        self.damping = tables.damping
        self.tier, self.kco = "general", None
        if tables.damping == "bkt":
            self.bkt_shear_only = bkt_kappa_zero(tables.bkt)
            self.bk = f(np.stack(
                [pad1(etab_arr(tables.bkt[k]))
                 for k in bk_row_names(self.bkt_shear_only)]))
            self.cm = None
            self.conv_rows = 48 if self.bkt_shear_only else 96
            self.conv_dtype = bkt_conv_dtype(dtype)
            # uniform-Q tier: one coefficient set across all valid
            # elements -> node-basis memory variables (8x less conv
            # traffic; see _make_bkt_uniform_kernel)
            self.bkt_uniform, self.bk_scal = False, None
            self.bkt_nodeq = False
            self.mix_M = 0
            if os.environ.get("HT_BKT_UNIFORM", "1") != "0":
                scal = detect_bkt_uniform(tables.bkt, plan.eidx_cat,
                                          plan.evalid_cat,
                                          self.bkt_shear_only)
                if scal is not None:
                    self.bkt_uniform = True
                    self.bk_scal = scal
                    # node-basis state dims (conv_rows/conv_dtype stay
                    # the corner-basis values for the legacy kernel):
                    # shear-only 8 f32 rows = one physical tile, the
                    # same bytes bf16 padding would take, at full
                    # precision; the 16-row full state keeps bf16
                    self.conv_rows_node = 8 if self.bkt_shear_only \
                        else 16
                    self.conv_dtype_node = (
                        dtype if self.bkt_shear_only
                        else bkt_conv_dtype(dtype))
            if not self.bkt_uniform:
                self._init_bkt_nodeq(plan, tables, f, pad1, etab_arr)
        else:
            c1, c2, c3 = etab("c1"), etab("c2"), etab("c3")
            # c3 = beta*c1 and c4 = beta*c2 with the same beta = b*dt
            # (element_coefficients, consts.py; psolve.c:3387-3409), so
            # the kernel streams (c1, c2, beta) -- 3 rows instead of 4
            beta = np.divide(c3, c1, out=np.zeros_like(c1),
                             where=c1 != 0)
            cm = np.stack([pad1(c1), pad1(c2), pad1(beta)])
            self.cm = f(cm)
            self.bk = None
            self.tier, self.kco = _tier_kco(c1, c2, beta,
                                            plan.evalid_cat)
        mm = np.stack([pad1(tables.mass_minusaM[g][:, c])
                       for c in range(3)])
        self.mm = f(mm)
        self.invm = f(pad1(tables.inv_mass[g]))[None, :]
        # validity as a streamed row, for kernels whose coefficients
        # are trace-time scalars (uniform-Q BKT)
        self.evalid_row = f(self.evalid.astype(np.float64))[None, :]

        self.f1e, self.f2e = spectral_factors()
        self.dd = diag_dd(self.f1e, self.f2e, dtype)

        self.src_pos = None
        if src_ids is not None and len(src_ids):
            uniq, first = np.unique(g, return_index=True)
            pos = first[np.searchsorted(uniq, src_ids)]
            assert (g[pos] == src_ids).all()
            self.src_pos = jnp.asarray(pos, jnp.int32)
        self.st_pos = self.st_phi = None
        if st_nodes is not None:
            uniq, first = np.unique(g, return_index=True)
            pos = first[np.searchsorted(uniq, np.asarray(st_nodes).ravel())]
            self.st_pos = jnp.asarray(
                pos.reshape(np.shape(st_nodes)), jnp.int32)
            self.st_phi = f(st_phi)

    def _init_bkt_nodeq(self, plan, tables, f, pad1, etab_arr):
        """Heterogeneous-Q node-basis tier (see the module block above
        _make_bkt_node_kernel): per-node coefficient rows + the
        mixed-element epilogue tables.  Declines (keeping the
        corner-basis fallback) when the mixed fraction exceeds
        HT_BKT_NODEQ_MAX_MIXED -- the epilogue's gather/scatter cost
        then outweighs the 8x convolution-traffic saving."""
        shear_only = self.bkt_shear_only
        coef_e = np.stack([pad1(etab_arr(tables.bkt[k]))
                           for k in bkn_coef_keys(shear_only)])
        muf = pad1(etab_arr(tables.bkt["mu_f"]))
        kaf = pad1(etab_arr(tables.bkt["kappa_f"]))
        invm = pad1(tables.inv_mass[plan.gnid_cat])
        mm = np.stack([pad1(tables.mass_minusaM[plan.gnid_cat][:, c])
                       for c in range(3)])
        nq = bkt_nodeq_tables(coef_e, muf, kaf, mm, invm, self.evalid,
                              self.offs, shear_only, self.dtype)
        # assignment + mixed set are kept even when the tier is
        # declined: exact conv-basis conversions on restore need them
        self.bkn_node_src = nq["node_src"]
        self.bkn_mixed_cols = nq["mixed_cols"]
        if nq["declined"]:
            return
        self.bkt_nodeq = True
        self.mix_M = nq["M"]
        self.conv_rows_node = 8 if shear_only else 16
        self.conv_dtype_node = (self.dtype if shear_only
                                else bkt_conv_dtype(self.dtype))
        self.bkn_K = nq["K"]
        self.bkn_sets = nq["sets"]
        self.bkn_bin = nq["node_bin"]
        self.mix_runs = nq.get("mix_runs")
        if nq["M"]:
            for k in ("mix_idx", "mix_ce", "mix_cn", "mix_invm",
                      "mix_muf", "mix_kaf", "mix_fm", "mix_sc"):
                setattr(self, k, nq[k])


def _tier_kco(c1, c2, beta, valid):
    """(tier, (c1s, c2s, beta_s)) for the kernel specialization."""
    tier = detect_tier(c1, c2, beta, valid)
    if tier == "general" or not np.any(valid):
        return ("general", None)
    i = int(np.flatnonzero(valid)[0])
    return (tier, (float(c1[i]), float(c2[i]), float(beta[i])))


def build_call(offs, B, o7, T, LEN, f1e, f2e, dtype, interpret=False,
               tier="general", kco=None):
    """The pallas_call for one brick: (u, u, up, up, cm, mm, invm, dd)
    -> u_next [3, LEN].  tier/kco: see detect_tier."""
    kernel, am, _ = _make_kernel(offs, B, o7, T, f1e, f2e, dtype,
                              interpret=interpret, tier=tier, kco=kco)
    C, packed = _kernel_mode(B)
    # scratch shapes mirror the kernel's dataflow modes (_modes);
    # align8 never touches scr_w/scr_f (value-concat gather + value
    # scatter) -- token-size them to keep VMEM headroom for big chunks
    modes = _modes(tier, dtype, packed)
    live = packed and not (modes["align8"] and _use_mxu())
    scr_w = (24, C) if live else (8, 128)
    scr_f = (24, C + 128) if live else (8, 128)
    staged, bf16g = modes["staged"], modes["bf16g"] and _use_mxu()
    align8 = modes["align8"] and _use_mxu()
    scr_s_dtype = jnp.bfloat16 if bf16g else dtype
    srows = 8 if align8 else (6 if bf16g else 3)
    scr_s = (srows, B + o7 + 128) if staged else (8, 128)
    # the preshift scratch is only read when HT_PALLAS_PRESHIFT=1
    # (off by default); keep it token-sized otherwise so it doesn't
    # eat into the 16 MB scoped-VMEM headroom
    preshift = modes["preshift"]
    pre8 = modes["pre8"] and _use_mxu()
    nshift = len({o % 128 for o in offs} - {0})
    if pre8:
        scr_sv = (8 * nshift, B + o7 + 128)
        scr_sv_dtype = jnp.bfloat16
    else:
        scr_sv = ((max(3 * nshift, 8), B + o7 + 128) if preshift
                  else (8, 128))
        scr_sv_dtype = dtype
    blk = lambda t: (0, t)
    # the +1-tile halo operand streams only the first hb columns of
    # the next tile (the stencil reach), not a full B-wide block
    hb = _halo_block(B, o7)
    nh = B // hb
    blk1 = lambda t: (0, jnp.minimum((t + 1) * nh, T * nh - 1))
    call = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((3, B), blk), pl.BlockSpec((3, hb), blk1),
            pl.BlockSpec((3, B), blk), pl.BlockSpec((3, hb), blk1),
            pl.BlockSpec((3, B), blk),
            pl.BlockSpec((3, B), blk),
            pl.BlockSpec((1, B), blk),
            pl.BlockSpec((48, 1), lambda t: (0, 0)),
            pl.BlockSpec(am.shape, lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, B), blk),
        out_shape=jax.ShapeDtypeStruct((3, LEN), dtype),
        scratch_shapes=[pltpu.VMEM((3, o7), dtype),
                        pltpu.VMEM((3, B + o7 + 128), dtype),
                        pltpu.VMEM(scr_s, scr_s_dtype),
                        pltpu.VMEM(scr_sv, scr_sv_dtype),
                        pltpu.VMEM(scr_w, dtype),
                        pltpu.VMEM(scr_f, dtype)],
        interpret=interpret,
    )
    return lambda *args: call(*args, am)


def build_call_packed(offs, B, o7, T, LEN, f1e, f2e, dtype,
                      interpret=False, tier="general", kco=None):
    """Packed-state pallas_call: (S, S(t+1), K, dd) -> S_next, with
    S [8, LEN] = (u 0:3, up 3:6) and K [8, LEN] = (c1, c2, beta,
    mass_minusaM, inv_mass).  Halves the physical HBM traffic of
    build_call (see _make_kernel packed_state)."""
    return _build_call_packed_impl(offs, B, o7, T, LEN, f1e, f2e,
                                   dtype, interpret, tier, kco)


def _packed_scratches(offs, B, o7, dtype, tier):
    """Scratch list of the packed elastic kernel (must mirror
    _make_kernel's dataflow modes; align8 never touches scr_w/scr_f
    -- value-concat gather + value scatter -- so those are
    token-sized to keep VMEM headroom for big chunks)."""
    C, packed = _kernel_mode(B)
    modes = _modes(tier, dtype, packed)
    live = packed and not (modes["align8"] and _use_mxu())
    scr_w = (24, C) if live else (8, 128)
    scr_f = (24, C + 128) if live else (8, 128)
    staged, bf16g = modes["staged"], modes["bf16g"] and _use_mxu()
    align8 = modes["align8"] and _use_mxu()
    scr_s_dtype = jnp.bfloat16 if bf16g else dtype
    srows = 8 if align8 else (6 if bf16g else 3)
    scr_s = (srows, B + o7 + 128) if staged else (8, 128)
    preshift = modes["preshift"]
    pre8 = modes["pre8"] and _use_mxu()
    nshift = len({o % 128 for o in offs} - {0})
    if pre8:
        scr_sv = (8 * nshift, B + o7 + 128)
        scr_sv_dtype = jnp.bfloat16
    else:
        scr_sv = ((max(3 * nshift, 8), B + o7 + 128) if preshift
                  else (8, 128))
        scr_sv_dtype = dtype
    return [pltpu.VMEM((3, o7), dtype),
            pltpu.VMEM((3, B + o7 + 128), dtype),
            pltpu.VMEM(scr_s, scr_s_dtype),
            pltpu.VMEM(scr_sv, scr_sv_dtype),
            pltpu.VMEM(scr_w, dtype),
            pltpu.VMEM(scr_f, dtype)]


def resident_vmem_bytes(LEN, o7, dtype=jnp.float32, conv_rows=0,
                        conv_bytes=2):
    """Approximate VMEM footprint of the resident time loop: the
    state + constants live in scratch for the whole chunk."""
    Hp = -(-(o7 + 128) // 128) * 128
    esz = jnp.zeros((), dtype).dtype.itemsize
    b = 8 * (LEN + Hp) * esz            # Sres
    b += 8 * LEN * esz                  # Kres
    if conv_rows:
        b += conv_rows * (LEN + Hp) * conv_bytes
    return b + (6 << 20)                # tile scratches + temps


def build_resident_call(offs, B, o7, T, LEN, f1e, f2e, dtype, CH,
                        tier="general", kco=None, src_pos=(),
                        st_pos=None, st_phi=None, interpret=False):
    """VMEM-RESIDENT time loop: the whole CH-step scan runs inside
    ONE pallas kernel with the packed state S and the constant block
    K held in VMEM scratch for the entire chunk — ZERO per-step HBM
    state traffic (v5e has 128 MB VMEM/core; a <=1.4M-node brick's
    S+K is ~75 MB, which is exactly the per-chip shard size class of
    pod-scale runs, psolve.c's per-rank mesh).  The streaming packed
    kernel moves 146.8 MB/step at the 1M bench and is DMA-bound at
    ~283 us/step; here the per-step cost is pure compute.

    grid = (CH,); S enters/leaves via one DMA per chunk (HBM-space
    operands); per step only the source-force row streams in and the
    station-sample row streams out.  Source/station node positions
    are trace-time constants (static single-column slices).  The
    per-tile compute is the IDENTICAL make_run body the streaming
    kernel uses — same float sequence, bit-identical trajectories.

    Returns advance(S [8, LEN], K [8, LEN], dd, srcf_pad
    [CH, 8, 128]) -> (S' [8, LEN], samples [CH, 8, 128]); srcf_pad
    rows 0:3 = force comps, column l = source l (pre-scaled by dt^2
    and inv_mass); samples rows 0:3 at column s = station s's
    pre-step phi-weighted displacement."""
    _, am, mk_run = _make_kernel(offs, B, o7, T, f1e, f2e, dtype,
                                 interpret=interpret, tier=tier,
                                 kco=kco, packed_state=True)
    modes = _modes(tier, dtype, True)
    use_mxu = _use_mxu()
    align8 = modes["align8"] and use_mxu
    H = o7 + 128
    Hp = -(-H // 128) * 128
    LENR = LEN + Hp
    src_pos = [int(p) for p in np.asarray(src_pos).reshape(-1)]
    ns = 0 if st_pos is None else len(st_pos)
    if ns:
        st_pos = np.asarray(st_pos, np.int64).reshape(ns, -1)
        st_phi = np.asarray(st_phi, np.float64).reshape(ns, -1)
    assert len(src_pos) <= 128 and ns <= 128

    def kernel(S0, K0, dd, am_r, srcf, Sfin, samples, tail, nf,
               scr_s, scr_sv, scr_w, scr_f, Sres, Kres, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if interpret:
                Sres[:, :LEN] = S0[...]
                Kres[...] = K0[...]
            else:
                cp = pltpu.make_async_copy(S0, Sres.at[:, :LEN], sem)
                cp.start()
                cp.wait()
                ck = pltpu.make_async_copy(K0, Kres, sem)
                ck.start()
                ck.wait()
            # halo padding beyond LEN: read by the last tile's
            # stencil, masked by element validity — zero once
            Sres[:, LEN:] = jnp.zeros((8, Hp), dtype)
            if align8:
                scr_s[6:8, :] = jnp.zeros(
                    (2, B + o7 + 128), jnp.bfloat16)

        # pre-step station samples (the scan driver samples the carry
        # before stepping)
        if ns:
            cols = []
            for s in range(ns):
                acc = None
                for j in range(st_pos.shape[1]):
                    p = int(st_pos[s, j])
                    w = float(st_phi[s, j])
                    v = w * Sres[0:3, p:p + 1]
                    acc = v if acc is None else acc + v
                cols.append(acc)
            blk = jnp.concatenate(cols, axis=1)        # [3, ns]
            blk = jnp.concatenate(
                [blk, jnp.zeros((3, 128 - ns), dtype)], axis=1)
            samples[...] = jnp.concatenate(
                [blk, jnp.zeros((5, 128), dtype)], axis=0)[None]
        else:
            samples[...] = jnp.zeros((1, 8, 128), dtype)

        # one explicit time step: the per-tile sweep over the
        # resident state, identical body to the streaming kernel
        amv = am_r[...] if use_mxu else None
        run = mk_run(dd, amv, None, tail, nf, scr_s, scr_sv, scr_w,
                     scr_f)
        tail[...] = jnp.zeros_like(tail)

        def tile_body(i, carry):
            tb = i * B
            Sv = Sres[:, pl.ds(tb, B)]
            Sbv = Sres[:, pl.ds(tb + B, H)]
            Kv = Kres[:, pl.ds(tb, B)]

            def wout(v):
                Sres[:, pl.ds(tb, B)] = v

            run(Sv, Sbv, Sv[0:3], Sv[3:6], Sbv[0:3], Sbv[3:6],
                Kv[0:3], Kv[3:6], Kv[6:7], write_out=wout)
            return carry

        jax.lax.fori_loop(0, T, tile_body, 0)

        # source injection (post-step, matching the scan driver's
        # Sn.at[src].add): static single-column slice adds
        if src_pos:
            sv = srcf[...]
            for l, p in enumerate(src_pos):
                Sres[0:3, p:p + 1] = (Sres[0:3, p:p + 1]
                                      + sv[0, 0:3, l:l + 1])

        @pl.when(t == CH - 1)
        def _():
            if interpret:
                Sfin[...] = Sres[:, :LEN]
            else:
                co = pltpu.make_async_copy(Sres.at[:, :LEN], Sfin,
                                           sem)
                co.start()
                co.wait()

    scratch = _packed_scratches(offs, B, o7, dtype, tier) + [
        pltpu.VMEM((8, LENR), dtype),
        pltpu.VMEM((8, LEN), dtype),
        pltpu.SemaphoreType.DMA(()),
    ]
    params = None
    if not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(resident_vmem_bytes(LEN, o7, dtype) + (8 << 20)),
                127 * 1024 * 1024))
    call = pl.pallas_call(
        kernel,
        grid=(CH,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # S0
            pl.BlockSpec(memory_space=pl.ANY),          # K
            pl.BlockSpec((48, 1), lambda t: (0, 0)),
            pl.BlockSpec(am.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),   # S final
                   pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, LEN), dtype),
                   jax.ShapeDtypeStruct((CH, 8, 128), dtype)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )
    return lambda S, K, dd, srcf_pad: call(S, K, dd, am, srcf_pad)


def _build_call_packed_impl(offs, B, o7, T, LEN, f1e, f2e, dtype,
                            interpret, tier, kco):
    kernel, am, _ = _make_kernel(offs, B, o7, T, f1e, f2e, dtype,
                              interpret=interpret, tier=tier, kco=kco,
                              packed_state=True)
    scratch = _packed_scratches(offs, B, o7, dtype, tier)
    blk = lambda t: (0, t)
    # halo operand narrowed to the stencil reach (see build_call)
    hb = _halo_block(B, o7)
    nh = B // hb
    blk1 = lambda t: (0, jnp.minimum((t + 1) * nh, T * nh - 1))
    # in-place S: out block t only depends on S blocks >= t and the
    # ascending grid writes strictly behind every read, so aliasing
    # the state stream is exact; measured faster on v5e (read+write
    # to the same pages, see tools/hbm_ceiling.py "aliased")
    alias = (os.environ.get("HT_PALLAS_ALIAS", "0") == "1"
             and not interpret)
    nohalo = _elastic_nohalo() and o7 + 128 <= B
    if nohalo:
        # delay-by-one pipeline (see _make_kernel): grid T+1, S
        # streams at t, K/out at t-1, no separate halo operand
        blkc = lambda t: (0, jnp.maximum(t - 1, 0))
        blks = lambda t: (0, jnp.minimum(t, T - 1))
        call = pl.pallas_call(
            kernel,
            grid=(T + 1,),
            in_specs=[
                pl.BlockSpec((8, B), blks),
                pl.BlockSpec((8, B), blkc),
                pl.BlockSpec((48, 1), lambda t: (0, 0)),
                pl.BlockSpec(am.shape, lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, B), blkc),
            out_shape=jax.ShapeDtypeStruct((8, LEN), dtype),
            scratch_shapes=scratch + [pltpu.VMEM((8, B), dtype)],
            interpret=interpret,
        )
        return lambda S, Sb, K, dd: call(S, K, dd, am)
    call = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, B), blk), pl.BlockSpec((8, hb), blk1),
            pl.BlockSpec((8, B), blk),
            pl.BlockSpec((48, 1), lambda t: (0, 0)),
            pl.BlockSpec(am.shape, lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, B), blk),
        out_shape=jax.ShapeDtypeStruct((8, LEN), dtype),
        input_output_aliases={0: 0} if alias else {},
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return lambda *args: call(*args, am)


def pallas_geometry(offs, nb, tile=None):
    """(B, T, LEN) padded tiling for a brick with nb nodes."""
    import os
    if tile is None:
        tile = int(os.environ.get("HT_PALLAS_TILE", 32768))
    o7 = offs[7]
    B = tile
    # the halo window reaches o7 + 128 into the next tile (region()
    # reads [start, start + C + 128) with start up to B - C + o7), so
    # the tile must cover it
    while B < o7 + 129:
        B *= 2
    T = int(np.ceil(nb / B)) + 1
    return B, T, T * B


def make_pallas_step(pt: PallasBrickTables, interpret=False):
    """scan-able step with the same carry/x contract as the XLA brick
    step: carry = (u, up) (elastic) or (u, up, conv) (BKT, conv in the
    nodal corner basis [96, LEN]), x = (srcf [L,3] dt^2-scaled, step_idx).

    Returns (step, consts): step(consts, carry, x) takes the node-scale
    device tables as an explicit argument so they lower as program
    parameters, not HLO literals (closure capture embeds them in the
    serialized module, which breaks remote compilation at production
    mesh sizes)."""
    B, o7, T, LEN = pt.B, pt.o7, pt.T, pt.LEN
    dtype = pt.dtype
    bkt = pt.damping == "bkt"
    if bkt:
        call = build_bkt_call(pt.offs, B, o7, T, LEN, dtype,
                              shear_only=pt.bkt_shear_only,
                              conv_dtype=pt.conv_dtype,
                              interpret=interpret)
        consts = {"bk": pt.bk, "mm": pt.mm, "invm": pt.invm}
    else:
        call = build_call(pt.offs, B, o7, T, LEN, pt.f1e, pt.f2e, dtype,
                          interpret=interpret, tier=pt.tier, kco=pt.kco)
        consts = {"cm": pt.cm, "mm": pt.mm, "invm": pt.invm}

    def step(cd, carry, x):
        srcf, step_idx = x
        u, up = carry[0], carry[1]
        if pt.st_pos is not None:
            sample = jnp.einsum("sn,csn->sc", pt.st_phi, u[:, pt.st_pos])
        else:
            sample = jnp.zeros((0, 3), dtype)
        if bkt:
            un, conv = call(u, u, up, up, cd["bk"], cd["mm"],
                            cd["invm"], carry[2])
        else:
            un = call(u, u, up, up, cd["cm"], cd["mm"], cd["invm"],
                      pt.dd)
        if pt.src_pos is not None:
            un = un.at[:, pt.src_pos].add(
                srcf.T * cd["invm"][0][pt.src_pos][None, :])
        out = (un, u, conv) if bkt else (un, u)
        return out, sample

    return step, consts


def make_packed_pallas_step(pt: PallasBrickTables, interpret=False):
    """Packed-state variant of make_pallas_step: carry = (S,) with
    S [8, LEN] = (u 0:3, up 3:6) — elastic — or (S, conv) for
    uniform-Q BKT (node-basis conv, _make_bkt_uniform_kernel).  Same
    physics, half the physical HBM bytes per step (see _make_kernel
    packed_state)."""
    if pt.damping == "bkt":
        if getattr(pt, "bkt_nodeq", False):
            return _make_packed_bkt_node_step(pt, interpret=interpret)
        assert pt.bkt_uniform, \
            "packed BKT requires the uniform-Q or general node tier"
        return _make_packed_bkt_uniform_step(pt, interpret=interpret)
    B, o7, T, LEN = pt.B, pt.o7, pt.T, pt.LEN
    dtype = pt.dtype
    K = jnp.concatenate([pt.cm, pt.mm, pt.invm,
                         jnp.zeros((1, LEN), dtype)], axis=0)
    call = build_call_packed(pt.offs, B, o7, T, LEN, pt.f1e, pt.f2e,
                             dtype, interpret=interpret, tier=pt.tier,
                             kco=pt.kco)
    consts = {"K": K}

    def step(cd, carry, x):
        srcf, _step = x
        S = carry[0]
        if pt.st_pos is not None:
            sample = jnp.einsum("sn,csn->sc", pt.st_phi,
                                S[0:3][:, pt.st_pos])
        else:
            sample = jnp.zeros((0, 3), dtype)
        Sn = call(S, S, cd["K"], pt.dd)
        if pt.src_pos is not None:
            Sn = Sn.at[0:3, pt.src_pos].add(
                srcf.T * cd["K"][6][pt.src_pos][None, :])
        return (Sn,), sample

    return step, consts


def _make_packed_bkt_uniform_step(pt: PallasBrickTables,
                                  interpret=False):
    """Uniform-Q BKT packed step: carry = (S [8, LEN],
    conv [R2s, LEN] node basis)."""
    B, o7, T, LEN = pt.B, pt.o7, pt.T, pt.LEN
    dtype = pt.dtype
    K = jnp.concatenate([pt.mm, pt.invm, pt.evalid_row,
                         jnp.zeros((3, LEN), dtype)], axis=0)
    call = build_bkt_uniform_call(pt.offs, B, o7, T, LEN, dtype,
                                  pt.bk_scal,
                                  shear_only=pt.bkt_shear_only,
                                  conv_dtype=pt.conv_dtype_node,
                                  interpret=interpret)
    consts = {"K": K}

    def step(cd, carry, x):
        srcf, _step = x
        S, cv = carry
        if pt.st_pos is not None:
            sample = jnp.einsum("sn,csn->sc", pt.st_phi,
                                S[0:3][:, pt.st_pos])
        else:
            sample = jnp.zeros((0, 3), dtype)
        Sn, cvn = call(S, S, cd["K"], cv, cv)
        if pt.src_pos is not None:
            Sn = Sn.at[0:3, pt.src_pos].add(
                srcf.T * cd["K"][3][pt.src_pos][None, :])
        return (Sn, cvn), sample

    return step, consts


def bkt_mix_epilogue(mx, shear_only, dtype, S, Sn, cv, cm,
                     runs=None, offs=None):
    """Exact force correction for the mixed elements of the general-Q
    node-basis tier.

    Preferred form (runs + offs given): the mixed elements of a
    layered model are whole element planes — contiguous column runs —
    so the correction is DENSE static slices (_bkt_mix_runs): no
    gather, no scatter-add (the op bisected to fault the v5e runtime
    at large M), HBM-bandwidth cost.

    Fallback (scattered mixed columns): chunked gathers over
    HT_BKT_MIX_CHUNK-element slices with a presorted segment-sum
    scatter; the single-shot pass device-faults on v5e above ~8k
    mixed elements (8192 runs, 32768 faults — empirically bisected),
    and HT_BKT_NODEQ_MAX_MIXED_ABS caps this form.
    Returns (Sn', cm')."""
    if runs is not None and offs is not None:
        return _bkt_mix_runs(mx, runs, offs, shear_only, dtype,
                             S, Sn, cv, cm)
    M = int(mx["mix_idx"].shape[1])
    bounds = _mix_chunk_bounds(M)
    if len(bounds) > 1:
        cms = []
        for ci, (s0, s1) in enumerate(bounds):
            sl = {k: (v[..., s0:s1]
                      if k not in ("mix_fm", "mix_sc") else v)
                  for k, v in mx.items()}
            sl["mix_sc"] = [mx["mix_sc"][ci]]
            Sn, cm_s = _bkt_mix_one(sl, shear_only, dtype, S, Sn,
                                    cv, cm[..., s0:s1])
            cms.append(cm_s)
        return Sn, jnp.concatenate(cms, axis=-1)
    return _bkt_mix_one(mx, shear_only, dtype, S, Sn, cv, cm)


def _bkt_mix_runs(mx, runs, offs, shear_only, dtype, S, Sn, cv, cm):
    """Dense run form of the mixed correction: per contiguous mixed
    column run [c0, c0+L), every 'gather' is a static slice at
    corner offset o and every 'scatter' a static slice-add — the
    identical float sequence to _bkt_mix_one (same rec3 op order,
    same operator dot), with zero irregular memory ops."""
    R2 = 6 if shear_only else 12
    cdt = cm.dtype                      # carry storage dtype
    cm = cm.astype(dtype)
    cms_out = []
    for c0, m0, L in runs:
        u8 = jnp.stack([S[0:3, c0 + o:c0 + o + L] for o in offs],
                       axis=1)                        # [3, 8, L]
        up8 = jnp.stack([S[3:6, c0 + o:c0 + o + L] for o in offs],
                        axis=1)
        cvg = jnp.stack([cv[:R2, c0 + o:c0 + o + L] for o in offs],
                        axis=1).astype(dtype)         # [R2, 8, L]
        du8 = u8 - up8
        ce = mx["mix_ce"][..., m0:m0 + L]
        cn = mx["mix_cn"][..., m0:m0 + L]
        cmr = cm[..., m0:m0 + L]

        def rec3(cf, s0, s1):
            # same op order as _bkt_mix_one / the kernel's rec
            s0n = cf[1] * u8 + cf[0] * up8 + cf[4] * s0
            s1n = cf[3] * u8 + cf[2] * up8 + cf[5] * s1
            dv = cf[8] * du8 + u8 - cf[6] * s0n - cf[7] * s1n
            return s0n, s1n, dv

        s0e, s1e, dvs_e = rec3(ce[:9], cmr[0:3], cmr[3:6])
        _, _, dvs_n = rec3(cn[:9], cvg[0:3], cvg[3:6])
        parts = [mx["mix_muf"][m0:m0 + L] * (dvs_e - dvs_n)]
        newcm = [s0e, s1e]
        if not shear_only:
            k0e, k1e, dvk_e = rec3(ce[9:], cmr[6:9], cmr[9:12])
            _, _, dvk_n = rec3(cn[9:], cvg[6:9], cvg[9:12])
            parts.append(mx["mix_kaf"][m0:m0 + L] * (dvk_e - dvk_n))
            newcm += [k0e, k1e]
        X = jnp.concatenate(
            [p.transpose(1, 0, 2).reshape(24, -1) for p in parts],
            axis=0)
        dF = jax.lax.dot(mx["mix_fm"], X,
                         precision=jax.lax.Precision.HIGHEST)
        vals = dF.reshape(8, 3, L) * mx["mix_invm"][:, None,
                                                    m0:m0 + L]
        for j, o in enumerate(offs):
            Sn = Sn.at[0:3, c0 + o:c0 + o + L].add(vals[j])
        cms_out.append(jnp.concatenate(newcm, axis=0))
    return Sn, jnp.concatenate(cms_out, axis=-1).astype(cdt)


def _bkt_mix_one(mx, shear_only, dtype, S, Sn, cv, cm):
    """One slice of the mixed-element correction (see the module block
    above _make_bkt_node_kernel): recompute the damping vectors at the
    24 corner slots under both the element-basis state cm and the
    node-basis state the kernel used, and add
    FM @ (mu_f (dvs_e - dvs_n)) through the linear update.
    mx: the mix_* constants (bkt_nodeq_tables).  Returns (Sn', cm')."""
    R2 = 6 if shear_only else 12
    idx = mx["mix_idx"]
    u8 = S[0:3][:, idx]                  # [3, 8, M]
    up8 = S[3:6][:, idx]
    du8 = u8 - up8
    cvg = cv[:R2][:, idx].astype(dtype)  # node conv PREV
    cdt = cm.dtype
    cm = cm.astype(dtype)
    ce, cn = mx["mix_ce"], mx["mix_cn"]

    def rec3(cf, s0, s1):
        # same op order as the kernel's rec, so matching corners
        # cancel identically
        s0n = cf[1] * u8 + cf[0] * up8 + cf[4] * s0
        s1n = cf[3] * u8 + cf[2] * up8 + cf[5] * s1
        dv = cf[8] * du8 + u8 - cf[6] * s0n - cf[7] * s1n
        return s0n, s1n, dv

    s0e, s1e, dvs_e = rec3(ce[:9], cm[0:3], cm[3:6])
    _, _, dvs_n = rec3(cn[:9], cvg[0:3], cvg[3:6])
    parts = [mx["mix_muf"] * (dvs_e - dvs_n)]
    newcm = [s0e, s1e]
    if not shear_only:
        k0e, k1e, dvk_e = rec3(ce[9:], cm[6:9], cm[9:12])
        _, _, dvk_n = rec3(cn[9:], cvg[6:9], cvg[9:12])
        parts.append(mx["mix_kaf"] * (dvk_e - dvk_n))
        newcm += [k0e, k1e]
    # [3, 8, M] comp-major -> FM row order 3j+c
    X = jnp.concatenate(
        [p.transpose(1, 0, 2).reshape(24, -1) for p in parts], axis=0)
    dF = jax.lax.dot(mx["mix_fm"], X,
                     precision=jax.lax.Precision.HIGHEST)  # [24, M]
    M = X.shape[-1]
    vals = dF.reshape(8, 3, M) * mx["mix_invm"][:, None, :]
    flat = vals.transpose(1, 0, 2).reshape(3, -1)
    sc = mx.get("mix_sc")
    if sc:
        # presorted segment-sum + unique-sorted column add: avoids
        # the duplicate-index scatter the v5e runtime intermittently
        # faults on at large M, and lowers to the fast sorted path
        perm, seg, uniq = sc[0]
        contrib = jax.ops.segment_sum(
            flat.T[perm], seg, num_segments=len(uniq),
            indices_are_sorted=True)
        Sn = Sn.at[0:3, uniq].add(contrib.T,
                                  indices_are_sorted=True,
                                  unique_indices=True)
    else:
        Sn = Sn.at[0:3, idx.reshape(-1)].add(flat)
    return Sn, jnp.concatenate(newcm, axis=0).astype(cdt)


def _make_packed_bkt_node_step(pt: PallasBrickTables, interpret=False):
    """General-Q BKT packed step: carry = (S [8, LEN], conv [R2s, LEN]
    node basis[, conv_mix [R2, 8, M] when the plan has mixed
    elements])."""
    B, o7, T, LEN = pt.B, pt.o7, pt.T, pt.LEN
    dtype = pt.dtype
    call = build_bkt_node_call(pt.offs, B, o7, T, LEN, dtype,
                               pt.bkn_sets,
                               shear_only=pt.bkt_shear_only,
                               conv_dtype=pt.conv_dtype_node,
                               interpret=interpret)
    # the mixed-element tables ride the consts argument (closure
    # capture would embed them in the module as HLO literals --
    # tens of MB at production interface counts, pathological
    # compiles)
    consts = {"K": pt.bkn_K}
    if pt.mix_M:
        consts["mix"] = {k: getattr(pt, k) for k in
                         ("mix_idx", "mix_ce", "mix_cn", "mix_invm",
                          "mix_muf", "mix_kaf", "mix_fm", "mix_sc")}
    invm_row = pt.bkn_K[3]

    def step(cd, carry, x):
        srcf, _step = x
        S, cv = carry[0], carry[1]
        if pt.st_pos is not None:
            sample = jnp.einsum("sn,csn->sc", pt.st_phi,
                                S[0:3][:, pt.st_pos])
        else:
            sample = jnp.zeros((0, 3), dtype)
        Sn, cvn = call(S, S, cd["K"], cv, cv)
        if pt.mix_M:
            if os.environ.get("HT_BKT_ABLATE") == "nomix":
                # measurement-only (WRONG PHYSICS): skip the
                # mixed-element epilogue to attribute the general-Q
                # tier's step time (kernel vs epilogue)
                cmn = carry[2]
            else:
                Sn, cmn = bkt_mix_epilogue(
                    cd["mix"], pt.bkt_shear_only, dtype, S, Sn, cv,
                    carry[2],
                    runs=getattr(pt, "mix_runs", None),
                    offs=pt.offs)
        if pt.src_pos is not None:
            Sn = Sn.at[0:3, pt.src_pos].add(
                srcf.T * invm_row[pt.src_pos][None, :])
        out = (Sn, cvn, cmn) if pt.mix_M else (Sn, cvn)
        return out, sample

    return step, consts


def nodeq_conv_init(rows, LEN, node_bin, R2, conv_dtype):
    """Zero node-basis conv with the (constant) set-index row
    pre-filled at row R2 (the general-Q kernel reads it from the conv
    stream; see _make_bkt_node_kernel)."""
    cv = np.zeros((rows, LEN))
    cv[R2, :len(node_bin)] = node_bin
    return jnp.asarray(cv, conv_dtype)


def init_packed_state(pt: PallasBrickTables):
    S = jnp.zeros((8, pt.LEN), pt.dtype)
    if pt.damping == "bkt":
        if getattr(pt, "bkt_nodeq", False):
            R2 = 6 if pt.bkt_shear_only else 12
            st = (S, nodeq_conv_init(pt.conv_rows_node, pt.LEN,
                                     pt.bkn_bin, R2,
                                     pt.conv_dtype_node))
            if pt.mix_M:
                # the mixed-element corner state carries in the SAME
                # storage dtype as the node conv: matching corners
                # then round identically on both paths, so their
                # correction cancels bit-exactly even at bf16 (and
                # the epilogue's dominant carry halves)
                st = st + (jnp.zeros((R2, 8, pt.mix_M),
                                     pt.conv_dtype_node),)
            return st
        return (S, jnp.zeros((pt.conv_rows_node, pt.LEN),
                             pt.conv_dtype_node))
    return (S,)


def packed_snap_of(carry):
    """(u, up[, conv...]) views of the packed carry for snapshot and
    checkpoint taps."""
    return (carry[0][0:3], carry[0][3:6]) + tuple(carry[1:])


def init_pallas_state(pt: PallasBrickTables):
    u = jnp.zeros((3, pt.LEN), pt.dtype)
    if pt.damping == "bkt":
        return (u, u, jnp.zeros((pt.conv_rows, pt.LEN), pt.conv_dtype))
    return (u, u)


def _col_valid(pt, ncols):
    ev = np.zeros(ncols, bool)
    n = min(len(pt.evalid), ncols)
    ev[:n] = pt.evalid[:n]
    return ev


def _fit_field_cm(plan, x, LEN, dtype):
    """Fit a restored displacement field to the brick concat layout
    [3, LEN]: accepts component-major [3, X] (pallas/brick
    checkpoints, any padding) or canonical global [N, 3]."""
    x = np.asarray(x)
    if x.ndim == 2 and x.shape[1] == 3 and x.shape[0] != 3:
        x = x[plan.gnid_cat].T
    assert x.ndim == 2 and x.shape[0] == 3, \
        "checkpoint field layout does not match the fused kernel"
    out = np.zeros((3, LEN))
    out[:, :min(LEN, x.shape[1])] = x[:, :LEN]
    return jnp.asarray(out, dtype)


def _fit_conv_node(pt, cv):
    """Fit a restored BKT conv array to the uniform-tier node basis
    [conv_rows_node, LEN]; converts corner-basis (48/96-row)
    checkpoints via conv_corner_to_node."""
    if cv is None:
        return jnp.zeros((pt.conv_rows_node, pt.LEN),
                         pt.conv_dtype_node)
    cva = np.asarray(cv, np.float64)
    if cva.ndim != 2 or cva.shape[0] not in (6, 8, 12, 16, 48, 96):
        raise RuntimeError(
            "checkpointed BKT conv state has an unsupported layout "
            "for the fused kernel; restart with the solver path that "
            "wrote the checkpoint")
    if cva.shape[0] in (48, 96):
        cva = conv_corner_to_node(pt.offs, _col_valid(pt, cva.shape[1]),
                                  cva)
    out = np.zeros((pt.conv_rows_node, pt.LEN))
    out[:cva.shape[0], :cva.shape[1]] = cva[:pt.conv_rows_node]
    return jnp.asarray(out, pt.conv_dtype_node)


def _fit_conv_corner(pt, cv, mix=None):
    """Fit a restored BKT conv array to the corner basis
    [conv_rows, LEN]; converts node-basis (uniform- or general-tier)
    checkpoints via conv_node_to_corner, patching mixed elements from
    the general tier's epilogue carry when present."""
    if cv is None:
        return jnp.zeros((pt.conv_rows, pt.LEN), pt.conv_dtype)
    cva = np.asarray(cv, np.float64)
    if cva.ndim != 2 or cva.shape[0] not in (6, 8, 12, 16, 48, 96):
        raise RuntimeError(
            "checkpointed BKT conv state has an unsupported layout "
            "for the fused kernel; restart with the solver path that "
            "wrote the checkpoint")
    if cva.shape[0] not in (48, 96):
        full = np.zeros((cva.shape[0], pt.LEN))
        full[:, :min(pt.LEN, cva.shape[1])] = cva[:, :pt.LEN]
        mixed = getattr(pt, "bkn_mixed_cols", None)
        cva = conv_nodeq_to_corner(
            pt.offs, _col_valid(pt, pt.LEN),
            mixed if mixed is not None else np.zeros(0, np.int64),
            full, mix, pt.conv_rows)
    out = np.zeros((pt.conv_rows, pt.LEN))
    out[:, :cva.shape[1]] = cva
    return jnp.asarray(out, pt.conv_dtype)


def _fit_conv_nodeq(pt, parts):
    """Restored conv state -> the general-Q tier's carry tail
    (conv_node [Rn, LEN][, conv_mix [R2, 8, M]]).  Accepts this tier's
    own (node, mix) pair, a corner-basis array (exact split via the
    node assignment), or a bare node-basis array (mix backfilled from
    the node fields at the mixed corners -- exact only where the
    coefficient sets agreed)."""
    R2 = 6 if pt.bkt_shear_only else 12
    M = pt.mix_M
    mix = np.zeros((R2, 8, M)) if M else None
    if not parts or parts[0] is None:
        node = np.zeros((R2, pt.LEN))
    else:
        a = np.asarray(parts[0], np.float64)
        if a.ndim != 2 or a.shape[0] not in (6, 8, 12, 16, 48, 96):
            raise RuntimeError(
                "checkpointed BKT conv state has an unsupported "
                "layout for the fused kernel; restart with the solver "
                "path that wrote the checkpoint")
        full = np.zeros((a.shape[0], pt.LEN))
        full[:, :min(pt.LEN, a.shape[1])] = a[:, :pt.LEN]
        if a.shape[0] in (48, 96):
            node = conv_corner_to_nodeq(pt.offs, pt.bkn_node_src, full)
            if M:
                mix = conv_mix_of_corner(pt.offs, pt.bkn_mixed_cols,
                                         full)
        else:
            node = full[:R2]
            if M and len(parts) > 1 and parts[1] is not None:
                mix = np.asarray(parts[1], np.float64)
                if mix.shape != (R2, 8, M):
                    raise RuntimeError(
                        "checkpointed BKT mixed-element state does "
                        "not match this mesh's mixed set")
            elif M:
                mix = np.stack(
                    [node[:, pt.bkn_mixed_cols + o] for o in pt.offs],
                    axis=1)
    out = np.zeros((pt.conv_rows_node, pt.LEN))
    r = min(R2, node.shape[0])
    out[:r] = node[:r]
    out[R2, :len(pt.bkn_bin)] = pt.bkn_bin    # constant set-index row
    tail = (jnp.asarray(out, pt.conv_dtype_node),)
    if M:
        # same storage dtype as the node conv (see init_packed_state)
        tail += (jnp.asarray(mix, pt.conv_dtype_node),)
    return tail


def run_pallas_solver(plan, tables, src_ids, src_forces, total_steps,
                      dt, st_nodes=None, st_phi=None,
                      dtype=jnp.float32, chunk=None, state=None,
                      on_chunk=None, interpret=False, start_step=0,
                      on_snap=None, snap_every=None, on_samples=None):
    """Chunked time loop; same contract as run_brick_solver."""
    from .chunking import run_chunked

    pt = PallasBrickTables(plan, tables, src_ids=src_ids,
                           st_nodes=st_nodes, st_phi=st_phi, dtype=dtype)
    packed = ((tables.damping != "bkt"
               or getattr(pt, "bkt_uniform", False)
               or getattr(pt, "bkt_nodeq", False))
              and os.environ.get("HT_PALLAS_STATE", "packed")
              != "legacy")
    snap_of = None
    if packed:
        # packed [8, LEN] state: half the physical HBM bytes per step
        step, consts = make_packed_pallas_step(pt, interpret=interpret)
        if state is None:
            state = init_packed_state(pt)
        else:
            # resume: pack the (u, up) fields into S (any layout
            # _fit_field_cm accepts)
            u = _fit_field_cm(plan, state[0], pt.LEN, dtype)
            up = _fit_field_cm(plan, state[1], pt.LEN, dtype)
            S = jnp.concatenate(
                [u, up, jnp.zeros((2, pt.LEN), dtype)], axis=0)
            if tables.damping == "bkt":
                if getattr(pt, "bkt_nodeq", False):
                    state = (S,) + _fit_conv_nodeq(pt, state[2:])
                else:
                    cv = state[2] if len(state) > 2 else None
                    state = (S, _fit_conv_node(pt, cv))
            else:
                state = (S,)
        snap_of = packed_snap_of
        if on_chunk is not None:
            inner_chunk = on_chunk
            on_chunk = lambda done, st: inner_chunk(done,
                                                    packed_snap_of(st))
    else:
        step, consts = make_pallas_step(pt, interpret=interpret)
        if state is None:
            state = init_pallas_state(pt)
        else:  # resume: pad fields, fit conv to the corner basis
            conv = state[2:]
            state = tuple(_fit_field_cm(plan, x, pt.LEN, dtype)
                          for x in state[:2])
            if tables.damping == "bkt":
                state = state + (_fit_conv_corner(
                    pt, conv[0] if conv else None,
                    mix=conv[1] if len(conv) > 1 else None),)
    if chunk is None:
        chunk = min(total_steps, 1000)
    dt2 = dt * dt

    if (packed and resident_applies(pt, tables, dtype)
            and on_snap is None and snap_every is None):
        state, samples = _run_resident_loop(
            pt, src_forces, total_steps, dt, chunk, state,
            start_step, on_chunk, on_samples, interpret)
        return packed_snap_of(state), samples

    def make_xs(s, k):
        return (jnp.asarray(src_forces[s:s + k] * dt2, dtype),
                jnp.arange(s, s + k, dtype=jnp.int32))

    state, samples = run_chunked(step, state, make_xs, total_steps,
                                 start_step=start_step, chunk=chunk,
                                 on_chunk=on_chunk, on_snap=on_snap,
                                 snap_every=snap_every, consts=consts,
                                 snap_of=snap_of,
                                 on_samples=on_samples)
    if packed:
        state = packed_snap_of(state)
    return state, samples


def resident_applies(pt, tables, dtype) -> bool:
    """Eligibility of the VMEM-resident time loop
    (build_resident_call; HT_PALLAS_RESIDENT=0 opts out): f32
    elastic (BKT keeps the streaming kernels for now), small
    source/station sets (static column slices in-kernel), and the
    resident S+K must fit the v5e VMEM budget — which is exactly the
    per-chip shard size class of pod-scale runs."""
    if os.environ.get("HT_PALLAS_RESIDENT", "1") != "1":
        return False
    if dtype != jnp.float32:
        return False
    conv_rows, cb = 0, 2
    if tables.damping == "bkt":
        # uniform-Q node-basis only (the general/nodeq tier's mixed
        # epilogue and bin streams keep the streaming path for now)
        if not getattr(pt, "bkt_uniform", False):
            return False
        conv_rows = pt.conv_rows_node
        cb = jnp.zeros((), pt.conv_dtype_node).dtype.itemsize
    L = 0 if pt.src_pos is None else len(np.asarray(pt.src_pos))
    ns = 0 if pt.st_pos is None else len(np.asarray(pt.st_pos))
    if L > 128 or ns > 128:
        return False
    return (resident_vmem_bytes(pt.LEN, pt.o7, dtype, conv_rows, cb)
            <= int(os.environ.get("HT_RESIDENT_VMEM_MB", "118"))
            * (1 << 20))


def _run_resident_loop(pt, src_forces, total_steps, dt, chunk, state,
                       start_step, on_chunk, on_samples, interpret):
    """Chunked driver for the resident kernel (mirrors run_chunked's
    on_chunk/on_samples contract; 4-D snapshot taps keep the
    streaming path)."""
    dtype = pt.dtype
    bkt = pt.damping == "bkt"
    L = 0 if pt.src_pos is None else len(np.asarray(pt.src_pos))
    ns = 0 if pt.st_pos is None else len(np.asarray(pt.st_pos))
    dt2 = dt * dt
    invm_sc = None
    if L:
        invm_sc = np.asarray(pt.invm).reshape(-1)[
            np.asarray(pt.src_pos).reshape(-1)]
    if bkt:
        K = jnp.concatenate([pt.mm, pt.invm, pt.evalid_row,
                             jnp.zeros((3, pt.LEN), dtype)], axis=0)
        CV = state[1]
    else:
        K = jnp.concatenate([pt.cm, pt.mm, pt.invm,
                             jnp.zeros((1, pt.LEN), dtype)], axis=0)
    calls = {}
    outs = []
    S = state[0]
    s = start_step
    while s < total_steps:
        k = min(chunk, total_steps - s)
        adv = calls.get(k)
        if adv is None:
            if bkt:
                adv = jax.jit(build_resident_bkt_call(
                    pt.offs, pt.B, pt.o7, pt.T, pt.LEN, dtype,
                    pt.bk_scal, k, shear_only=pt.bkt_shear_only,
                    conv_dtype=pt.conv_dtype_node,
                    src_pos=(pt.src_pos if L else ()),
                    st_pos=(pt.st_pos if ns else None),
                    st_phi=(pt.st_phi if ns else None),
                    interpret=interpret))
            else:
                adv = jax.jit(build_resident_call(
                    pt.offs, pt.B, pt.o7, pt.T, pt.LEN, pt.f1e,
                    pt.f2e, dtype, k, tier=pt.tier, kco=pt.kco,
                    src_pos=(pt.src_pos if L else ()),
                    st_pos=(pt.st_pos if ns else None),
                    st_phi=(pt.st_phi if ns else None),
                    interpret=interpret))
            calls[k] = adv
        sf = np.zeros((k, 8, 128), np.float32)
        if L:
            # same rounding order as the streaming step: srcf*dt2
            # rounds to f32 first (make_xs), THEN multiplies by the
            # f32 invm row — bit-identical injection
            f32 = np.asarray(np.asarray(src_forces[s:s + k]) * dt2,
                             np.float32)
            sf[:, 0:3, :L] = (f32.transpose(0, 2, 1)
                              * invm_sc.astype(np.float32)[None, None])
        if bkt:
            S, CV, smp = adv(S, CV, K, jnp.asarray(sf, dtype))
        else:
            S, smp = adv(S, K, pt.dd, jnp.asarray(sf, dtype))
        if ns:
            samples = np.asarray(smp)[:, 0:3, :ns].transpose(0, 2, 1)
        else:
            samples = np.zeros((k, 0, 3), np.float32)
        if on_samples is not None:
            samples = on_samples(s, samples)
        outs.append(samples)
        s += k
        if on_chunk is not None:
            on_chunk(s, (S, CV) if bkt else (S,))
    samples = (np.concatenate(outs) if outs
               else np.zeros((0, 0, 3)))
    return ((S, CV) if bkt else (S,)), samples


def pallas_u_global(plan, u_pad, N):
    """Global [N, 3] displacement from the padded kernel field."""
    b = plan.bricks[0]
    arr = np.asarray(u_pad)[:, :b.nb].T
    u = np.zeros((N, 3), arr.dtype)
    u[plan.gnid_cat] = arr
    return u
