"""Multi-chip graded-mesh solver: stacked slab decomposition.

The production large-CVM configuration is a depth-graded octree (one
brick per resolution level, stacked in z, 2:1 plane interfaces).  The
uniform slab path (slab.py) shards one brick; here EVERY brick is
sharded in z across the whole device axis, so each device holds one
z-fragment of every brick:

- per brick, per step: the fused single-brick Pallas kernel
  (solver/pallas_brick.py, with its specialization tiers / BKT
  variant) runs on the local fragment, followed by the same
  shared-plane force recovery + ppermute exchange the uniform slab
  uses (the reference's schedule_senddata halo, psolve.c:4946-5079);
- per 2:1 brick interface: the interface's fine plane lives on one
  end device and the coarse plane on another; the coarse device
  ppermutes its (u, up, u_next) plane triplet to the fine device,
  which runs the dense plane reconciliation (compute_adjust semantics,
  solver/planerec.py:hanging_algebra) and ppermutes the reconciled
  coarse plane back.  Two point-to-point transfers of one plane each
  -- no gathers, no segment sums.

Interface structure is verified exhaustively at build time by
PlaneReconciler.build; meshes that don't decompose into full z-planes
raise, and callers fall back to the unstructured sharded path (its
cost is a published bench number: BENCH_PATH=sharded).  Per-brick
layer counts need NOT divide the device count -- uneven splits give
the first nz % n_dev devices one extra layer (ez_of), with every
fragment padded to the static buffer; the only shape requirement is
>= 1 element layer per device per brick.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..solver.bricks import build_plan
from ..solver.brickstep import assemble_brick_tables
from ..solver.planerec import PlaneReconciler


@dataclass
class _GBrick:
    offs: tuple
    plane: int            # nyp * nxp
    ez: int               # max element layers per device (buffer)
    nb: int               # local node count ((ez+1) planes, padded)
    ez_of: object = None  # [n_dev] owned layer counts (uneven splits)
    B: int = 0
    T: int = 0
    LEN: int = 0
    # stacked per-device tables [n_dev, rows, LEN]
    cm: object = None
    bk: object = None
    mm: object = None
    invm: object = None
    Kp: object = None     # packed mode: [n_dev, 8, LEN] consts
    tier: str = "general"
    kco: tuple = None
    gnid_local: list = None
    src_lidx: object = None     # [n_dev, L] local positions
    src_mask: object = None


@dataclass
class GSlabTables:
    n_dev: int
    damping: str
    bricks: List[_GBrick]
    rec: PlaneReconciler        # verified interfaces + plane tables
    hang_own: list              # per hang: (df, lzf, dc, lzc)
    same_own: list              # per same: (da, lza, db, lzb)
    conv_rows: int = 0
    conv_dtype: object = None
    shear_only: bool = False
    gnid_all: list = None       # per device, per brick
    packed: bool = False        # [8, LEN] packed-state kernels
    bk_scal: list = None        # BKT: per-brick uniform-Q coefficients
    conv_rows_node: int = 0     # BKT packed: node-basis conv rows
    conv_dtype_node: object = None


def build_gslab_tables(mesh, tables, n_dev, src_ids=None,
                       dtype=jnp.float32,
                       min_brick_elems=2048) -> GSlabTables:
    from ..solver.pallas_brick import (_tier_kco, bk_row_names,
                                       bkt_conv_dtype, bkt_kappa_zero,
                                       pallas_geometry)

    plan = build_plan(mesh, min_brick_elems=min_brick_elems,
                      legacy_axes=True)
    if len(plan.bricks) < 2 or len(plan.loose_eidx):
        raise RuntimeError("graded slab needs >=2 dense bricks and no "
                           "loose elements")
    rec = PlaneReconciler.build(plan, tables, src_ids=None, dtype=dtype)
    if rec is None:
        raise RuntimeError("mesh interfaces do not decompose into full "
                           "z-planes; use the unstructured path")

    t_host, metas, TOT = assemble_brick_tables(plan, tables,
                                               src_ids=src_ids)
    bkt = tables.damping == "bkt"
    import os
    packed_env = os.environ.get("HT_GSLAB_PACKED", "1") != "0"
    st = GSlabTables(n_dev=n_dev, damping=tables.damping, bricks=[],
                     rec=rec, hang_own=[], same_own=[],
                     packed=(not bkt and packed_env))
    if bkt:
        st.shear_only = bkt_kappa_zero(tables.bkt)
        st.conv_rows = 48 if st.shear_only else 96
        st.conv_dtype = bkt_conv_dtype(dtype)
        bknames = bk_row_names(st.shear_only)
        st.conv_rows_node = 8 if st.shear_only else 16
        st.conv_dtype_node = (dtype if st.shear_only
                              else bkt_conv_dtype(dtype))
        # per-brick uniform-Q tier (node-basis memory variables, see
        # pallas_brick._make_bkt_uniform_kernel): packed applies when
        # EVERY brick has one coefficient set
        if packed_env and os.environ.get("HT_BKT_UNIFORM", "1") != "0":
            from ..solver.pallas_brick import detect_bkt_uniform
            scals = [detect_bkt_uniform(
                tables.bkt, plan.eidx_cat[b.off:b.off + b.nb],
                plan.evalid_cat[b.off:b.off + b.nb], st.shear_only)
                for b in plan.bricks]
            if all(s is not None for s in scals):
                st.bk_scal = scals
                st.packed = True

    # source ownership: first concat copy; owner device excludes the
    # shared top plane of fragments > 0 (same rule as slab.py)
    src_pos = t_host.get("src_pos")
    L = len(src_ids) if src_ids is not None else 0

    f = lambda x: jnp.asarray(x, dtype)
    from ..solver.pallas_brick import pallas_fits
    for bi, (b, gm) in enumerate(zip(plan.bricks, metas)):
        if not pallas_fits(gm.offs):
            raise RuntimeError(
                f"brick {bi}: xy plane exceeds the fused kernel's "
                f"VMEM tile under the z-major layout; graded slab "
                f"unavailable")
        nzp, nyp, nxp = b.node_shape
        nz = nzp - 1
        if nz < n_dev:
            raise RuntimeError(
                f"brick {bi}: {nz} element layers cannot feed "
                f"{n_dev} devices (each needs >= 1)")
        # uneven split: extras to the first nz%n_dev devices; every
        # fragment padded to the static (ez_hi+1)-plane buffer with
        # zeroed element coefficients
        ez_lo, rr = divmod(nz, n_dev)
        ez = ez_lo + (1 if rr else 0)
        ez_of = np.array([ez_lo + (1 if d < rr else 0)
                          for d in range(n_dev)], np.int32)
        plane = nyp * nxp
        nb = (ez + 1) * plane
        B, T, LEN = pallas_geometry(gm.offs, nb)
        gb = _GBrick(offs=gm.offs, plane=plane, ez=ez, nb=nb,
                     ez_of=ez_of, B=B, T=T, LEN=LEN, gnid_local=[])

        def pad(x):
            w = [(0, 0)] * (x.ndim - 1) + [(0, LEN - x.shape[-1])]
            return np.pad(x, w)

        def pad_nb(x):
            w = [(0, 0)] * (x.ndim - 1) + [(0, nb - x.shape[-1])]
            return np.pad(x, w)

        cms, bks, mms, invs, vals = [], [], [], [], []
        srcl, srcm = [], []
        for d in range(n_dev):
            ez_d = int(ez_of[d])
            n0 = b.off + (d * ez_lo + min(d, rr)) * plane
            real = (ez_d + 1) * plane
            n1 = n0 + real
            sel = slice(n0, n1)
            if bkt and st.packed:
                v = plan.evalid_cat[sel].astype(np.float64).copy()
                v[ez_d * plane:] = 0.0         # ghost-plane elements
                vals.append(pad_nb(v))
            elif bkt:
                rows = np.stack([t_host["bkt"][k][sel].copy()
                                 for k in bknames])
                rows[:, ez_d * plane:] = 0.0   # ghost-plane elements
                bks.append(pad_nb(rows))
            else:
                c1 = t_host["c1"][sel].copy()
                c2 = t_host["c2"][sel].copy()
                c3 = t_host["c3"][sel].copy()
                c1[ez_d * plane:] = 0.0
                c2[ez_d * plane:] = 0.0
                c3[ez_d * plane:] = 0.0
                beta = np.divide(c3, c1, out=np.zeros_like(c1),
                                 where=c1 != 0)
                cms.append(pad_nb(np.stack([c1, c2, beta])))
            mms.append(pad_nb(t_host["mass_minusaM"][:, sel]))
            invs.append(pad_nb(t_host["inv_mass"][sel]))
            gb.gnid_local.append(plan.gnid_cat[sel])
            if L:
                pos = src_pos.astype(np.int64)
                mine = (pos >= n0) & (pos < n1)
                if d > 0:
                    mine &= pos >= n0 + plane
                sl = np.where(mine, pos - n0, nb - 1)
                srcl.append(sl.astype(np.int32))
                srcm.append(mine)
        if bkt and st.packed:
            # uniform-Q node-basis kernel consts (build_bkt_uniform_
            # call K layout): mass_minusaM 0:3, inv_mass 3, valid 4
            kp = np.concatenate(
                [np.stack(mms), np.stack(invs)[:, None, :],
                 np.stack(vals)[:, None, :],
                 np.zeros((n_dev, 3, nb))], axis=1)
            gb.Kp = f(pad(kp))
        elif bkt:
            gb.bk = f(pad(np.stack(bks)))
        else:
            cm = np.stack(cms)
            gb.tier, gb.kco = _tier_kco(
                cm[:, 0].ravel(), cm[:, 1].ravel(), cm[:, 2].ravel(),
                cm[:, 0].ravel() != 0)
            if st.packed:
                # one [8, LEN] const array per device: (c1, c2, beta,
                # mass_minusaM x3, inv_mass, 0) — build_call_packed's
                # K layout, half the physical HBM streams of separate
                # cm/mm/invm (each padded to 8 sublanes on device)
                kp = np.concatenate(
                    [cm, np.stack(mms), np.stack(invs)[:, None, :],
                     np.zeros((n_dev, 1, cm.shape[-1]))], axis=1)
                gb.Kp = f(pad(kp))
            else:
                gb.cm = f(pad(cm))
        if not st.packed:
            gb.mm = f(pad(np.stack(mms)))
            gb.invm = f(pad(np.stack(invs)))[:, None, :]
        if L and np.any([m.any() for m in srcm]):
            gb.src_lidx = jnp.asarray(np.stack(srcl), jnp.int32)
            gb.src_mask = jnp.asarray(np.stack(srcm))
        st.bricks.append(gb)

    def owner(z_plane, brick):
        """(device, local plane) of a brick-end plane.  The last
        device always owns ez_of[-1] layers (extras go to the FIRST
        devices), so its end plane index is static."""
        gb = st.bricks[brick]
        return ((0, 0) if z_plane == 0
                else (n_dev - 1, int(gb.ez_of[-1])))

    for h in rec.hang:
        df, lzf = owner(h.zf, h.fi)
        dc, lzc = owner(h.zc, h.ci)
        st.hang_own.append((df, lzf, dc, lzc))
    for s in rec.same:
        da, lza = owner(s.za, s.ai)
        db, lzb = owner(s.zb, s.bi)
        st.same_own.append((da, lza, db, lzb))
    return st


def gslab_step_builder(st: GSlabTables, axis="d", dtype=jnp.float32,
                       interpret=False):
    """Raw per-step kernel for the graded stacked-slab path: returns
    (local_step, tdev, state_spec)."""
    from ..physics.kmats import spectral_factors
    from ..solver.pallas_brick import (build_bkt_call,
                                       build_bkt_uniform_call,
                                       build_call, build_call_packed)

    bkt = st.damping == "bkt"
    packed = st.packed
    n_dev = st.n_dev
    f1e, f2e = spectral_factors()
    from ..solver.pallas_brick import diag_dd
    dd = diag_dd(f1e, f2e, dtype)

    calls = []
    for bi, gb in enumerate(st.bricks):
        if bkt and packed:
            calls.append(build_bkt_uniform_call(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, dtype,
                st.bk_scal[bi], shear_only=st.shear_only,
                conv_dtype=st.conv_dtype_node, interpret=interpret))
        elif bkt:
            calls.append(build_bkt_call(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, dtype,
                shear_only=st.shear_only, conv_dtype=st.conv_dtype,
                interpret=interpret))
        elif packed:
            calls.append(build_call_packed(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, f1e, f2e,
                dtype, interpret=interpret, tier=gb.tier, kco=gb.kco))
        else:
            calls.append(build_call(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, f1e, f2e,
                dtype, interpret=interpret, tier=gb.tier, kco=gb.kco))

    tdev = {}
    for bi, gb in enumerate(st.bricks):
        if packed:
            tdev[f"K{bi}"] = gb.Kp
        else:
            tdev[f"mm{bi}"] = gb.mm
            tdev[f"invm{bi}"] = gb.invm
            if bkt:
                tdev[f"bk{bi}"] = gb.bk
            else:
                tdev[f"cm{bi}"] = gb.cm
        if gb.src_lidx is not None:
            tdev[f"sl{bi}"] = gb.src_lidx
            tdev[f"sm{bi}"] = gb.src_mask

    ring_dn = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    ring_up = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_step(t, carry, x):
        srcf, _step = x
        convs = None
        if packed:
            # packed: one [8, LEN] S per brick (u 0:3, up 3:6);
            # uniform-Q BKT adds per-brick node-basis conv arrays
            if bkt:
                Ss, convs = carry
            else:
                (Ss,) = carry
            us = tuple(S[0:3] for S in Ss)
            ups = tuple(S[3:6] for S in Ss)
        elif bkt:
            us, ups, convs = carry
        else:
            us, ups = carry
        idx = jax.lax.axis_index(axis)
        uns = []      # packed: [8, LEN] next-step S; else [3, LEN] un
        new_conv = []

        for bi, gb in enumerate(st.bricks):
            u, up = us[bi], ups[bi]
            if bkt and packed:
                un, cv = calls[bi](Ss[bi], Ss[bi], t[f"K{bi}"],
                                   convs[bi], convs[bi])
                new_conv.append(cv)
            elif bkt:
                un, cv = calls[bi](u, u, up, up, t[f"bk{bi}"],
                                   t[f"mm{bi}"], t[f"invm{bi}"],
                                   convs[bi])
                new_conv.append(cv)
            elif packed:
                un = calls[bi](Ss[bi], Ss[bi], t[f"K{bi}"], dd)
            else:
                un = calls[bi](u, u, up, up, t[f"cm{bi}"],
                               t[f"mm{bi}"], t[f"invm{bi}"], dd)
            if packed and bkt:
                # uniform-BKT K layout: mm 0:3, invm 3, valid 4
                iv = t[f"K{bi}"][3]
                m1 = t[f"K{bi}"][0:3]
            elif packed:
                iv = t[f"K{bi}"][6]
                m1 = t[f"K{bi}"][3:6]
            else:
                iv = t[f"invm{bi}"][0]
                m1 = t[f"mm{bi}"]
            if gb.src_lidx is not None:
                sf = jnp.where(t[f"sm{bi}"][:, None], srcf, 0)
                un = un.at[:3, t[f"sl{bi}"]].add(
                    sf.T * iv[t[f"sl{bi}"]][None, :])

            # within-brick fragment halo: shared-plane force recovery
            # + ppermute (identical to slab.py's fused path).  The
            # bottom shared plane sits at the per-device dynamic
            # offset ez_of[idx]*plane (uneven splits pad the tail).
            plane, nb = gb.plane, gb.nb
            zb = jnp.asarray(gb.ez_of, jnp.int32)[idx] * plane
            z0 = jnp.zeros((), zb.dtype)

            def dslice(a, off, rows):
                return jax.lax.dynamic_slice(a, (z0, off),
                                             (rows, plane))

            def plane_force(pl):
                unp, upl, uppl, ivp, m1p = pl
                return (unp - upl) / ivp - m1p * (upl - uppl)

            f_top = plane_force((un[:3, :plane], u[:, :plane],
                                 up[:, :plane], iv[None, :plane],
                                 m1[:, :plane]))
            f_bot = plane_force((dslice(un, zb, 3)[:3],
                                 dslice(u, zb, 3),
                                 dslice(up, zb, 3),
                                 dslice(iv[None, :], zb, 1),
                                 dslice(m1, zb, 3)))
            down = jax.lax.ppermute(f_bot, axis, ring_dn)
            up_ = jax.lax.ppermute(f_top, axis, ring_up)
            # replica-symmetric plane update (see slab.py): both
            # copies recompute u_next with the same operand order so
            # shared-plane replicas stay bit-identical
            wtop = jnp.where(idx > 0, 1.0, 0.0)
            wbot = jnp.where(idx < n_dev - 1, 1.0, 0.0)
            du_t = u[:, :plane] - up[:, :plane]
            top_new = u[:, :plane] \
                + (down + f_top + m1[:, :plane] * du_t) \
                * iv[None, :plane]
            un = un.at[:3, :plane].set(
                wtop * top_new + (1.0 - wtop) * un[:3, :plane])
            u_b, up_b = dslice(u, zb, 3), dslice(up, zb, 3)
            iv_b = dslice(iv[None, :], zb, 1)
            bot_new = u_b + (f_bot + up_
                             + dslice(m1, zb, 3) * (u_b - up_b)) * iv_b
            un = jax.lax.dynamic_update_slice(
                un, wbot * bot_new + (1.0 - wbot)
                * dslice(un, zb, 3)[:3], (z0, zb))
            uns.append(un)

        # cross-brick interface reconciliation
        def triplet(bi, lz, ny, nx):
            gb = st.bricks[bi]
            sl = slice(lz * gb.plane, (lz + 1) * gb.plane)
            return jnp.concatenate(
                [us[bi][:, sl], ups[bi][:, sl], uns[bi][:3, sl]],
                axis=0).reshape(9, ny, nx)

        def put_plane(arr, vals, col0):
            """Write a [3, plane] plane into rows 0:3 at column col0
            (rows 3: of a packed array pass through)."""
            return jax.lax.dynamic_update_slice(
                arr, vals.astype(dtype), (0, col0))

        for h, (df, lzf, dc, lzc) in zip(st.rec.hang, st.hang_own):
            gbf, gbc = st.bricks[h.fi], st.bricks[h.ci]
            fine = triplet(h.fi, lzf, h.nyf, h.nxf)
            coarse = triplet(h.ci, lzc, h.nyc, h.nxc)
            if df != dc:
                coarse = jax.lax.ppermute(coarse, axis, [(dc, df)])
            v2 = PlaneReconciler.hanging_algebra(
                fine[0:3], fine[3:6], fine[6:9],
                coarse[0:3], coarse[3:6], coarse[6:9], h)
            v2c = v2[:, ::2, ::2]
            if df != dc:
                v2c = jax.lax.ppermute(v2c, axis, [(df, dc)])
            putf = put_plane(uns[h.fi], v2.reshape(3, gbf.plane),
                             lzf * gbf.plane)
            putc = put_plane(uns[h.ci], v2c.reshape(3, gbc.plane),
                             lzc * gbc.plane)
            uns[h.fi] = jnp.where(idx == df, putf, uns[h.fi])
            uns[h.ci] = jnp.where(idx == dc, putc, uns[h.ci])

        for s, (da, lza, db, lzb) in zip(st.rec.same, st.same_own):
            gba, gbb = st.bricks[s.ai], st.bricks[s.bi]
            ta = triplet(s.ai, lza, s.ny, s.nx)
            tb = triplet(s.bi, lzb, s.ny, s.nx)
            if da != db:
                tb = jax.lax.ppermute(tb, axis, [(db, da)])
            unv = PlaneReconciler.same_level_algebra(
                ta[0:3], ta[3:6], ta[6:9], tb[0:3], tb[3:6], tb[6:9], s)
            unb = unv
            if da != db:
                unb = jax.lax.ppermute(unv, axis, [(da, db)])
            puta = put_plane(uns[s.ai], unv.reshape(3, gba.plane),
                             lza * gba.plane)
            putb = put_plane(uns[s.bi], unb.reshape(3, gbb.plane),
                             lzb * gbb.plane)
            uns[s.ai] = jnp.where(idx == da, puta, uns[s.ai])
            uns[s.bi] = jnp.where(idx == db, putb, uns[s.bi])

        if bkt and packed:
            return (tuple(uns), tuple(new_conv)), None
        if bkt:
            return (tuple(uns), tuple(us), tuple(new_conv)), None
        if packed:
            return (tuple(uns),), None
        return (tuple(uns), tuple(us)), None

    nb_ = len(st.bricks)
    one = (P(axis),) * nb_
    sspec = ((one, one) if bkt and packed
             else (one, one, one) if bkt
             else (one,) if packed else (one, one))
    return local_step, tdev, sspec


def make_gslab_step(st: GSlabTables, mesh_dev: Mesh, axis="d",
                    dtype=jnp.float32, interpret=False):
    local_step, tdev, sspec = gslab_step_builder(
        st, axis=axis, dtype=dtype, interpret=interpret)

    def scan_all(t, state, xs):
        t = jax.tree.map(lambda v: v[0], t)
        state = jax.tree.map(lambda v: v[0], state)
        state, _ = jax.lax.scan(partial(local_step, t), state, xs)
        return jax.tree.map(lambda v: v[None], state)

    tspec = jax.tree.map(lambda _: P(axis), tdev)
    smap = jax.shard_map(scan_all, mesh=mesh_dev,
                         in_specs=(tspec, sspec, P()), out_specs=sspec,
                         check_vma=False)
    return jax.jit(smap), tdev


def run_gslab_solver(st: GSlabTables, mesh_dev, src_forces,
                     total_steps, dt, dtype=jnp.float32, chunk=None,
                     interpret=False):
    scan_fn, tdev = make_gslab_step(st, mesh_dev, dtype=dtype,
                                    interpret=interpret)
    if st.packed:
        Ss = tuple(jnp.zeros((st.n_dev, 8, gb.LEN), dtype)
                   for gb in st.bricks)
        if st.damping == "bkt":
            conv = tuple(jnp.zeros(
                (st.n_dev, st.conv_rows_node, gb.LEN),
                st.conv_dtype_node) for gb in st.bricks)
            state = (Ss, conv)
        else:
            state = (Ss,)
    else:
        u = tuple(jnp.zeros((st.n_dev, 3, gb.LEN), dtype)
                  for gb in st.bricks)
        if st.damping == "bkt":
            conv = tuple(jnp.zeros((st.n_dev, st.conv_rows, gb.LEN),
                                   st.conv_dtype) for gb in st.bricks)
            state = (u, u, conv)
        else:
            state = (u, u)
    if chunk is None:
        chunk = min(total_steps, 1000)
    dt2 = dt * dt
    s = 0
    while s < total_steps:
        k = min(chunk, total_steps - s)
        xs = (jnp.asarray(src_forces[s:s + k] * dt2, dtype),
              jnp.arange(s, s + k, dtype=jnp.int32))
        state = scan_fn(tdev, state, xs)
        s += k
    return state


def gslab_u_global(st: GSlabTables, us, N, row0=0):
    """Global [N, 3] field from the per-brick stacked slab states.
    Accepts packed [n_dev, 8, LEN] entries: row0=0 reads u, row0=3
    reads u_prev."""
    u = np.zeros((N, 3), np.asarray(us[0]).dtype)
    for gb, arr in zip(st.bricks, us):
        a = np.asarray(arr)               # [n_dev, 3 or 8, LEN]
        for d in range(st.n_dev):
            g = gb.gnid_local[d]
            u[g] = a[d, row0:row0 + 3, : len(g)].T
    return u
