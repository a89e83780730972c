"""General graded-mesh multi-chip solver: fused kernels for ANY brick
decomposition.

gslab.py requires every brick interface to be a full horizontal
z-plane (depth-graded meshes).  Laterally graded meshes — a fine
region bounded in x/y, the normal basin-edge shape — have vertical
interfaces and used to fall to the unstructured sharded path on
multi-chip.  This path removes that restriction:

- every dense brick is sharded along its OUTERMOST storage axis
  ("z" of the brick grid) across the device axis, exactly like
  gslab's fragments: the packed single-brick Pallas kernel runs per
  fragment, followed by the shared-plane force recovery + ppermute
  halo (the reference's schedule_senddata halo, psolve.c:4946-5079);
- the cross-brick interface reconciliation is the multi-brick index
  epilogue (pallas_mesh.interface_epilogue_consts, compute_adjust
  semantics psolve.c:5936-6039) run on ONE psum of the O(interface)
  entry triplets: each device contributes the (u, up, u_next) rows of
  the entries it owns into a fixed [K, 9] buffer, `psum` assembles
  the global entry table on every device, the group algebra
  (segment-sum + dangling distribute/assign) is computed redundantly
  (O(K) FLOPs), and each device writes back every local copy —
  including fragment-shared-plane replicas, which therefore stay
  bit-identical;
- "loose" elements (graded transition slivers) are replicated: every
  device computes the identical small XLA pass on the loose node
  section, so their interface entries need no exchange beyond the
  same psum (contributed by device 0 only).

Per step the path moves: one plane triplet ppermute per brick (the
within-brick halo) + one [K, 9] psum — all O(surface), riding ICI.

Scope: rayleigh/mass/none damping, BKT with one Q set per brick
(uniform-Q node-basis kernels; the conv recursion is node-local and
displacement copies reconcile through the existing plane/psum
machinery, so attenuation adds ZERO exchange), and nonlinear soil
(per-device plastic subset passes, _nl_gmesh_bundle).  Packed
[8, LEN] state.  Heterogeneous-Q BKT, geostatic loading and DRM fall
back to gslab (depth-graded) or the unstructured sharded path.
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
from ..solver.pallas_mesh import (interface_epilogue_consts,
                                  mesh_plan_applies)


@dataclass
class _MBrick:
    offs: tuple
    plane: int                  # nyp * nxp (inner plane size)
    ez: int                     # max element layers per device
    nb: int                     # fragment node count (padded buffer)
    ez_of: np.ndarray = None    # [n_dev] owned layer counts
    z0s: np.ndarray = None      # [n_dev] first owned element layer
    B: int = 0
    T: int = 0
    LEN: int = 0
    Kp: object = None           # [n_dev, 8, LEN] packed consts
    tier: str = "general"
    kco: tuple = None
    gnid_local: list = None
    src_lidx: object = None
    src_mask: object = None
    # interface entry maps (padded; rows pad = K, cols pad = LEN-1)
    kg_rows: object = None      # [n_dev, Kg] gather: entry index
    kg_cols: object = None      # [n_dev, Kg] gather: fragment column
    ks_rows: object = None      # [n_dev, Ks] scatter incidences
    ks_cols: object = None


@dataclass
class GMeshTables:
    n_dev: int
    damping: str
    bricks: List[_MBrick]
    K: int = 0                  # interface entries
    G: int = 0
    D: int = 0
    ep: dict = field(default_factory=dict)   # epilogue consts
    # loose section (replicated on every device)
    NL: int = 0
    El: int = 0
    loose: dict = field(default_factory=dict)
    lg_rows: object = None      # loose interface gather (device 0)
    lg_cols: object = None
    ls_rows: object = None      # loose interface scatter (all devs)
    ls_cols: object = None
    src_direct_loose: list = field(default_factory=list)
    N: int = 0                  # global node count
    # nonlinear subset bundle (_nl_gmesh_bundle), None when absent
    nl: dict = None
    # BKT (per-brick uniform-Q node-basis tier; VERDICT r4 item 4)
    shear_only: bool = False
    conv_rows_node: int = 0
    conv_dtype_node: object = None
    bk_scal: list = None        # per-brick coefficient set


def build_gmesh_tables(mesh, tables, n_dev, src_ids=None,
                       dtype=jnp.float32,
                       min_brick_elems=2048, nl_tables=None,
                       params=None) -> GMeshTables:
    from ..solver.pallas_brick import (_tier_kco, pallas_fits,
                                       pallas_geometry)

    bkt = tables.damping == "bkt"
    if tables.damping not in ("rayleigh", "mass", "none", "bkt"):
        raise RuntimeError(f"gmesh: unsupported damping "
                           f"{tables.damping}")
    if bkt and nl_tables is not None:
        raise RuntimeError("nonlinear+BKT: unstructured path only")
    plan = build_plan(mesh, min_brick_elems=min_brick_elems)
    if not mesh_plan_applies(plan, "rayleigh", max_bricks=1 << 30):
        raise RuntimeError("plan exceeds the fused kernel envelope")
    if len(plan.bricks) < 1:
        raise RuntimeError("no dense bricks")
    if bkt and len(plan.loose_eidx):
        raise RuntimeError("gmesh BKT with loose elements: use gslab "
                           "or the unstructured path")

    # nonlinear elements: the fused kernels skip them (coefficients
    # zeroed below, stiffness.c:46-105 linear-element map) and a
    # per-device XLA subset pass re-adds plastic + damping forces
    # (attach_nonlinear_gmesh); here we only need their concat
    # columns for the zeroing
    nl_cols = None
    if nl_tables is not None and len(nl_tables.eidx):
        valid_cols = np.flatnonzero(plan.evalid_cat)
        col_of = -np.ones(tables.E, np.int64)
        col_of[plan.eidx_cat[valid_cols]] = valid_cols
        nl_cols = col_of[nl_tables.eidx]
        if not (nl_cols >= 0).all():
            raise RuntimeError("nonlinear element missing from plan; "
                               "unstructured path only")
        off_loose = plan.bricks[-1].off + plan.bricks[-1].nb
        if (nl_cols >= off_loose).any():
            raise RuntimeError("nonlinear elements in the loose "
                               "section; unstructured path only")

    t_host, metas, TOT = assemble_brick_tables(plan, tables,
                                               src_ids=src_ids)
    NB = len(plan.bricks)
    off_loose = plan.bricks[-1].off + plan.bricks[-1].nb
    NL = TOT - off_loose

    st = GMeshTables(n_dev=n_dev, damping=tables.damping, bricks=[],
                     NL=NL, N=mesh.nnum)
    if bkt:
        # per-brick uniform-Q node-basis tier (gslab's packed BKT
        # form): ONE coefficient set per brick.  The conv recursion is
        # node-local and shared-plane/interface displacement copies
        # stay identical under the existing reconciliation, so the
        # memory variables need NO extra exchange — the comm volume
        # per step is unchanged (damping.c:110-222 + the
        # partition-agnostic halo psolve.c:4946-5079)
        from ..solver.pallas_brick import (bkt_conv_dtype,
                                           bkt_kappa_zero,
                                           detect_bkt_uniform)
        st.shear_only = bkt_kappa_zero(tables.bkt)
        st.conv_rows_node = 8 if st.shear_only else 16
        st.conv_dtype_node = (dtype if st.shear_only
                              else bkt_conv_dtype(dtype))
        scals = [detect_bkt_uniform(
            tables.bkt, plan.eidx_cat[b.off:b.off + b.nb],
            plan.evalid_cat[b.off:b.off + b.nb], st.shear_only)
            for b in plan.bricks]
        if not all(s is not None for s in scals):
            raise RuntimeError(
                "gmesh BKT needs one Q set per brick (the "
                "heterogeneous-Q node tier is single-chip only); "
                "use gslab or the unstructured path")
        st.bk_scal = scals
    f = lambda x: jnp.asarray(x, dtype)
    i32 = lambda x: jnp.asarray(x, jnp.int32)

    # ---- epilogue consts -------------------------------------------
    ep = interface_epilogue_consts(plan, tables, src_ids, dtype)
    st.K, st.G, st.D = ep["K"], ep["G"], ep["D"]
    st.ep = ep

    # ---- per-brick fragments (gslab fragmenting) -------------------
    ex_arr = ep.get("ex_arr")
    ex_loc = ep.get("ex_loc")

    for bi, (b, gm) in enumerate(zip(plan.bricks, metas)):
        if not pallas_fits(gm.offs):
            raise RuntimeError(
                f"brick {bi}: plane exceeds the fused kernel's VMEM "
                f"tile")
        nzp, nyp, nxp = b.node_shape
        nz = nzp - 1
        if nz < n_dev:
            raise RuntimeError(
                f"brick {bi}: {nz} element layers cannot feed "
                f"{n_dev} devices")
        ez_lo, rr = divmod(nz, n_dev)
        ez = ez_lo + (1 if rr else 0)
        ez_of = np.array([ez_lo + (1 if d < rr else 0)
                          for d in range(n_dev)], np.int32)
        z0s = np.array([d * ez_lo + min(d, rr)
                        for d in range(n_dev)], np.int64)
        plane = nyp * nxp
        nb = (ez + 1) * plane
        B, T, LEN = pallas_geometry(gm.offs, nb)
        gb = _MBrick(offs=gm.offs, plane=plane, ez=ez, nb=nb,
                     ez_of=ez_of, z0s=z0s, B=B, T=T, LEN=LEN,
                     gnid_local=[])

        def pad(x):
            w = [(0, 0)] * (x.ndim - 1) + [(0, LEN - x.shape[-1])]
            return np.pad(x, w)

        def pad_nb(x):
            w = [(0, 0)] * (x.ndim - 1) + [(0, nb - x.shape[-1])]
            return np.pad(x, w)

        nlb = (nl_cols[(nl_cols >= b.off)
                       & (nl_cols < b.off + b.nb)] - b.off
               if nl_cols is not None else None)
        cms, mms, invs, vals = [], [], [], []
        for d in range(n_dev):
            ez_d = int(ez_of[d])
            n0 = b.off + int(z0s[d]) * plane
            real = (ez_d + 1) * plane
            n1 = n0 + real
            sel = slice(n0, n1)
            if bkt:
                v = plan.evalid_cat[sel].astype(np.float64).copy()
                v[ez_d * plane:] = 0.0     # ghost-plane elements
                vals.append(pad_nb(v))
            else:
                c1 = t_host["c1"][sel].copy()
                c2 = t_host["c2"][sel].copy()
                c3 = t_host["c3"][sel].copy()
                c1[ez_d * plane:] = 0.0    # ghost-plane elements
                c2[ez_d * plane:] = 0.0
                c3[ez_d * plane:] = 0.0
                if nlb is not None and len(nlb):
                    loc = nlb - int(z0s[d]) * plane
                    loc = loc[(loc >= 0) & (loc < ez_d * plane)]
                    c1[loc] = 0.0          # nl elements: subset pass
                    c2[loc] = 0.0
                    c3[loc] = 0.0
                beta = np.divide(c3, c1, out=np.zeros_like(c1),
                                 where=c1 != 0)
                cms.append(pad_nb(np.stack([c1, c2, beta])))
            mms.append(pad_nb(t_host["mass_minusaM"][:, sel]))
            invs.append(pad_nb(t_host["inv_mass"][sel]))
            gb.gnid_local.append(plan.gnid_cat[sel])
        if bkt:
            # uniform-Q node-basis kernel consts (build_bkt_uniform_
            # call K layout): mass_minusaM 0:3, inv_mass 3, valid 4
            kp = np.concatenate(
                [np.stack(mms), np.stack(invs)[:, None, :],
                 np.stack(vals)[:, None, :],
                 np.zeros((n_dev, 3, nb))], axis=1)
            gb.Kp = f(pad(kp))
        else:
            cm = np.stack(cms)
            gb.tier, gb.kco = _tier_kco(
                cm[:, 0].ravel(), cm[:, 1].ravel(), cm[:, 2].ravel(),
                cm[:, 0].ravel() != 0)
            kp = np.concatenate(
                [cm, np.stack(mms), np.stack(invs)[:, None, :],
                 np.zeros((n_dev, 1, cm.shape[-1]))], axis=1)
            gb.Kp = f(pad(kp))
        # sources are injected ONLY through the epilogue's group /
        # direct split (interface_epilogue_consts) — a gslab-style
        # first-copy injection here would double-count group sources

        # ---- interface entry maps ---------------------------------
        if st.K:
            sel_e = ex_arr == bi
            kk = np.flatnonzero(sel_e)
            loc = ex_loc[sel_e].astype(np.int64)
            z = loc // plane
            r = loc % plane
            own = np.searchsorted(z0s, z, side="right") - 1
            own = np.clip(own, 0, n_dev - 1)
            kg_rows, kg_cols = [], []
            ks_rows, ks_cols = [], []
            for d in range(n_dev):
                gmask = own == d
                kg_rows.append(kk[gmask])
                kg_cols.append(((z[gmask] - z0s[d]) * plane
                                + r[gmask]))
                # scatter incidences: owner + the lower replica when
                # the entry sits on the fragment-shared plane
                smask = gmask | ((own == d + 1) & (z == z0s[own]))
                ks_rows.append(kk[smask])
                ks_cols.append(((z[smask] - z0s[d]) * plane
                                + r[smask]))
            gb.kg_rows, gb.kg_cols = _pad_maps(
                kg_rows, kg_cols, st.K, LEN - 1)
            gb.ks_rows, gb.ks_cols = _pad_maps(
                ks_rows, ks_cols, st.K, LEN - 1)
        st.bricks.append(gb)

    # ---- loose section (replicated) --------------------------------
    g = plan.gnid_cat
    lslice = slice(off_loose, TOT)
    mm_rows = tables.mass_minusaM[g].T
    le = plan.loose_eidx
    El = len(le)
    st.El = El
    lo = {"mm_l": f(mm_rows[:, lslice]),
          "invm_l": f(tables.inv_mass[g][lslice])[None, :]}
    if El:
        lseg = (plan.loose_rows - off_loose).ravel()
        lperm = np.argsort(lseg, kind="stable")
        lo["l_rows"] = i32(plan.loose_rows - off_loose)
        lo["l_perm"] = i32(lperm)
        lo["l_seg"] = i32(lseg[lperm])
        for k in ("c1", "c2", "c3", "c4"):
            lo[f"l_{k}"] = f(getattr(tables, k)[le])
        lo["mcat"] = f(tables.m48.T)
    st.loose = lo
    if st.K:
        sel_e = ex_arr == NB
        kk = np.flatnonzero(sel_e)
        loc = ex_loc[sel_e].astype(np.int64)
        st.lg_rows = i32(kk)           # device 0 contributes
        st.lg_cols = i32(loc)
        st.ls_rows = i32(kk)           # every device writes
        st.ls_cols = i32(loc)
    st.gnid_loose = plan.gnid_cat[off_loose:TOT]
    st.src_direct_loose = [(pp, rows, iv) for a, pp, rows, iv
                           in ep["src_direct"] if a == NB]
    st.ep_src_direct_bricks = [(a, pp, rows, iv) for a, pp, rows, iv
                               in ep["src_direct"] if a < NB]
    # map direct brick sources onto per-device fragment tables
    if nl_cols is not None:
        st.nl = _nl_gmesh_bundle(st, plan, mesh, tables, nl_tables,
                                 params, nl_cols, dtype)
    st.src_brick = []
    for a, pp, rows, iv in st.ep_src_direct_bricks:
        gb = st.bricks[a]
        loc = np.asarray(pp, np.int64)
        z = loc // gb.plane
        r = loc % gb.plane
        # boundary planes owned by the LOWER device (matches the
        # kernel-source rule above)
        own = np.clip(np.searchsorted(gb.z0s, z, side="left") - 1,
                      0, n_dev - 1)
        lidx, lmask = [], []
        for d in range(n_dev):
            m = own == d
            col = np.where(m, (z - gb.z0s[d]) * gb.plane + r,
                           gb.LEN - 1)
            lidx.append(col.astype(np.int64))
            lmask.append(m)
        st.src_brick.append(
            (a, i32(np.stack(lidx)), jnp.asarray(np.stack(lmask)),
             i32(np.asarray(rows)), iv))
    return st


def _nl_gmesh_bundle(st, plan, mesh, tables, nl_tables, params,
                     nl_cols, dtype):
    """Per-DEVICE nonlinear subset tables for the gmesh path
    (VERDICT r4 item 3: the fused multi-chip nonlinear).

    The single-chip mesh path (pallas_mesh.attach_nonlinear_mesh)
    gathers nl-element corners, updates the plastic state
    (compute_nonlinear_state, nonlinear.c:1671) and scatters the
    stress-integral + damping forces pre-reconciliation
    (compute_addforce_nl, nonlinear.c:1544).  Every piece of that
    pass is element-local, and each element belongs to exactly one
    device's fragment layers — so the same pass runs per device on
    its own element slice, padded to a common width (shard_map needs
    one program), and the forces flow through the existing
    shared-plane recovery + interface psum like any kernel force
    (the reference runs the same loops on every rank).

    Geostatic loading is NOT supported here yet (falls back to the
    unstructured path): its gravity/bottom-reaction machinery needs
    per-fragment re-derivation."""
    from ..nonlinear import nl_device_tables

    t = nl_tables
    if t.cfg.geostatic_loading_t > 0:
        raise RuntimeError("geostatic loading on multi-chip: "
                           "unstructured path only (for now)")
    n_dev = st.n_dev
    Enl = len(t.eidx)
    g = plan.gnid_cat
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    f = lambda x: jnp.asarray(x, dtype)

    brick_of = np.zeros(Enl, np.int64)
    dev = np.zeros(Enl, np.int64)
    lcol = np.zeros(Enl, np.int64)
    for bi, b in enumerate(plan.bricks):
        m = (nl_cols >= b.off) & (nl_cols < b.off + b.nb)
        if not m.any():
            continue
        gb = st.bricks[bi]
        brick_of[m] = bi
        pos = nl_cols[m] - b.off
        offs = np.asarray(b.corner_offsets())
        if not (g[b.off + pos[:, None] + offs[None, :]]
                == mesh.elem_lnid[t.eidx[m]]).all():
            raise RuntimeError("brick corner order does not match "
                               "elem_lnid; unstructured path only")
        z = pos // gb.plane
        r = pos % gb.plane
        d_ = np.searchsorted(gb.z0s, z, side="right") - 1
        dev[m] = np.clip(d_, 0, n_dev - 1)
        lcol[m] = (z - gb.z0s[dev[m]]) * gb.plane + r

    counts = np.bincount(dev, minlength=n_dev)
    Mnl = max(int(counts.max()), 1)
    slot = np.zeros(Enl, np.int64)
    for d in range(n_dev):
        m = dev == d
        slot[m] = np.arange(int(m.sum()))

    # stacked per-device material rows, benign padding (mu=lam=0 ->
    # zero stress/force; k=1, sensitivity=1 keep the multiplier
    # algebra finite)
    def stack_mat(v, padval):
        out = np.full((n_dev, Mnl), padval, np.float64)
        out[dev, slot] = np.asarray(v, np.float64)
        return out

    nd = nl_device_tables(t, dtype)     # for S/F operators + flags
    mats = {
        "nl_mu": stack_mat(t.mu, 0.0),
        "nl_lam": stack_mat(t.lam, 0.0),
        "nl_alpha": stack_mat(t.alpha, 0.0),
        "nl_k": stack_mat(t.k, 1.0),
        "nl_hard": stack_mat(t.hard, 0.0),
        "nl_strainrate": stack_mat(t.strainrate, 0.0),
        "nl_sensitivity": stack_mat(t.sensitivity, 1.0),
        "nl_h": stack_mat(t.h, 1.0),
        "nl_c3": stack_mat(tables.c3[t.eidx], 0.0),
        "nl_c4": stack_mat(tables.c4[t.eidx], 0.0),
    }

    # per-brick gather/scatter over the flat per-device (slot, corner)
    # space; flat buffer = Mnl*8 rows + one trailing zero row that
    # padded entries point at
    gathers, scatters = [], []
    for bi, b in enumerate(plan.bricks):
        gb = st.bricks[bi]
        sel = brick_of == bi
        Mb = max(int(np.bincount(dev[sel],
                                 minlength=n_dev).max()), 1) \
            if sel.any() else 0
        if Mb == 0:
            continue
        offs = np.asarray(b.corner_offsets())
        loc = np.zeros((n_dev, Mb * 8), np.int64)
        dst = np.full((n_dev, Mb * 8), Mnl * 8, np.int64)
        sc_perm = np.full((n_dev, Mb * 8), Mnl * 8, np.int64)
        sc_col = np.full((n_dev, Mb * 8), gb.LEN - 1, np.int64)
        sc_invm = np.zeros((n_dev, Mb * 8), np.float64)
        for d in range(n_dev):
            m = sel & (dev == d)
            k = int(m.sum())
            if not k:
                continue
            l8 = (lcol[m][:, None] + offs[None, :]).ravel()
            d8 = (slot[m][:, None] * 8
                  + np.arange(8)[None, :]).ravel()
            loc[d, :k * 8] = l8
            dst[d, :k * 8] = d8
            order = np.argsort(l8, kind="stable")
            sc_perm[d, :k * 8] = d8[order]
            sc_col[d, :k * 8] = l8[order]
            gpos = (nl_cols[m][:, None] + offs[None, :]).ravel()
            sc_invm[d, :k * 8] = \
                tables.inv_mass[g[gpos]][order]
        gathers.append((bi, i32(loc), i32(dst)))
        scatters.append((bi, i32(sc_perm), i32(sc_col),
                         f(sc_invm)))

    bundle = {
        "n": Mnl, "dt": params.delta_t, "dt2": params.delta_t ** 2,
        "S_op": nd["S"], "F_op": nd["F"], "mcat": f(tables.m48.T),
        "model": nd["model"], "rate_dep": nd["rate_dep"],
        "gather": gathers, "scatter": scatters,
        "mats": mats,
        # host-side metadata for state conversion (checkpoints)
        "dev": dev, "slot": slot, "eidx": t.eidx,
    }
    return bundle


def _pad_maps(rows_list, cols_list, pad_row, pad_col):
    """[n_dev, M] padded index tables (row pad -> pad_row, col pad ->
    pad_col, a dead padding column)."""
    M = max((len(r) for r in rows_list), default=0)
    M = max(M, 1)
    n_dev = len(rows_list)
    ro = np.full((n_dev, M), pad_row, np.int64)
    co = np.full((n_dev, M), pad_col, np.int64)
    for d in range(n_dev):
        ro[d, :len(rows_list[d])] = rows_list[d]
        co[d, :len(cols_list[d])] = cols_list[d]
    return jnp.asarray(ro, jnp.int32), jnp.asarray(co, jnp.int32)


def gmesh_step_builder(st: GMeshTables, axis="d", dtype=jnp.float32,
                       interpret=False):
    """(local_step, tdev_sharded, trep, state_spec) for the general
    graded multi-chip path."""
    from ..physics.kmats import spectral_factors
    from ..solver.pallas_brick import (build_bkt_uniform_call,
                                       build_call_packed, diag_dd)

    n_dev = st.n_dev
    f1e, f2e = spectral_factors()
    dd = diag_dd(f1e, f2e, dtype)
    ep = st.ep
    bkt = st.damping == "bkt"

    calls = []
    for bi, gb in enumerate(st.bricks):
        if bkt:
            calls.append(build_bkt_uniform_call(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, dtype,
                st.bk_scal[bi], shear_only=st.shear_only,
                conv_dtype=st.conv_dtype_node, interpret=interpret))
        else:
            calls.append(build_call_packed(
                gb.offs, gb.B, gb.offs[7], gb.T, gb.LEN, f1e, f2e,
                dtype, interpret=interpret, tier=gb.tier,
                kco=gb.kco))

    tdev = {}
    for bi, gb in enumerate(st.bricks):
        tdev[f"K{bi}"] = gb.Kp
        if st.K:
            tdev[f"kgr{bi}"] = gb.kg_rows
            tdev[f"kgc{bi}"] = gb.kg_cols
            tdev[f"ksr{bi}"] = gb.ks_rows
            tdev[f"ksc{bi}"] = gb.ks_cols
    for ai, (a, lidx, lmask, rows, iv) in enumerate(st.src_brick):
        tdev[f"dsl{ai}"] = lidx
        tdev[f"dsm{ai}"] = lmask
    nl = st.nl
    if nl is not None:
        for k, v in nl["mats"].items():
            tdev[k] = jnp.asarray(v, dtype)
        for gi, (bi, loc, dst) in enumerate(nl["gather"]):
            tdev[f"nlgl{gi}"] = loc
            tdev[f"nlgd{gi}"] = dst
        for gi, (bi, perm, col, invm) in enumerate(nl["scatter"]):
            tdev[f"nlsp{gi}"] = perm
            tdev[f"nlsc{gi}"] = col
            tdev[f"nlsm{gi}"] = invm

    ring_dn = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    ring_up = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    lo = st.loose
    NB = len(st.bricks)

    def local_step(t, carry, x):
        srcf, _step = x
        convs = None
        if bkt:
            (Ss, S_l, convs) = carry
        elif nl is not None:
            (Ss, S_l, nls) = carry
        else:
            (Ss, S_l) = carry
        idx = jax.lax.axis_index(axis)
        uns = []
        new_conv = []

        # ---- pass 1: fused kernels + direct brick sources ----------
        for bi, gb in enumerate(st.bricks):
            S = Ss[bi]
            if bkt:
                un, cvn = calls[bi](S, S, t[f"K{bi}"], convs[bi],
                                    convs[bi])
                new_conv.append(cvn)
            else:
                un = calls[bi](S, S, t[f"K{bi}"], dd)
            for ai, (a, _l, _m, rows, ivv) in enumerate(st.src_brick):
                if a != bi:
                    continue
                sf = jnp.where(t[f"dsm{ai}"][:, None],
                               srcf[rows] * ivv, 0)
                un = un.at[:3, t[f"dsl{ai}"]].add(sf.T)
            uns.append(un)

        # ---- nonlinear subset pass (pre-halo, pre-reconciliation) --
        # plastic state update + stress-integral & damping forces of
        # the nl elements owned by THIS device; the forces flow into
        # the shared-plane recovery and interface psum like any
        # kernel force (nonlinear.c:1544-1823 on every rank)
        if nl is not None:
            from ..nonlinear import nl_force, nl_state_update
            Mnl = nl["n"]
            ue_f = jnp.zeros((Mnl * 8 + 1, 3), dtype)
            upe_f = jnp.zeros((Mnl * 8 + 1, 3), dtype)
            for gi, (bi, _, _) in enumerate(nl["gather"]):
                loc = t[f"nlgl{gi}"]
                dsti = t[f"nlgd{gi}"]
                ue_f = ue_f.at[dsti].set(Ss[bi][0:3][:, loc].T)
                upe_f = upe_f.at[dsti].set(Ss[bi][3:6][:, loc].T)
            ue = ue_f[:-1].reshape(Mnl, 24)
            upe = upe_f[:-1].reshape(Mnl, 24)
            d_dev = {"S": nl["S_op"], "F": nl["F_op"],
                     "model": nl["model"],
                     "rate_dep": nl["rate_dep"],
                     "mu": t["nl_mu"], "lam": t["nl_lam"],
                     "alpha": t["nl_alpha"], "k": t["nl_k"],
                     "hard": t["nl_hard"],
                     "strainrate": t["nl_strainrate"],
                     "sensitivity": t["nl_sensitivity"],
                     "h": t["nl_h"]}
            nls = nl_state_update(d_dev, ue, nls, nl["dt"])
            fnl = nl_force(d_dev, nls, nl["dt2"])
            du = ue - upe
            a_ = t["nl_c3"][:, None] * du
            b_ = t["nl_c4"][:, None] * du
            f_lin = -(jnp.concatenate([a_, b_], 1) @ nl["mcat"].T)
            F_flat = jnp.concatenate(
                [(fnl + f_lin).reshape(-1, 3),
                 jnp.zeros((1, 3), dtype)], axis=0)
            for gi, (bi, _, _, _) in enumerate(nl["scatter"]):
                vals = (F_flat[t[f"nlsp{gi}"]]
                        * t[f"nlsm{gi}"][:, None])
                uns[bi] = uns[bi].at[0:3, t[f"nlsc{gi}"]].add(vals.T)

        # ---- pass 2: within-brick fragment halos -------------------
        for bi, gb in enumerate(st.bricks):
            S = Ss[bi]
            u, up = S[0:3], S[3:6]
            un = uns[bi]
            if bkt:
                # uniform-BKT K layout: mm 0:3, invm 3, valid 4
                iv = t[f"K{bi}"][3]
                m1 = t[f"K{bi}"][0:3]
            else:
                iv = t[f"K{bi}"][6]
                m1 = t[f"K{bi}"][3:6]

            # within-brick fragment halo: shared-plane force recovery
            # + ppermute (identical to gslab.py's fused path)
            plane = gb.plane
            zb = jnp.asarray(gb.ez_of, jnp.int32)[idx] * plane
            z0 = jnp.zeros((), zb.dtype)

            def dslice(a_, off, rows_):
                return jax.lax.dynamic_slice(a_, (z0, off),
                                             (rows_, plane))

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
            uns[bi] = un

        # ---- loose elements (replicated small XLA pass) -----------
        u_l, up_l = S_l[0:3], S_l[3:6]
        F_l = jnp.zeros((3, st.NL), dtype)
        if st.El:
            uT, upT = u_l.T, up_l.T
            ue = uT[lo["l_rows"]].reshape(st.El, 24)
            upe = upT[lo["l_rows"]].reshape(st.El, 24)
            du = ue - upe
            a_ = lo["l_c1"][:, None] * ue + lo["l_c3"][:, None] * du
            b_ = lo["l_c2"][:, None] * ue + lo["l_c4"][:, None] * du
            lf = -(jnp.concatenate([a_, b_], 1) @ lo["mcat"].T)
            flat = lf.reshape(-1, 3)[lo["l_perm"]]
            F_l = jax.ops.segment_sum(flat, lo["l_seg"],
                                      num_segments=st.NL,
                                      indices_are_sorted=True).T
        un_l = u_l + (F_l + lo["mm_l"] * (u_l - up_l)) * lo["invm_l"]
        for pp, rows, iv in st.src_direct_loose:
            un_l = un_l.at[:, pp].add((srcf[rows] * iv).T)

        # ---- interface reconciliation over ONE psum ---------------
        if st.K:
            buf = jnp.zeros((st.K + 1, 9), dtype)
            for bi, gb in enumerate(st.bricks):
                cols = t[f"kgc{bi}"]
                rows = t[f"kgr{bi}"]
                S = Ss[bi]
                ent = jnp.concatenate(
                    [S[0:3, cols], S[3:6, cols],
                     uns[bi][0:3, cols]], axis=0).T
                buf = buf.at[rows].set(ent)
            if st.lg_rows is not None and len(st.lg_rows):
                entl = jnp.concatenate(
                    [u_l[:, st.lg_cols], up_l[:, st.lg_cols],
                     un_l[:, st.lg_cols]], axis=0).T
                entl = entl * jnp.where(idx == 0, 1.0, 0.0)
                buf = buf.at[st.lg_rows].set(entl)
            full = jax.lax.psum(buf[:st.K], axis)
            u_ex = full[:, 0:3]
            up_ex = full[:, 3:6]
            un_ex = full[:, 6:9]
            du_ex = u_ex - up_ex
            F_ex = (un_ex - u_ex) * ep["mass_ex"] \
                - ep["mm_ex"] * du_ex
            tot = jax.ops.segment_sum(F_ex, ep["ex_seg"],
                                      num_segments=st.G,
                                      indices_are_sorted=False)
            if ep["src_grp_idx"] is not None:
                tot = tot.at[ep["src_grp_idx"]].add(
                    srcf[ep["src_grp_rows"]])
            if st.D:
                contrib = (tot[ep["dn_grp"]][:, None, :]
                           * ep["dn_wgt"][:, :, None])
                tot = tot.at[ep["dn_anc_grp"]].add(contrib)
            un_ex = u_ex + (tot[ep["ex_seg"]]
                            + ep["mm_ex"] * du_ex) * ep["invm_ex"]
            if st.D:
                u_rep = un_ex[ep["grp_first"]]
                dnv = (u_rep[ep["dn_anc_grp"]]
                       * ep["dn_wgt"][:, :, None]).sum(axis=1)
                un_ex = un_ex.at[ep["dnc_k"]].set(dnv[ep["dnc_src"]])
            un_pad = jnp.concatenate(
                [un_ex, jnp.zeros((1, 3), dtype)], axis=0)
            for bi, gb in enumerate(st.bricks):
                rows = t[f"ksr{bi}"]
                cols = t[f"ksc{bi}"]
                uns[bi] = uns[bi].at[0:3, cols].set(
                    un_pad[rows].T)
            if st.ls_rows is not None and len(st.ls_rows):
                un_l = un_l.at[:, st.ls_cols].set(
                    un_ex[st.ls_rows].T)

        Sn_l = jnp.concatenate(
            [un_l, u_l, S_l[6:8]], axis=0)
        if bkt:
            return (tuple(uns), Sn_l, tuple(new_conv)), None
        if nl is not None:
            return (tuple(uns), Sn_l, nls), None
        return (tuple(uns), Sn_l), None

    one = (P(axis),) * NB
    # the loose section is REPLICATED CONTENT on a sharded layout
    # ([n_dev, 8, NL], every row identical): every device computes
    # the same small pass, which keeps the driver's uniform
    # leading-device-axis state convention
    sspec = (one, P(axis))
    if bkt:
        sspec = sspec + (one,)
    elif nl is not None:
        sspec = sspec + ((P(axis),) * 3,)
    return local_step, tdev, sspec


def make_gmesh_step(st: GMeshTables, mesh_dev: Mesh, axis="d",
                    dtype=jnp.float32, interpret=False):
    local_step, tdev, sspec = gmesh_step_builder(
        st, axis=axis, dtype=dtype, interpret=interpret)

    def scan_all(t, state, xs):
        t = jax.tree.map(lambda v: v[0], t)
        state = jax.tree.map(lambda v: v[0], state)
        state, _ = jax.lax.scan(partial(local_step, t), state, xs)
        return jax.tree.map(lambda v: v[None], state)

    tspec = jax.tree.map(lambda _: P(axis), tdev)
    smap = jax.shard_map(scan_all, mesh=mesh_dev,
                         in_specs=(tspec, sspec, P()),
                         out_specs=sspec, check_vma=False)
    return jax.jit(smap), tdev


def run_gmesh_solver(st: GMeshTables, mesh_dev, src_forces,
                     total_steps, dt, dtype=jnp.float32, chunk=None,
                     interpret=False):
    scan_fn, tdev = make_gmesh_step(st, mesh_dev, dtype=dtype,
                                    interpret=interpret)
    n_dev = st.n_dev
    Ss = tuple(jnp.zeros((n_dev, 8, gb.LEN), dtype)
               for gb in st.bricks)
    state = (Ss, jnp.zeros((n_dev, 8, st.NL), dtype))
    if st.damping == "bkt":
        state = state + (tuple(
            jnp.zeros((n_dev, st.conv_rows_node, gb.LEN),
                      st.conv_dtype_node) for gb in st.bricks),)
    elif st.nl is not None:
        state = state + (init_nl_gmesh_state(st, dtype),)
    if chunk is None:
        chunk = min(total_steps, 1000)
    dt2 = dt * dt
    s = 0
    with mesh_dev:
        while s < total_steps:
            k = min(chunk, total_steps - s)
            xs = (jnp.asarray(src_forces[s:s + k] * dt2, dtype),
                  jnp.arange(s, s + k, dtype=jnp.int32))
            state = scan_fn(tdev, state, xs)
            s += k
    return state


def init_nl_gmesh_state(st: GMeshTables, dtype):
    """Zero plastic state for the per-device nl subset pass:
    (stresses, pstrains, ep) stacked over devices."""
    n_dev, Mnl = st.n_dev, st.nl["n"]
    return (jnp.zeros((n_dev, Mnl, 8, 6), dtype),
            jnp.zeros((n_dev, Mnl, 8, 6), dtype),
            jnp.zeros((n_dev, Mnl, 8), dtype))


def gmesh_u_global(st: GMeshTables, state, N=None):
    """Global [N, 3] displacement from the sharded state (loose
    section written first so brick copies win at shared nodes — all
    copies agree after reconciliation anyway)."""
    if N is None:
        N = st.N
    Ss, S_l = state[0], state[1]
    u = np.zeros((N, 3))
    if st.NL:
        u[st.gnid_loose] = np.asarray(S_l)[0, 0:3].T
    for bi, gb in enumerate(st.bricks):
        arr = np.asarray(Ss[bi])            # [n_dev, 8, LEN]
        for d in range(st.n_dev):
            gl = gb.gnid_local[d]
            u[gl] = arr[d, 0:3, :len(gl)].T
    return u
