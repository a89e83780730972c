"""Multi-brick fused Pallas solver: the graded-mesh TPU fast path.

The XLA brick path (brickstep.py) evaluates each brick with
materialized [24, S] intermediates; here every dense brick runs the
fused single-pass kernel (pallas_brick.py), and an XLA epilogue
reconciles the O(interface) shared/hanging nodes of the brick plan
(bricks.py).  The kernel never writes its element forces to HBM: the
central-difference update is linear in the force, so the local force
at any node is recoverable from the kernel's own output,

    F_loc = (u_next - u) * mass - mass_minusaM * (u - up),

and reconciliation only gathers (u, up, u_next) at the interface
copies, sums per shared node, applies the dangling distribute/assign
algebra (compute_adjust, psolve.c:5936-6039), and rewrites the few
affected entries.  "Loose" elements (graded-transition slivers too
small to brick) keep the XLA gather/scatter path on their own node
section.

Semantics match brickstep.py exactly (same operators, same group
algebra); tests/test_pallas_mesh.py checks f64 agreement on graded
meshes for both rayleigh and BKT damping.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bricks import BrickPlan
from .pallas_brick import (_tier_kco, bk_row_names, bkn_coef_keys,
                           bkt_conv_dtype, bkt_kappa_zero,
                           bkt_mix_epilogue, bkt_nodeq_tables,
                           build_bkt_call, build_bkt_node_call,
                           build_bkt_uniform_call, build_call,
                           build_call_packed, conv_corner_to_node,
                           conv_corner_to_nodeq, conv_mix_of_corner,
                           conv_node_to_corner, conv_nodeq_to_corner,
                           detect_bkt_uniform, diag_dd, pallas_fits,
                           pallas_geometry, spectral_factors)


def mesh_plan_applies(plan: BrickPlan, damping: str,
                      max_bricks: Optional[int] = None) -> bool:
    """True if the multi-brick fused path covers this plan."""
    if max_bricks is None:
        max_bricks = int(os.environ.get("HT_PALLAS_MAX_BRICKS", 24))
    return (len(plan.bricks) <= max_bricks
            and damping in ("rayleigh", "mass", "none", "bkt")
            and all(pallas_fits(b.corner_offsets())
                    for b in plan.bricks))


class _Gather:
    """Precomputed extraction of K interface entries spread over the
    per-brick (+ loose) arrays: entry k reads column locals[k] of
    array arrs[k].

    When the entries are ordered by (array, local) -- the
    MeshPallasTables interface ordering -- each array's locals are
    sorted, and on depth-graded meshes (brick interfaces = z-planes of
    the brick grids, the production terashake shape) they collapse
    into a handful of contiguous runs.  Runs extract/insert with
    static slices at HBM speed instead of row gathers (~50x faster on
    TPU); fragmented remainders keep the gather path."""

    MAX_RUNS = 64

    def __init__(self, arrs, locals_, n_arrays, K):
        self.K = K
        self.plan = []      # gather fallback: (arr, src, dst)
        self.runs = None    # slice mode: list of (arr, lo, size, dst0)
        order_ok = True
        runs = []
        pos = 0
        # entries must already be grouped by array with sorted locals
        # and identity dst for the slice mode
        for a in range(n_arrays):
            m = arrs == a
            if not m.any():
                continue
            idx = np.flatnonzero(m)
            loc = locals_[idx]
            if not ((idx == np.arange(pos, pos + len(idx))).all()
                    and (np.diff(loc) > 0).all()):
                order_ok = False
            # maximal contiguous runs
            brk = np.flatnonzero(np.diff(loc) != 1)
            starts = np.concatenate([[0], brk + 1])
            ends = np.concatenate([brk + 1, [len(loc)]])
            for s, e in zip(starts, ends):
                runs.append((a, int(loc[s]), int(e - s),
                             int(pos + s)))
            pos += len(idx)
            self.plan.append((a, jnp.asarray(loc, jnp.int32),
                              jnp.asarray(idx, jnp.int32)))
        if order_ok and len(runs) <= self.MAX_RUNS:
            self.runs = runs

    def __call__(self, arrays, dtype):
        if self.runs is not None:
            parts = [jax.lax.dynamic_slice_in_dim(arrays[a], lo, n,
                                                  axis=1).T
                     for a, lo, n, _ in self.runs]
            return jnp.concatenate(parts, axis=0).astype(dtype)
        out = jnp.zeros((self.K, 3), dtype)
        for a, src, dst in self.plan:
            out = out.at[dst].set(arrays[a][:, src].T)
        return out

    def scatter_set(self, arrays, vals):
        arrays = list(arrays)
        if self.runs is not None:
            for a, lo, n, d0 in self.runs:
                arrays[a] = jax.lax.dynamic_update_slice_in_dim(
                    arrays[a], vals[d0:d0 + n].T.astype(
                        arrays[a].dtype), lo, axis=1)
            return arrays
        for a, src, dst in self.plan:
            arrays[a] = arrays[a].at[:, src].set(
                vals[dst].T.astype(arrays[a].dtype))
        return arrays


class MeshPallasTables:
    """Host-built device tables for the multi-brick fused step."""

    def __init__(self, plan: BrickPlan, tables, src_ids=None,
                 st_nodes=None, st_phi=None, dtype=jnp.float32,
                 tile=None, nl=None, drm=None):
        assert mesh_plan_applies(plan, tables.damping, max_bricks=1 << 30)
        self.plan = plan
        self.dtype = dtype
        self.damping = tables.damping
        self.nl = nl             # attach_nonlinear_mesh bundle
        self.drm = drm           # attach_drm_mesh bundle
        bkt = tables.damping == "bkt"
        assert nl is None or not bkt
        f = lambda x: jnp.asarray(x, dtype)
        i32 = lambda x: jnp.asarray(x, jnp.int32)

        NB = len(plan.bricks)
        self.NB = NB
        off_loose = (plan.bricks[-1].off + plan.bricks[-1].nb
                     if NB else 0)
        self.off_loose = off_loose
        TOT = plan.total_nb
        NL = TOT - off_loose
        self.NL = NL

        g = plan.gnid_cat
        ev = plan.evalid_cat
        ei = plan.eidx_cat

        def etab_arr(v):
            return np.where(ev, v[ei], 0.0)

        # ---- dense plane reconciler (depth-graded fast path) ----------
        # built first: the packed-state mode below requires it (or a
        # plan with no interfaces at all)
        from .planerec import PlaneReconciler
        self.plane_rec = PlaneReconciler.build(plan, tables,
                                               src_ids=src_ids,
                                               dtype=dtype)
        # packed-state mode: per-brick [8, LEN] S = (u 0:3, up 3:6) and
        # [8, LEN] K consts — half the physical HBM bytes and the MXU
        # element-operator path (see pallas_brick._make_kernel
        # packed_state).  The index-based reconciliation epilogue
        # writes whole columns, so packed requires the dense plane
        # reconciler (or an interface-free plan).  Elastic always
        # qualifies; BKT qualifies when EVERY brick is Q-uniform
        # (possibly with a different coefficient set per brick — the
        # per-layer production case), riding the node-basis
        # memory-variable kernel (_make_bkt_uniform_kernel, 8x less
        # convolution traffic).
        rec_ok = (self.plane_rec is not None
                  or len(plan.ex_pos) == 0)
        packed_env = os.environ.get("HT_MESH_PACKED", "1") != "0"

        # ---- per-brick geometry (tile sizing) -------------------------
        # size the tile to the brick: big enough for the halo
        # (o7 + 130) AND to cover a large brick with full tiles (a tile
        # sized to a small o7 on a multi-million-node brick spends ~all
        # its streaming on the halo), but no bigger than the brick
        # needs (small bricks skip the 32k pad)
        self.geo = []        # (offs, B, o7, T, LEN) per brick
        for b in plan.bricks:
            offs = tuple(b.corner_offsets())
            o7 = offs[7]
            tb = tile
            if tb is None:
                cap = int(os.environ.get("HT_PALLAS_TILE", 32768))
                want = max(o7 + 130, min(b.nb, cap), 512)
                tb = min(cap, 1 << int(np.ceil(np.log2(want))))
            B, T, LEN = pallas_geometry(offs, b.nb, tile=tb)
            self.geo.append((offs, B, o7, T, LEN))

        mm_rows = tables.mass_minusaM[g].T       # [3, TOT]
        invm_row = tables.inv_mass[g]

        # ---- per-brick BKT mode --------------------------------------
        # "uniform" (one coefficient set -> folded scalars,
        # _make_bkt_uniform_kernel) or "nodeq" (heterogeneous Q ->
        # per-node coefficient rows + mixed epilogue,
        # pallas_brick.bkt_nodeq_tables); detected regardless of the
        # packed gate (_fit_mesh_conv needs the node assignment for
        # exact cross-basis restores).
        self.bk_scal = None      # list iff EVERY brick is uniform
        self.bkt_modes = None
        if bkt:
            shear_only = bkt_kappa_zero(tables.bkt)
            uni_ok = os.environ.get("HT_BKT_UNIFORM", "1") != "0"
            self.bkt_modes = []
            for bi, b in enumerate(plan.bricks):
                lo, hi = b.off, b.off + b.nb
                offs, _, _, _, LEN = self.geo[bi]
                scal = (detect_bkt_uniform(
                    tables.bkt, ei[lo:hi], ev[lo:hi], shear_only)
                    if uni_ok else None)
                if scal is not None:
                    self.bkt_modes.append(("uniform", scal))
                    continue

                def padb(x):
                    out = np.zeros(LEN)
                    out[:b.nb] = x[lo:hi]
                    return out

                coef_e = np.stack(
                    [padb(etab_arr(tables.bkt[k]))
                     for k in bkn_coef_keys(shear_only)])
                ev_pad = np.zeros(LEN, bool)
                ev_pad[:b.nb] = ev[lo:hi]
                nq = bkt_nodeq_tables(
                    coef_e, padb(etab_arr(tables.bkt["mu_f"])),
                    padb(etab_arr(tables.bkt["kappa_f"])),
                    np.stack([padb(mm_rows[c]) for c in range(3)]),
                    padb(invm_row), ev_pad, offs, shear_only, dtype)
                self.bkt_modes.append(
                    ("nodeq" if not nq["declined"] else None, nq))
            if all(m[0] == "uniform" for m in self.bkt_modes):
                self.bk_scal = [m[1] for m in self.bkt_modes]

        self.packed = (packed_env and rec_ok
                       and (not bkt
                            or all(m[0] is not None
                                   for m in self.bkt_modes)))
        if (nl is not None or drm is not None) and not self.packed:
            raise RuntimeError(
                "nonlinear/DRM ride the packed mesh path; this plan "
                "needs the index epilogue — unstructured path only")

        # ---- per-brick padded constant tables -------------------------
        self.cm = []
        self.bk = []
        self.mm = []
        self.invm = []
        self.Kp = []         # packed mode: [8, LEN] consts per brick
        self.tiers = []      # per-brick kernel specialization
        self.evalid_b = []   # bkt: per-brick element validity [LEN]
        if bkt:
            self.bkt_shear_only = bkt_kappa_zero(tables.bkt)
            self.conv_rows = 48 if self.bkt_shear_only else 96
            self.conv_dtype = bkt_conv_dtype(dtype)
            # node-basis conv dims for the packed uniform-Q tier
            # (pallas_brick.PallasBrickTables convention: shear-only
            # keeps f32 in one physical tile, the full state is bf16)
            self.conv_rows_node = 8 if self.bkt_shear_only else 16
            self.conv_dtype_node = (dtype if self.bkt_shear_only
                                    else bkt_conv_dtype(dtype))
        if not bkt:
            c1 = etab_arr(tables.c1)
            c2 = etab_arr(tables.c2)
            c3 = etab_arr(tables.c3)
            if nl is not None:
                # linear-element map: the fused kernels contribute
                # nothing for nonlinear elements (c1=c2=0 also zeroes
                # beta below); the nl subset pass re-adds their
                # damping explicitly
                c1[nl["cols"]] = 0.0
                c2[nl["cols"]] = 0.0
                c3[nl["cols"]] = 0.0
            beta = np.divide(c3, c1, out=np.zeros_like(c1),
                             where=c1 != 0)
            cm_rows = np.stack([c1, c2, beta])
        else:
            bk_rows = np.stack(
                [etab_arr(tables.bkt[k])
                 for k in bk_row_names(self.bkt_shear_only)])
        for bi, b in enumerate(plan.bricks):
            offs, B, o7, T, LEN = self.geo[bi]
            lo, hi = b.off, b.off + b.nb

            def pad2(rows):
                out = np.zeros((rows.shape[0], LEN), np.float64)
                out[:, :b.nb] = rows[:, lo:hi]
                return f(out)

            def pad2_cat(parts, total):
                """pad2 of a row-concat, slicing each part to the
                brick first (a pre-concat would materialize [R, TOT]
                temporaries — gigabytes at production mesh sizes);
                rows beyond the parts stay zero."""
                out = np.zeros((total, LEN), np.float64)
                r = 0
                for pt_ in parts:
                    pt_ = pt_ if pt_.ndim == 2 else pt_[None]
                    out[r:r + pt_.shape[0], :b.nb] = pt_[:, lo:hi]
                    r += pt_.shape[0]
                return f(out)

            if bkt:
                # per-brick element-validity mask over the padded
                # columns (conv basis conversions on restore)
                evb_pad = np.zeros(LEN, bool)
                evb_pad[:b.nb] = ev[lo:hi]
                self.evalid_b.append(evb_pad)
                if self.packed and self.bkt_modes[bi][0] == "nodeq":
                    # general-Q K block (build_bkt_node_call layout),
                    # already LEN-padded by bkt_nodeq_tables
                    self.Kp.append(self.bkt_modes[bi][1]["K"])
                    self.bk.append(None)
                elif self.packed:
                    # uniform-Q node-basis kernel consts: mass_minusaM
                    # 0:3, inv_mass 3, element validity 4
                    # (build_bkt_uniform_call's K layout)
                    self.Kp.append(pad2_cat(
                        [mm_rows, invm_row, ev.astype(np.float64)],
                        total=8))
                    self.bk.append(None)
                else:
                    self.bk.append(pad2(bk_rows))
                self.cm.append(None)
                self.tiers.append(("general", None))
            else:
                evb = ev[lo:hi]
                self.tiers.append(_tier_kco(
                    cm_rows[0, lo:hi], cm_rows[1, lo:hi],
                    cm_rows[2, lo:hi], evb))
                if self.packed:
                    self.Kp.append(pad2_cat(
                        [cm_rows, mm_rows, invm_row], total=8))
                    self.cm.append(None)
                else:
                    self.cm.append(pad2(cm_rows))
                self.bk.append(None)
            if not self.packed:
                self.mm.append(pad2(mm_rows))
                self.invm.append(pad2(invm_row[None, :]))

        # ---- loose section -------------------------------------------
        lslice = slice(off_loose, TOT)
        self.mm_l = f(mm_rows[:, lslice])
        self.invm_l = f(invm_row[lslice])[None, :]
        le = plan.loose_eidx
        self.El = El = len(le)
        if El:
            assert (plan.loose_rows >= off_loose).all()
            self.l_rows = i32(plan.loose_rows - off_loose)
            lseg = (plan.loose_rows - off_loose).ravel()
            lperm = np.argsort(lseg, kind="stable")
            self.l_perm = i32(lperm)
            self.l_seg = i32(lseg[lperm])
            if bkt:
                self.l_bkt = {k: f(v[le]) for k, v in tables.bkt.items()}
                self.kmu_cat = f(tables.kmu.T)
                self.kkappa_cat = f(tables.kkappa.T)
            else:
                for k in ("c1", "c2", "c3", "c4"):
                    setattr(self, f"l_{k}", f(getattr(tables, k)[le]))
                self.mcat = f(tables.m48.T)

        # ---- mixed-element carry slots (general-Q BKT bricks) --------
        # the conv carry tuple is (per-brick conv, [loose 4-tuple],
        # then one [R2, 8, M] epilogue carry per nodeq brick with
        # mixed elements, in brick order)
        self.mix_slots = {}
        if bkt and self.bkt_modes is not None:
            base = NB + (1 if El else 0)
            for bi, (mode, mval) in enumerate(self.bkt_modes):
                if mode == "nodeq" and mval["M"]:
                    self.mix_slots[bi] = base
                    base += 1

        # ---- reconciliation plan in (array, local) coordinates -------
        ep = interface_epilogue_consts(plan, tables, src_ids, dtype)
        self.K, self.G, self.D = ep["K"], ep["G"], ep["D"]
        if self.K:
            self.ex_gather = _Gather(ep["ex_arr"], ep["ex_loc"],
                                     NB + 1, self.K)
            for k in ("ex_seg", "grp_first", "mass_ex", "invm_ex",
                      "mm_ex"):
                setattr(self, k, ep[k])
        if self.D:
            for k in ("dn_grp", "dn_anc_grp", "dn_wgt", "dnc_k",
                      "dnc_src"):
                setattr(self, k, ep[k])
        self.src_grp_idx = ep["src_grp_idx"]
        self.src_grp_rows = ep["src_grp_rows"]
        self.src_direct = ep["src_direct"]

        # ---- stations --------------------------------------------------
        self.st = None
        if st_nodes is not None and len(np.asarray(st_nodes)):
            st_nodes = np.asarray(st_nodes)
            pos = first_concat_copy(plan, st_nodes,
                                    what="station node")
            arr, loc = locate_concat(plan, pos)
            self.st = (_Gather(arr, loc, NB + 1, st_nodes.size),
                       st_nodes.shape, f(st_phi))


def interface_epilogue_consts(plan, tables, src_ids, dtype):
    """Device constants of the index-based interface reconciliation
    (compute_adjust semantics, psolve.c:5936-6039): per-copy gather
    coordinates, group segments, per-entry node masses, the dangling
    distribute/assign tables, and the group/direct source split.
    Shared by the single-chip multi-brick path (MeshPallasTables) and
    the multi-chip general graded path (parallel/gmesh.py)."""
    f = lambda x: jnp.asarray(x, dtype)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    g = plan.gnid_cat
    NB = len(plan.bricks)
    out = {"K": len(plan.ex_pos), "G": len(plan.grp_node),
           "D": len(plan.dn_grp), "src_grp_idx": None,
           "src_grp_rows": None, "src_direct": []}
    K, G, D = out["K"], out["G"], out["D"]
    ex_seg = None
    if K:
        # order interface entries by concat position = (array, local):
        # per-array locals become sorted and (on depth-graded meshes)
        # contiguous, so _Gather runs in slice mode; ex_seg is then
        # NOT sorted (the segment sum scatters)
        order = np.argsort(plan.ex_pos, kind="stable")
        ex_pos = plan.ex_pos[order]
        ex_seg = plan.ex_seg[order]
        ex_arr, ex_loc = locate_concat(plan, ex_pos.astype(np.int64))
        out["ex_arr"], out["ex_loc"] = ex_arr, ex_loc
        out["ex_pos"] = ex_pos
        out["ex_seg"] = i32(ex_seg)
        first = np.full(G, K, np.int64)
        np.minimum.at(first, ex_seg, np.arange(K))
        out["grp_first"] = i32(first)
        gn = g[ex_pos]
        out["mass_ex"] = f(1.0 / tables.inv_mass[gn])[:, None]
        out["invm_ex"] = f(tables.inv_mass[gn])[:, None]
        out["mm_ex"] = f(tables.mass_minusaM[gn])
    if D:
        out["dn_grp"] = i32(plan.dn_grp)
        out["dn_anc_grp"] = i32(plan.dn_anc_grp)
        out["dn_wgt"] = f(plan.dn_wgt)
        isdn = np.zeros(G, bool)
        isdn[plan.dn_grp] = True
        grp2dn = np.zeros(G, np.int64)
        grp2dn[plan.dn_grp] = np.arange(D)
        m = isdn[ex_seg]
        out["dnc_k"] = i32(np.flatnonzero(m))
        out["dnc_src"] = i32(grp2dn[ex_seg[m]])
    if src_ids is not None and len(src_ids):
        pos = first_concat_copy(plan, src_ids, what="source node")
        node2grp = -np.ones(plan.mesh.nnum, np.int64)
        node2grp[plan.grp_node] = np.arange(G)
        gi = node2grp[src_ids]
        ing = gi >= 0
        if ing.any():
            out["src_grp_idx"] = i32(gi[ing])
            out["src_grp_rows"] = i32(np.flatnonzero(ing))
        dm = ~ing
        if dm.any():
            arr, loc = locate_concat(plan, pos[dm])
            rows = np.flatnonzero(dm)
            for a in range(NB + 1):
                sel = arr == a
                if sel.any():
                    pp = loc[sel]
                    iv = (tables.inv_mass[g[pos[dm][sel]]])
                    out["src_direct"].append(
                        (a, i32(pp), i32(rows[sel]), f(iv)[:, None]))
    return out


def locate_concat(plan, pos):
    """concat position -> (array index, local column): bricks are
    0..NB-1, the loose node section is NB.  THE concat-layout
    convention — sources, stations, nl and DRM subset passes all
    resolve through here."""
    NB = len(plan.bricks)
    off_loose = (plan.bricks[-1].off + plan.bricks[-1].nb
                 if NB else 0)
    pos = np.asarray(pos, np.int64)
    arr = np.full(len(pos), NB, np.int64)
    loc = pos - off_loose
    for a, b in enumerate(plan.bricks):
        m = (pos >= b.off) & (pos < b.off + b.nb)
        arr[m] = a
        loc[m] = pos[m] - b.off
    return arr, loc


def first_concat_copy(plan, node_ids, what="node"):
    """Concat position of the FIRST copy of each global node id
    (interface nodes have several copies; per-node force injections
    count once when added to exactly one)."""
    g = plan.gnid_cat
    uniq, first = np.unique(g, return_index=True)
    ids = np.asarray(node_ids).ravel()
    pos = first[np.searchsorted(uniq, np.clip(ids, uniq[0],
                                              uniq[-1]))]
    if not (g[pos] == ids).all():
        raise RuntimeError(f"{what} missing from plan")
    return pos


def attach_nonlinear_mesh(mesh, params, tables, nl_tables, plan,
                          dtype=jnp.float32):
    """Nonlinear bundle for the packed mesh path.

    The fused kernels skip nonlinear elements entirely (c1/c2/beta
    zeroed in MeshPallasTables — stiffness.c:46-105's linear-element
    map excludes them), and an XLA subset pass per step updates the
    plastic state (compute_nonlinear_state, nonlinear.c:1671) and adds
    those elements' stress-integral force (compute_addforce_nl,
    nonlinear.c:1544) PLUS their Rayleigh damping force (damping stays
    active for all elements) into the packed next-step arrays before
    interface reconciliation — by linearity u_next += F * inv_mass, so
    the injected force flows through the reconciler's force recovery
    like any kernel force.  Geostatic loading rides the same path
    (precomputed gravity rows, bottom-reaction capture/replay, bottom
    z pin); only loose-element plans fall back to the unstructured
    solver."""
    from ..nonlinear import nl_device_tables

    t = nl_tables
    geostatic = t.cfg.geostatic_loading_t > 0
    if tables.damping == "bkt":
        raise RuntimeError("nonlinear+BKT: unstructured path only")
    if geostatic and len(plan.loose_eidx):
        raise RuntimeError("geostatic loading with loose elements: "
                           "unstructured path only")
    NB = len(plan.bricks)
    # global element index -> concat element column
    valid_cols = np.flatnonzero(plan.evalid_cat)
    col_of = -np.ones(tables.E, np.int64)
    col_of[plan.eidx_cat[valid_cols]] = valid_cols
    cols = col_of[t.eidx]
    if not (cols >= 0).all():
        raise RuntimeError("nonlinear element missing from plan; "
                           "unstructured path only")
    off_loose = (plan.bricks[-1].off + plan.bricks[-1].nb
                 if NB else 0)
    if (cols >= off_loose).any():
        raise RuntimeError("nonlinear elements in the loose section; "
                           "unstructured path only")

    Enl = len(t.eidx)
    g = plan.gnid_cat
    f = lambda x: jnp.asarray(x, dtype)
    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def corner_positions(eidx, ecols):
        """Within-brick node positions of each element's 8 corners (in
        elem_lnid's corner order — verified) + owning brick index."""
        E_ = len(eidx)
        pos = np.zeros((E_, 8), np.int64)
        brick_of = np.zeros(E_, np.int64)
        for bi, b in enumerate(plan.bricks):
            m = (ecols >= b.off) & (ecols < b.off + b.nb)
            if not m.any():
                continue
            brick_of[m] = bi
            offs = np.asarray(b.corner_offsets())
            pos[m] = (ecols[m] - b.off)[:, None] + offs[None, :]
            if not (g[b.off + pos[m]]
                    == mesh.elem_lnid[eidx[m]]).all():
                raise RuntimeError(
                    f"brick {bi}: corner order does not match "
                    f"elem_lnid; unstructured path only")
        return pos, brick_of

    def subset_plans(pos, brick_of, corner0=0):
        """(gather, scatter) per-brick plans over the flat
        (element, corner) index space; the scatter covers corners
        [corner0:8] with inv_mass folded per target column."""
        nc = 8 - corner0
        flat_pos = pos[:, corner0:].ravel()
        flat_brick = np.repeat(brick_of, nc)
        dst = np.arange(len(flat_pos))
        gth, sct = [], []
        for bi, b in enumerate(plan.bricks):
            m = flat_brick == bi
            if not m.any():
                continue
            loc = flat_pos[m]
            gth.append((bi, i32(loc), i32(dst[m])))
            order = np.argsort(loc, kind="stable")
            uniq, seg = np.unique(loc[order], return_inverse=True)
            invm_u = tables.inv_mass[g[b.off + uniq]]
            sct.append((bi, i32(dst[m][order]), i32(seg),
                        int(len(uniq)), i32(uniq), f(invm_u)[:, None]))
        return gth, sct

    pos, brick_of = corner_positions(t.eidx, cols)
    gth, sct = subset_plans(pos, brick_of)
    bundle = {
        "d": nl_device_tables(t, dtype), "n": Enl,
        "dt": params.delta_t, "dt2": params.delta_t ** 2,
        "rows": t.eidx, "cols": cols,
        "c3": f(tables.c3[t.eidx]), "c4": f(tables.c4[t.eidx]),
        "mcat": f(tables.m48.T),
        "gather": gth, "scatter": sct,
        "geostatic": geostatic,
    }

    if geostatic:
        from ..nonlinear import smooth_rise_factor
        dt2 = params.delta_t ** 2
        final = t.cfg.geostatic_final_step(params.delta_t)
        ngeo = int(t.cfg.geostatic_loading_t / params.delta_t)
        bundle["final_step"] = final
        bundle["rise"] = f(smooth_rise_factor(np.arange(final + 2),
                                              ngeo))
        # gravity: a CONSTANT per-node z-force row (the per-step work
        # is one rise-scaled elementwise add per brick — the reference
        # re-scatters E*8 corner weights every step,
        # compute_addforce_gravity nonlinear.c:1365); inv_mass folded
        all_cols = col_of[np.arange(tables.E)]
        apos, abrick = corner_positions(np.arange(tables.E), all_cols)
        gw = np.repeat(t.grav_W * dt2, 8)
        bundle["grav_nb"] = []
        for bi, b in enumerate(plan.bricks):
            row = np.zeros(b.nb)
            m = abrick == bi
            np.add.at(row, apos[m].ravel(), gw[np.repeat(m, 8)])
            row *= tables.inv_mass[g[b.off:b.off + b.nb]]
            bundle["grav_nb"].append(row)
        # bottom elements: reaction capture at the geostatic final
        # step + replay (nonlinear.c:1436-1504)
        be = t.bot_eidx
        bundle["bot"] = None
        if len(be):
            bcols = col_of[be]
            bpos, bbrick = corner_positions(be, bcols)
            bgth, _ = subset_plans(bpos, bbrick)
            _, bsct = subset_plans(bpos, bbrick, corner0=4)
            bundle["bot"] = {
                "n": len(be), "gather": bgth, "scatter": bsct,
                "bc1": f(tables.c1[be]), "bc2": f(tables.c2[be]),
                "botW": f(t.grav_W[be] * dt2),
            }
        # bottom-node displacement pin during loading: multiply EVERY
        # concat copy's z row (geostatic_displacements_fix)
        botn = (np.unique(mesh.elem_lnid[be][:, 4:]) if len(be)
                else np.zeros(0, np.int64))
        pin_pos = np.flatnonzero(np.isin(g, botn))
        arr, loc = locate_concat(plan, pin_pos)
        bundle["pin"] = [(int(a), i32(loc[arr == a]))
                         for a in np.unique(arr)]
    return bundle


def attach_drm_mesh(drm, plan, tables, dtype=jnp.float32):
    """Mesh-path DRM part-2 bundle (solver_compute_effective_drm_force,
    drm.c:2316-2437): each DRM-boundary node maps to its FIRST concat
    copy, and the lerped effective force is added into rows 0:3 of the
    packed next-step arrays before reconciliation (u_next += F *
    inv_mass by linearity) — interface copies reconcile afterwards, so
    one copy's force counts exactly once, and dangling-node forces
    distribute through the plane algebra like any kernel force."""
    ids = np.asarray(drm["ids"])
    try:
        pos = first_concat_copy(plan, ids, what="DRM node")
    except RuntimeError:
        raise RuntimeError("DRM node missing from plan; "
                           "unstructured path only")
    NB = len(plan.bricks)
    arr, loc = locate_concat(plan, pos)
    f = lambda x: jnp.asarray(x, dtype)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    out = {"Fdev": f(drm["Fdev"] if "Fdev" in drm else drm["F"]),
           "aux": drm["aux"], "adds": []}
    rows = np.arange(len(ids))
    for a in range(NB + 1):
        m = arr == a
        if m.any():
            out["adds"].append(
                (a, i32(loc[m]), i32(rows[m]),
                 f(tables.inv_mass[ids[m]])[:, None]))
    return out


def mesh_carry_views(carry):
    """(us, ups, tail) views of a mesh-path carry: legacy
    (us, ups, conv) with [3, *] entries, or packed ((S, ...),) with
    S [8, LEN] = (u 0:3, up 3:6)."""
    first = carry[0]
    if len(first) and np.shape(first[0])[0] == 8:
        return (tuple(S[0:3] for S in first),
                tuple(S[3:6] for S in first), tuple(carry[1:]))
    return carry[0], carry[1], tuple(carry[2:])


def _make_mesh_step_packed(mt: MeshPallasTables, interpret=False):
    """Packed-state multi-brick step: carry = ((S_0, ..., S_NB-1,
    S_loose),) with S [8, LEN] = (u 0:3, up 3:6); for uniform-Q BKT
    the carry is ((S...), (conv...)) with per-brick NODE-basis memory
    variables (+ the loose 4-tuple).  The per-brick kernels are
    build_call_packed / build_bkt_uniform_call (half the physical HBM
    bytes + the MXU element operator), and the dense plane reconciler
    writes its reconciled planes straight into rows 0:3 of the packed
    next-step arrays (planerec._put row passthrough)."""
    dtype = mt.dtype
    bkt = mt.damping == "bkt"
    f1e, f2e = spectral_factors()
    dd = diag_dd(f1e, f2e, dtype)
    mablate = set(os.environ.get("HT_MESH_ABLATE", "").split(","))

    if bkt:
        calls = []
        for (offs, B, o7, T, LEN), (mode, mval) in zip(mt.geo,
                                                       mt.bkt_modes):
            if mode == "uniform":
                calls.append(build_bkt_uniform_call(
                    offs, B, o7, T, LEN, dtype, mval,
                    shear_only=mt.bkt_shear_only,
                    conv_dtype=mt.conv_dtype_node,
                    interpret=interpret))
            else:
                calls.append(build_bkt_node_call(
                    offs, B, o7, T, LEN, dtype, mval["sets"],
                    shear_only=mt.bkt_shear_only,
                    conv_dtype=mt.conv_dtype_node,
                    interpret=interpret))
    else:
        calls = [build_call_packed(offs, B, o7, T, LEN, f1e, f2e,
                                   dtype, interpret=interpret,
                                   tier=tier, kco=kco)
                 for (offs, B, o7, T, LEN), (tier, kco)
                 in zip(mt.geo, mt.tiers)]
    NB = mt.NB
    consts = {"K": tuple(mt.Kp), "mm_l": mt.mm_l, "invm_l": mt.invm_l}
    if bkt and mt.mix_slots:
        # mixed-element epilogue tables ride the consts argument
        # (closure capture would embed tens of MB of HLO literals at
        # production interface counts -- pathological compiles)
        consts["mix"] = {
            bi: {k: mt.bkt_modes[bi][1][k] for k in
                 ("mix_idx", "mix_ce", "mix_cn", "mix_invm",
                  "mix_muf", "mix_kaf", "mix_fm", "mix_sc")}
            for bi in mt.mix_slots}
    if mt.nl is not None and mt.nl["geostatic"]:
        # per-brick gravity/inv_mass node rows, padded to each brick's
        # LEN (large arrays ride the consts argument, not the closure)
        rows = []
        for geo_, gnb in zip(mt.geo, mt.nl["grav_nb"]):
            row = np.zeros((1, geo_[4]))
            row[0, :len(gnb)] = gnb
            rows.append(jnp.asarray(row, dtype))
        consts["nlg"] = tuple(rows)

    nl = mt.nl
    drm = mt.drm

    def step(cd, carry, x):
        srcf, step_idx = x
        nlstate = None
        if bkt:
            Ss, conv = carry
        elif nl is not None:
            Ss, nlstate = carry
        else:
            (Ss,) = carry
        us = tuple(S[0:3] for S in Ss)

        if mt.st is not None:
            gat, shape, phi = mt.st
            u_st = gat(us, dtype).reshape(shape + (3,))
            sample = jnp.einsum("sn,snc->sc", phi, u_st)
        else:
            sample = jnp.zeros((0, 3), dtype)

        # ---- nonlinear state update (solver_nonlinear_state) ---------
        if nl is not None:
            from ..nonlinear import nl_state_update
            Enl = nl["n"]
            ue_f = jnp.zeros((Enl * 8, 3), dtype)
            upe_f = jnp.zeros((Enl * 8, 3), dtype)
            for bi, loc, dsti in nl["gather"]:
                ue_f = ue_f.at[dsti].set(Ss[bi][0:3][:, loc].T)
                upe_f = upe_f.at[dsti].set(Ss[bi][3:6][:, loc].T)
            ue = ue_f.reshape(Enl, 24)
            upe = upe_f.reshape(Enl, 24)
            nlstate = (nl_state_update(nl["d"], ue, nlstate[:3],
                                       nl["dt"]) + tuple(nlstate[3:]))

        # ---- per-brick fused kernels ---------------------------------
        new_conv = []
        new_mix = {}
        if bkt:
            Sns = []
            for b in range(NB):
                mode, mval = mt.bkt_modes[b]
                if mode == "uniform":
                    Sn, cv = calls[b](Ss[b], Ss[b], cd["K"][b],
                                      conv[b], conv[b])
                else:
                    Sn, cv = calls[b](Ss[b], Ss[b], cd["K"][b],
                                      conv[b], conv[b])
                    slot = mt.mix_slots.get(b)
                    if slot is not None:
                        # pre-reconciliation, like the nl subset
                        # forces: the reconciler's force recovery then
                        # includes the correction
                        Sn, new_mix[slot] = bkt_mix_epilogue(
                            cd["mix"][b], mt.bkt_shear_only, dtype,
                            Ss[b], Sn, conv[b], conv[slot],
                            runs=mval.get("mix_runs"),
                            offs=mt.geo[b][0])
                Sns.append(Sn)
                new_conv.append(cv)
        else:
            Sns = [calls[b](Ss[b], Ss[b], cd["K"][b], dd)
                   for b in range(NB)]

        # ---- nonlinear subset forces (pre-reconciliation) -------------
        if nl is not None:
            from ..nonlinear import nl_force
            fnl = nl_force(nl["d"], nlstate[:3], nl["dt2"])  # [Enl,24]
            du = ue - upe
            a = nl["c3"][:, None] * du
            b_ = nl["c4"][:, None] * du
            f_lin = -(jnp.concatenate([a, b_], 1) @ nl["mcat"].T)
            F_flat = (fnl + f_lin).reshape(-1, 3)
            for bi, perm, seg, nseg, uniq, invm_u in nl["scatter"]:
                sums = jax.ops.segment_sum(F_flat[perm], seg,
                                           num_segments=nseg,
                                           indices_are_sorted=True)
                Sns[bi] = Sns[bi].at[0:3, uniq].add((sums * invm_u).T)
            if nl["geostatic"]:
                # gravity as one rise-scaled constant row per brick
                # (compute_addforce_gravity, nonlinear.c:1365)
                rise = nl["rise"][jnp.minimum(
                    step_idx, nl["rise"].shape[0] - 1)]
                for b in range(NB):
                    Sns[b] = Sns[b].at[2:3].add(rise * cd["nlg"][b])
                bt = nl["bot"]
                if bt is not None:
                    # bottom reactions captured exactly at the final
                    # geostatic step, replayed after (nonlinear.c:1436)
                    Eb = bt["n"]
                    ub_f = jnp.zeros((Eb * 8, 3), dtype)
                    for bi, loc, dsti in bt["gather"]:
                        ub_f = ub_f.at[dsti].set(Ss[bi][0:3][:, loc].T)
                    ub = ub_f.reshape(Eb, 24)
                    kf = (jnp.concatenate(
                        [bt["bc1"][:, None] * ub,
                         bt["bc2"][:, None] * ub], 1)
                        @ nl["mcat"].T).reshape(Eb, 8, 3)
                    new_r = kf[:, 4:, 2] - bt["botW"][:, None]
                    reactions = jnp.where(
                        step_idx == nl["final_step"], new_r,
                        nlstate[3])
                    nlstate = nlstate[:3] + (reactions,)
                    radd = jnp.where(step_idx > nl["final_step"],
                                     1.0, 0.0)
                    rflat = reactions.reshape(-1)[:, None]
                    for bi, perm, seg, nseg, uniq, invm_u in \
                            bt["scatter"]:
                        sums = jax.ops.segment_sum(
                            rflat[perm], seg, num_segments=nseg,
                            indices_are_sorted=True)
                        Sns[bi] = Sns[bi].at[2, uniq].add(
                            radd * (sums * invm_u)[:, 0])

        # ---- loose elements (XLA gather/scatter) ---------------------
        S_l = Ss[NB]
        u_l, up_l = S_l[0:3], S_l[3:6]
        F_l = jnp.zeros((3, mt.NL), dtype)
        if mt.El and "noloose" in mablate and bkt:
            new_conv.append(conv[NB])       # keep the carry structure
        if mt.El and "noloose" not in mablate:
            uT, upT = u_l.T, up_l.T
            ue = uT[mt.l_rows].reshape(mt.El, 24)
            upe = upT[mt.l_rows].reshape(mt.El, 24)
            if not bkt:
                du = ue - upe
                a = mt.l_c1[:, None] * ue + mt.l_c3[:, None] * du
                b_ = mt.l_c2[:, None] * ue + mt.l_c4[:, None] * du
                lf = -(jnp.concatenate([a, b_], 1) @ mt.mcat.T)
            else:
                lf, lconv = _loose_bkt_force(mt, ue, upe, conv[NB])
                new_conv.append(lconv)
            flat = lf.reshape(-1, 3)[mt.l_perm]
            F_l = jax.ops.segment_sum(flat, mt.l_seg,
                                      num_segments=mt.NL,
                                      indices_are_sorted=True).T
        un_l = u_l + (F_l + cd["mm_l"] * (u_l - up_l)) * cd["invm_l"]
        Sns.append(jnp.concatenate([un_l, u_l, S_l[6:8]], axis=0))

        # ---- DRM part-2 effective forces (pre-reconciliation) --------
        if drm is not None:
            k = jnp.minimum(step_idx // drm["aux"],
                            drm["Fdev"].shape[0] - 2)
            frac = ((step_idx % drm["aux"]).astype(dtype)
                    / drm["aux"])
            fd = ((1.0 - frac) * drm["Fdev"][k]
                  + frac * drm["Fdev"][k + 1])
            for a, cols, rows, invm_d in drm["adds"]:
                Sns[a] = Sns[a].at[0:3, cols].add(
                    (fd[rows] * invm_d).T)

        # ---- interface reconciliation --------------------------------
        if "norec" in mablate:
            pass
        elif mt.plane_rec is not None:
            ups = tuple(S[3:6] for S in Ss)
            Sns = mt.plane_rec.apply(us, ups, Sns, srcf, dtype)
        # (no index-epilogue branch: MeshPallasTables only enables
        # packed mode with the plane reconciler or zero interfaces)

        # ---- direct (single-copy) source injection -------------------
        for a, pp, rows, iv in mt.src_direct:
            Sns[a] = Sns[a].at[0:3, pp].add((srcf[rows] * iv).T)

        if nl is not None and nl["geostatic"]:
            # geostatic_displacements_fix: bottom z pinned during
            # loading (every concat copy)
            keep = jnp.where(step_idx <= nl["final_step"], 0.0, 1.0)
            for bi, cols_p in nl["pin"]:
                Sns[bi] = Sns[bi].at[2, cols_p].multiply(keep)

        if bkt:
            conv_out = (tuple(new_conv[:NB])
                        + ((new_conv[NB],) if mt.El else ())
                        + tuple(new_mix[s] for s in sorted(new_mix)))
            return (tuple(Sns), conv_out), sample
        if nl is not None:
            return (tuple(Sns), nlstate), sample
        return (tuple(Sns),), sample

    return step, consts


def _loose_bkt_force(mt, ue, upe, lconv):
    """BKT element force + conv update for the loose (XLA) section;
    shared by the packed and legacy mesh steps."""
    lbk = mt.l_bkt
    ue3 = ue.reshape(mt.El, 8, 3)
    upe3 = upe.reshape(mt.El, 8, 3)
    ls0, ls1, lk0, lk1 = lconv

    def lupd(f0, f1, p):
        f0n = (lbk[f"{p}_c2"][:, None, None] * ue3
               + lbk[f"{p}_c1"][:, None, None] * upe3
               + lbk[f"{p}_e0"][:, None, None] * f0)
        f1n = (lbk[f"{p}_c4"][:, None, None] * ue3
               + lbk[f"{p}_c3"][:, None, None] * upe3
               + lbk[f"{p}_e1"][:, None, None] * f1)
        return f0n, f1n

    ls0, ls1 = lupd(ls0, ls1, "shear")
    lk0, lk1 = lupd(lk0, lk1, "kappa")
    du3 = ue3 - upe3
    dvs = (lbk["shear_coef"][:, None, None] * du3
           - (lbk["a0_shear"][:, None, None] * ls0
              + lbk["a1_shear"][:, None, None] * ls1) + ue3)
    dvk = (lbk["kappa_coef"][:, None, None] * du3
           - (lbk["a0_kappa"][:, None, None] * lk0
              + lbk["a1_kappa"][:, None, None] * lk1) + ue3)
    lf = (lbk["mu_f"][:, None]
          * (dvs.reshape(mt.El, 24) @ mt.kmu_cat.T)
          + lbk["kappa_f"][:, None]
          * (dvk.reshape(mt.El, 24) @ mt.kkappa_cat.T))
    return lf, (ls0, ls1, lk0, lk1)


def make_mesh_step(mt: MeshPallasTables, interpret=False):
    """scan-able multi-brick step.  carry = (us, ups, conv) with us/ups
    tuples of [3, LEN_b] per brick + [3, NL] loose; conv = per-brick
    nodal-corner-basis [96, LEN_b] + loose ([El,8,3] x4) for BKT,
    else ().  In packed mode (mt.packed) the carry is instead
    ((S, ...),) — see _make_mesh_step_packed / mesh_carry_views.

    Returns (step, consts): step(consts, carry, x) takes the node-scale
    device tables as an explicit argument (see make_pallas_step)."""
    if mt.packed:
        return _make_mesh_step_packed(mt, interpret=interpret)
    dtype = mt.dtype
    bkt = mt.damping == "bkt"
    f1e, f2e = spectral_factors()
    dd = diag_dd(f1e, f2e, dtype)
    # perf ablations (measurement only — WRONG PHYSICS at interfaces):
    # "norec" skips interface reconciliation, "noloose" skips the
    # unstructured loose-element pass; see pallas_brick HT_PALLAS_ABLATE
    mablate = set(os.environ.get("HT_MESH_ABLATE", "").split(","))

    calls = []
    for (offs, B, o7, T, LEN), (tier, kco) in zip(mt.geo, mt.tiers):
        if bkt:
            calls.append(build_bkt_call(offs, B, o7, T, LEN, dtype,
                                        shear_only=mt.bkt_shear_only,
                                        conv_dtype=mt.conv_dtype,
                                        interpret=interpret))
        else:
            calls.append(build_call(offs, B, o7, T, LEN, f1e, f2e,
                                    dtype, interpret=interpret,
                                    tier=tier, kco=kco))

    NB = mt.NB
    consts = {"mm": tuple(mt.mm), "invm": tuple(mt.invm),
              "mm_l": mt.mm_l, "invm_l": mt.invm_l}
    if bkt:
        consts["bk"] = tuple(mt.bk)
    else:
        consts["cm"] = tuple(mt.cm)

    def step(cd, carry, x):
        srcf, step_idx = x
        us, ups, conv = carry

        if mt.st is not None:
            gat, shape, phi = mt.st
            u_st = gat(us, dtype).reshape(shape + (3,))
            sample = jnp.einsum("sn,snc->sc", phi, u_st)
        else:
            sample = jnp.zeros((0, 3), dtype)

        # ---- per-brick fused kernels ---------------------------------
        uns = []
        new_conv = []
        for b in range(NB):
            u, up = us[b], ups[b]
            if bkt:
                un, cv = calls[b](u, u, up, up, cd["bk"][b],
                                  cd["mm"][b], cd["invm"][b], conv[b])
                new_conv.append(cv)
            else:
                un = calls[b](u, u, up, up, cd["cm"][b], cd["mm"][b],
                              cd["invm"][b], dd)
            uns.append(un)

        # ---- loose elements (XLA gather/scatter) ---------------------
        u_l, up_l = us[NB], ups[NB]
        F_l = jnp.zeros((3, mt.NL), dtype)
        if mt.El and "noloose" in mablate and bkt:
            new_conv.append(conv[NB])       # keep the carry structure
        if mt.El and "noloose" not in mablate:
            uT, upT = u_l.T, up_l.T
            ue = uT[mt.l_rows].reshape(mt.El, 24)
            upe = upT[mt.l_rows].reshape(mt.El, 24)
            if not bkt:
                du = ue - upe
                a = mt.l_c1[:, None] * ue + mt.l_c3[:, None] * du
                b_ = mt.l_c2[:, None] * ue + mt.l_c4[:, None] * du
                lf = -(jnp.concatenate([a, b_], 1) @ mt.mcat.T)
            else:
                lf, lconv = _loose_bkt_force(mt, ue, upe, conv[NB])
                new_conv.append(lconv)
            flat = lf.reshape(-1, 3)[mt.l_perm]
            F_l = jax.ops.segment_sum(flat, mt.l_seg,
                                      num_segments=mt.NL,
                                      indices_are_sorted=True).T
        un_l = u_l + (F_l + cd["mm_l"] * (u_l - up_l)) * cd["invm_l"]
        uns.append(un_l)

        # ---- interface reconciliation --------------------------------
        if "norec" in mablate:
            pass
        elif mt.plane_rec is not None:
            # dense z-plane algebra (planerec.py): no gathers/scatters
            uns = mt.plane_rec.apply(us, ups, uns, srcf, dtype)
        elif mt.K:
            u_ex = mt.ex_gather(us, dtype)
            up_ex = mt.ex_gather(ups, dtype)
            un_ex = mt.ex_gather(uns, dtype)
            du_ex = u_ex - up_ex
            # recover each copy's local force by linearity
            F_ex = (un_ex - u_ex) * mt.mass_ex - mt.mm_ex * du_ex
            tot = jax.ops.segment_sum(F_ex, mt.ex_seg,
                                      num_segments=mt.G,
                                      indices_are_sorted=False)
            if mt.src_grp_idx is not None:
                tot = tot.at[mt.src_grp_idx].add(srcf[mt.src_grp_rows])
            if mt.D:
                contrib = (tot[mt.dn_grp][:, None, :]
                           * mt.dn_wgt[:, :, None])
                tot = tot.at[mt.dn_anc_grp].add(contrib)
            un_ex = u_ex + (tot[mt.ex_seg] + mt.mm_ex * du_ex) \
                * mt.invm_ex
            if mt.D:
                u_rep = un_ex[mt.grp_first]
                dnv = (u_rep[mt.dn_anc_grp]
                       * mt.dn_wgt[:, :, None]).sum(axis=1)
                un_ex = un_ex.at[mt.dnc_k].set(dnv[mt.dnc_src])
            uns = mt.ex_gather.scatter_set(uns, un_ex)

        # ---- direct (single-copy) source injection -------------------
        for a, pp, rows, iv in mt.src_direct:
            uns[a] = uns[a].at[:, pp].add((srcf[rows] * iv).T)

        conv_out = ((tuple(new_conv[:NB])
                     + ((new_conv[NB],) if mt.El else ()))
                    if bkt else ())
        return (tuple(uns), tuple(us), conv_out), sample

    return step, consts


def init_mesh_state(mt: MeshPallasTables):
    if mt.packed:
        Ss = (tuple(jnp.zeros((8, geo[4]), mt.dtype)
                    for geo in mt.geo)
              + (jnp.zeros((8, mt.NL), mt.dtype),))
        if mt.nl is not None:
            Enl = mt.nl["n"]
            z6 = jnp.zeros((Enl, 8, 6), mt.dtype)
            nlstate = (z6, z6, jnp.zeros((Enl, 8), mt.dtype))
            if mt.nl["geostatic"]:
                bt = mt.nl["bot"]
                Eb = bt["n"] if bt is not None else 0
                nlstate = nlstate + (jnp.zeros((Eb, 4), mt.dtype),)
            return (Ss, nlstate)
        if mt.damping != "bkt":
            return (Ss,)
        from .pallas_brick import nodeq_conv_init
        R2 = 6 if mt.bkt_shear_only else 12
        conv = tuple(
            nodeq_conv_init(mt.conv_rows_node, geo[4],
                            mode[1]["node_bin"], R2,
                            mt.conv_dtype_node)
            if mode[0] == "nodeq" else
            jnp.zeros((mt.conv_rows_node, geo[4]), mt.conv_dtype_node)
            for geo, mode in zip(mt.geo, mt.bkt_modes))
        if mt.El:
            conv = conv + (tuple(jnp.zeros((mt.El, 8, 3), mt.dtype)
                                 for _ in range(4)),)
        for bi in sorted(mt.mix_slots, key=mt.mix_slots.get):
            # same storage dtype as the node conv: matching corners
            # round identically on both recursion paths, so their
            # epilogue correction cancels bit-exactly even at bf16
            conv = conv + (jnp.zeros(
                (R2, 8, mt.bkt_modes[bi][1]["M"]),
                mt.conv_dtype_node),)
        return (Ss, conv)
    us = tuple(jnp.zeros((3, geo[4]), mt.dtype) for geo in mt.geo) \
        + (jnp.zeros((3, mt.NL), mt.dtype),)
    conv = ()
    if mt.damping == "bkt":
        conv = tuple(jnp.zeros((mt.conv_rows, geo[4]), mt.conv_dtype)
                     for geo in mt.geo)
        if mt.El:
            conv = conv + (tuple(jnp.zeros((mt.El, 8, 3), mt.dtype)
                                 for _ in range(4)),)
    return (us, us, conv)


def mesh_u_global(plan: BrickPlan, us, N):
    """Global [N, 3] displacement from the per-array state tuple
    (accepts packed [8, LEN] entries: rows 0:3 are u)."""
    dt = np.asarray(us[-1]).dtype
    u = np.zeros((N, 3), dt)
    for b, arr in zip(plan.bricks, us):
        u[plan.gnid_cat[b.off:b.off + b.nb]] = \
            np.asarray(arr)[:3, :b.nb].T
    off_loose = (plan.bricks[-1].off + plan.bricks[-1].nb
                 if plan.bricks else 0)
    u[plan.gnid_cat[off_loose:]] = np.asarray(us[-1])[:3].T
    return u


def restore_mesh_state(mt: MeshPallasTables, plan, u_now, u_prev,
                       conv_flat):
    """Rebuild the per-array carry from a checkpoint's canonical global
    [N, 3] fields (+ carry-shaped conv arrays for BKT)."""
    dtype = mt.dtype

    def split(ug):
        ug = np.asarray(ug)
        assert ug.ndim == 2 and ug.shape[1] == 3, \
            "checkpoint layout does not match the multi-brick solver"
        out = []
        for b, (geo) in zip(plan.bricks, mt.geo):
            arr = np.zeros((3, geo[4]), np.float64)
            arr[:, :b.nb] = ug[plan.gnid_cat[b.off:b.off + b.nb]].T
            out.append(jnp.asarray(arr, dtype))
        out.append(jnp.asarray(
            ug[plan.gnid_cat[mt.off_loose:]].T, dtype))
        return tuple(out)

    if mt.packed:
        us, ups = split(u_now), split(u_prev)
        Ss = tuple(jnp.concatenate(
            [u, up, jnp.zeros((2, u.shape[1]), dtype)], axis=0)
            for u, up in zip(us, ups))
        if mt.nl is not None:
            Enl = mt.nl["n"]
            flat = list(conv_flat)
            want = [(Enl, 8, 6), (Enl, 8, 6), (Enl, 8)]
            if mt.nl["geostatic"]:
                bt = mt.nl["bot"]
                want.append((bt["n"] if bt is not None else 0, 4))
            got = [tuple(np.shape(a)) for a in flat]
            if got != want:
                raise RuntimeError(
                    f"checkpoint nonlinear state {got} does not "
                    f"match this mesh's layout {want}")
            return (Ss, tuple(jnp.asarray(a, dtype) for a in flat))
        if mt.damping != "bkt":
            return (Ss,)
        return (Ss, _fit_mesh_conv(mt, conv_flat, node_basis=True))

    conv = ()
    if mt.damping == "bkt":
        conv = _fit_mesh_conv(mt, conv_flat, node_basis=False)
    return (split(u_now), split(u_prev), conv)


def _fit_mesh_conv(mt: MeshPallasTables, conv_flat, node_basis):
    """Fit checkpointed BKT memory variables to the solver's basis.
    Per-brick arrays may arrive in either the corner basis
    ([conv_rows, LEN], legacy kernels) or the node basis
    ([conv_rows_node, LEN], packed kernels — uniform-Q or general
    nodeq, the latter with trailing [R2, 8, M] mixed-element carries);
    the bases are exactly interconvertible (conv_corner_to_node /
    conv_corner_to_nodeq / conv_node(q)_to_corner)."""
    dtype = mt.dtype
    n_loose = 4 if mt.El else 0
    arrays = list(conv_flat)
    # bricks whose nodeq assignment has mixed elements (a nodeq-tier
    # checkpoint carries one mix array per such brick, in brick order)
    mix_bricks = [bi for bi, (mode, mval)
                  in enumerate(mt.bkt_modes or [])
                  if mode != "uniform" and mval.get("M", 0) > 0]
    base = mt.NB + n_loose
    if len(arrays) == base:
        mixes_in = {}
    elif len(arrays) == base + len(mix_bricks):
        mixes_in = {bi: arrays[base + k]
                    for k, bi in enumerate(mix_bricks)}
    else:
        raise RuntimeError(
            f"checkpoint BKT state has {len(arrays)} arrays; the "
            f"multi-brick pallas layout wants {mt.NB} brick + "
            f"{n_loose} loose (+ {len(mix_bricks)} mixed-element "
            f"carries); restart with the solver path that wrote it")
    out = []
    R2 = 6 if mt.bkt_shear_only else 12
    mix_out = {}
    for i, geo in enumerate(mt.geo):
        offs, B, o7, T, LEN = geo
        a = np.asarray(arrays[i], np.float64)
        corner = (mt.conv_rows, LEN)
        node = (getattr(mt, "conv_rows_node", -1), LEN)
        mode, mval = (mt.bkt_modes[i] if mt.bkt_modes is not None
                      else (None, None))
        nodeq = mode != "uniform" and isinstance(mval, dict)
        if node_basis:
            if a.shape == node:
                if i in getattr(mt, "mix_slots", {}):
                    mx = mixes_in.get(i)
                    if mx is not None:
                        mx = np.asarray(mx, np.float64)
                        if mx.shape != (R2, 8, mval["M"]):
                            raise RuntimeError(
                                f"brick {i}: mixed-element carry "
                                f"{mx.shape} does not match "
                                f"{(R2, 8, mval['M'])}")
                    else:
                        # backfill from the node fields at the mixed
                        # corners (exact where the sets agreed)
                        mx = np.stack(
                            [a[:R2][:, mval["mixed_cols"] + o]
                             for o in offs], axis=1)
                    mix_out[i] = mx
            elif a.shape == corner:
                if nodeq:
                    nb_ = conv_corner_to_nodeq(offs, mval["node_src"],
                                               a)
                    if i in getattr(mt, "mix_slots", {}):
                        mix_out[i] = conv_mix_of_corner(
                            offs, mval["mixed_cols"], a)
                else:
                    nb_ = conv_corner_to_node(offs, mt.evalid_b[i], a)
                a2 = np.zeros((mt.conv_rows_node, LEN))
                a2[:R2] = nb_[:R2]
                a = a2
            else:
                raise RuntimeError(
                    f"brick {i}: checkpoint BKT state {a.shape} "
                    f"matches neither {corner} nor {node}")
            if nodeq:
                # (re)stamp the constant set-index row the general-Q
                # kernel reads from the conv stream
                nbn = mval["node_bin"]
                a = np.array(a, np.float64)
                a[R2, :len(nbn)] = nbn
            out.append(jnp.asarray(a, mt.conv_dtype_node))
        else:
            if a.shape == corner:
                pass
            elif a.shape == node and nodeq:
                mx = mixes_in.get(i)
                a = conv_nodeq_to_corner(offs, mt.evalid_b[i],
                                         mval["mixed_cols"], a, mx,
                                         mt.conv_rows)
            elif a.shape == node and mt.bkt_modes is not None:
                a = conv_node_to_corner(offs, mt.evalid_b[i], a,
                                        mt.conv_rows)
            else:
                raise RuntimeError(
                    f"brick {i}: checkpoint BKT state {a.shape} does "
                    f"not match the corner basis {corner}")
            out.append(jnp.asarray(a, mt.conv_dtype))
    conv = tuple(out)
    if mt.El:
        conv = conv + (tuple(jnp.asarray(a, dtype)
                             for a in arrays[mt.NB:mt.NB + 4]),)
    if node_basis:
        for bi in sorted(mix_out, key=mt.mix_slots.get):
            # carry dtype matches init (conv_dtype_node)
            conv = conv + (jnp.asarray(mix_out[bi],
                                       mt.conv_dtype_node),)
    return conv


def run_mesh_solver(plan, tables, src_ids, src_forces, total_steps, dt,
                    st_nodes=None, st_phi=None, dtype=jnp.float32,
                    chunk=None, state=None, on_chunk=None,
                    interpret=False, start_step=0, on_snap=None,
                    snap_every=None, nl=None, drm=None,
                    on_samples=None):
    """Chunked time loop; same contract as run_brick_solver.
    nl: attach_nonlinear_mesh bundle (elastic packed mode only);
    drm: attach_drm_mesh bundle (packed mode only)."""
    from .chunking import run_chunked

    mt = MeshPallasTables(plan, tables, src_ids=src_ids,
                          st_nodes=st_nodes, st_phi=st_phi,
                          dtype=dtype, nl=nl, drm=drm)
    step, consts = make_mesh_step(mt, interpret=interpret)
    if state is None:
        state = init_mesh_state(mt)
    elif not isinstance(state[0], tuple):
        state = restore_mesh_state(mt, plan, state[0], state[1],
                                   state[2] if len(state) > 2 else ())
    if chunk is None:
        chunk = min(total_steps, 1000)
    dt2 = dt * dt

    def make_xs(s, k):
        return (jnp.asarray(src_forces[s:s + k] * dt2, dtype),
                jnp.arange(s, s + k, dtype=jnp.int32))

    state, samples = run_chunked(step, state, make_xs, total_steps,
                                 start_step=start_step, chunk=chunk,
                                 on_chunk=on_chunk, on_snap=on_snap,
                                 snap_every=snap_every, consts=consts,
                                 snap_of=lambda c:
                                 mesh_carry_views(c)[:2],
                                 on_samples=on_samples)
    return state, samples
