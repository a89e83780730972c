"""Spatial domain decomposition for multi-chip runs.

The reference partitions octree leaves into contiguous Z-order blocks
per MPI rank and exchanges shared-node partial sums with index-mapped
messages every step (octor_partitiontree octor.c:4904-5258;
schedule_senddata psolve.c:4946-5079).  The TPU design keeps the same
contiguous Z-order blocks but collapses the reference's FOUR per-step
exchanges (dangling/anchored x force/displacement) into ONE psum over a
shared-node boundary buffer:

- each device applies the (linear) dangling distribution to its own
  partial forces, so one psum yields exact anchor totals;
- after the psum every replica of a shared node computes bit-identical
  displacement updates, so no displacement share-back is needed.

Elements and nodes are padded to uniform per-device sizes with a trash
node slot so the step is a single static-shape SPMD program.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ShardedTables:
    n_dev: int
    E_pad: int
    N_pad: int          # includes the trash slot at index N_pad-1
    B_pad: int
    dt: float
    damping: str
    m48: np.ndarray     # [48, 24] shared constants
    kmu: np.ndarray = None
    kkappa: np.ndarray = None

    # stacked per-device arrays, leading axis n_dev
    lnid: np.ndarray = None          # [d, E_pad, 8] local node ids
    c: dict = field(default_factory=dict)   # c1..c4 [d, E_pad]
    bkt: dict = field(default_factory=dict)
    inv_mass: np.ndarray = None      # [d, N_pad]
    mass_minusaM: np.ndarray = None  # [d, N_pad, 3]
    scat_perm: np.ndarray = None     # [d, E_pad*8]
    scat_seg: np.ndarray = None
    dn_ids: np.ndarray = None        # [d, D_pad]
    dn_anchors: np.ndarray = None    # [d, D_pad, 4]
    dn_weights: np.ndarray = None    # [d, D_pad, 4]
    dn_scat_perm: np.ndarray = None
    dn_scat_seg: np.ndarray = None
    # boundary exchange plan
    b_lidx: np.ndarray = None        # [d, B_pad] local idx of shared node
    b_mask: np.ndarray = None        # [d, B_pad] bool
    # source scatter (owner-device only)
    src_lidx: np.ndarray = None      # [d, L] local idx or trash
    src_mask: np.ndarray = None      # [d, L]
    # host-side bookkeeping for gathering results
    owned_global: list = None        # per device: global node ids owned
    owned_local: list = None         # per device: local indices of owned
    local_globals: list = None       # per device: global ids of local nodes


def _block_bounds(n, parts):
    lo = (np.arange(parts) * n) // parts
    hi = (np.arange(1, parts + 1) * n) // parts
    return lo, hi


def shard_tables(tables, mesh, n_dev, src_ids=None) -> ShardedTables:
    """Split global SolverTables into n_dev contiguous Z-order element
    blocks with halo node replication."""
    E, N = tables.E, tables.N
    lo, hi = _block_bounds(E, n_dev)

    # global dangling lookup
    D = len(tables.dn_ids)
    dn_of = {int(n_): i for i, n_ in enumerate(tables.dn_ids)}

    dev_nodes = []       # sorted global node ids per device
    dev_elems = []
    for d in range(n_dev):
        el = np.arange(lo[d], hi[d])
        dev_elems.append(el)
        nodes = np.unique(tables.lnid[el])
        # add anchors of local dangling nodes
        if D:
            mask = np.isin(tables.dn_ids, nodes)
            extra = np.unique(tables.dn_anchors[mask])
            nodes = np.unique(np.concatenate([nodes, extra]))
        dev_nodes.append(nodes)

    # shared nodes = in >1 device
    counts = np.zeros(N, np.int32)
    for nodes in dev_nodes:
        counts[nodes] += 1
    shared = np.flatnonzero(counts > 1)
    B = len(shared)
    shared_pos = -np.ones(N, np.int64)
    shared_pos[shared] = np.arange(B)

    # owner of each node = lowest device holding it
    owner = np.full(N, -1, np.int32)
    for d in range(n_dev - 1, -1, -1):
        owner[dev_nodes[d]] = d

    E_pad = int(max(len(e) for e in dev_elems))
    N_pad = int(max(len(n_) for n_ in dev_nodes)) + 1  # + trash slot
    D_pad = 0
    dev_dn = []
    for d in range(n_dev):
        if D:
            m = np.isin(tables.dn_ids, dev_nodes[d])
            dev_dn.append(np.flatnonzero(m))
            D_pad = max(D_pad, int(m.sum()))
        else:
            dev_dn.append(np.zeros(0, np.int64))
    D_pad = max(D_pad, 1)
    B_pad = max(B, 1)
    L = len(src_ids) if src_ids is not None else 0

    st = ShardedTables(
        n_dev=n_dev, E_pad=E_pad, N_pad=N_pad, B_pad=B_pad,
        dt=tables.dt, damping=tables.damping, m48=tables.m48,
        kmu=tables.kmu, kkappa=tables.kkappa)

    lnid_s, perm_s, seg_s = [], [], []
    cs = {k: [] for k in ("c1", "c2", "c3", "c4")}
    bkt_s = {k: [] for k in tables.bkt} if tables.bkt else {}
    invm_s, m1_s = [], []
    dnid_s, danc_s, dwgt_s, dperm_s, dseg_s = [], [], [], [], []
    blidx_s, bmask_s = [], []
    srcl_s, srcm_s = [], []
    owned_g, owned_l, loc_g = [], [], []

    trash_local = N_pad - 1
    for d in range(n_dev):
        nodes = dev_nodes[d]
        nl = len(nodes)
        g2l = -np.ones(N, np.int64)
        g2l[nodes] = np.arange(nl)
        el = dev_elems[d]
        ne = len(el)

        ln = np.full((E_pad, 8), trash_local, np.int32)
        ln[:ne] = g2l[tables.lnid[el]]
        lnid_s.append(ln)
        for k in cs:
            v = np.zeros(E_pad)
            v[:ne] = getattr(tables, k)[el]
            cs[k].append(v)
        for k in bkt_s:
            v = np.zeros(E_pad)
            v[:ne] = tables.bkt[k][el]
            bkt_s[k].append(v)

        seg = ln.ravel()
        perm = np.argsort(seg, kind="stable").astype(np.int32)
        perm_s.append(perm)
        seg_s.append(seg[perm].astype(np.int32))

        im = np.ones(N_pad)
        im[:nl] = tables.inv_mass[nodes]
        invm_s.append(im)
        mm = np.zeros((N_pad, 3))
        mm[:nl] = tables.mass_minusaM[nodes]
        m1_s.append(mm)

        dn_rows = dev_dn[d]
        nd = len(dn_rows)
        di = np.full(D_pad, trash_local, np.int32)
        da = np.full((D_pad, 4), trash_local, np.int32)
        dw = np.zeros((D_pad, 4))
        if nd:
            di[:nd] = g2l[tables.dn_ids[dn_rows]]
            da[:nd] = g2l[tables.dn_anchors[dn_rows]]
            dw[:nd] = tables.dn_weights[dn_rows]
            if (da[:nd] < 0).any():
                raise RuntimeError(
                    "dangling anchor missing from device node set")
        dnid_s.append(di)
        danc_s.append(da)
        dwgt_s.append(dw)
        dseg = da.ravel()
        dperm = np.argsort(dseg, kind="stable").astype(np.int32)
        dperm_s.append(dperm)
        dseg_s.append(dseg[dperm].astype(np.int32))

        # boundary plan
        bl = np.full(B_pad, trash_local, np.int32)
        bm = np.zeros(B_pad, bool)
        here = nodes[counts[nodes] > 1]
        bl[shared_pos[here]] = g2l[here]
        bm[shared_pos[here]] = True
        blidx_s.append(bl)
        bmask_s.append(bm)

        # source plan (owner only)
        if L:
            sl = np.full(L, trash_local, np.int32)
            sm = np.zeros(L, bool)
            mine = owner[src_ids] == d
            sl[mine] = g2l[src_ids[mine]]
            sm[mine] = True
            srcl_s.append(sl)
            srcm_s.append(sm)

        og = nodes[owner[nodes] == d]
        owned_g.append(og)
        owned_l.append(g2l[og])
        loc_g.append(nodes)

    st.lnid = np.stack(lnid_s)
    st.c = {k: np.stack(v) for k, v in cs.items()}
    st.bkt = {k: np.stack(v) for k, v in bkt_s.items()}
    st.inv_mass = np.stack(invm_s)
    st.mass_minusaM = np.stack(m1_s)
    st.scat_perm = np.stack(perm_s)
    st.scat_seg = np.stack(seg_s)
    st.dn_ids = np.stack(dnid_s)
    st.dn_anchors = np.stack(danc_s)
    st.dn_weights = np.stack(dwgt_s)
    st.dn_scat_perm = np.stack(dperm_s)
    st.dn_scat_seg = np.stack(dseg_s)
    st.b_lidx = np.stack(blidx_s)
    st.b_mask = np.stack(bmask_s)
    if L:
        st.src_lidx = np.stack(srcl_s)
        st.src_mask = np.stack(srcm_s)
    st.owned_global = owned_g
    st.owned_local = owned_l
    st.local_globals = loc_g
    return st
