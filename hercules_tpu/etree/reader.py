"""Reader for the reference on-disk etree (linear octree B-tree) format.

Layout (verified against /root/reference/etree/etree.c:53 readheader,
/root/reference/etree/btree.c:121,204,764-890 and the bytes of
examples/simple/simple_case.e):

  offset 0: etree meta header (273 bytes)
      'L'/'B' endian (1) | version u32 | dimensions u32 | rootlevel u32 |
      appmetasize u32 | [leafcount u32, indexcount u32] x 32 levels
  offset 273: btree meta header (33 bytes)
      'L'/'B' (1) | pagesize u32 | pagecount u64 | rootpagenum u64 |
      keysize u32 | valuesize u32 | asciischemasize u32
  offset 306: ASCII schema (asciischemasize bytes), e.g.
      "L 3 Vp float 4 0 Vs float 4 4 density float 4 8 "
  page p (p = rootpagenum..): at p*pagesize, 25-byte header
      rightsibnum i64 | parent-ptr junk u64 | count i32 | pentry i32 |
      type char ('l' leaf / 'i' index)   (btree.c setheader)
      entries follow: leaf = key(keysize)+value(valuesize),
      index = key(keysize)+childpagenum(i64)
  appmeta: appmetasize bytes at pagesize*(rootpagenum+pagecount)

Keys are 13 bytes for 3-D etrees: level|0x80 byte then 96-bit Morton code
(see morton.py).  Point search = floor lookup in key order + ancestor test
(etree.c:563-615).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from . import morton

_ETREE_HDR = 1 + 4 * 4 + 2 * 4 * 32  # 273 (BIGINT = uint32, etree.h:68)
_BTREE_HDR = 1 + 4 + 8 + 8 + 4 + 4 + 4  # 33
_PAGE_HDR = 25


@dataclass
class Schema:
    """Typed field list parsed from the ASCII schema string."""

    names: list = field(default_factory=list)
    types: list = field(default_factory=list)
    sizes: list = field(default_factory=list)
    offsets: list = field(default_factory=list)

    @classmethod
    def from_ascii(cls, text: str) -> "Schema":
        toks = text.split()
        # "<endian> <nfields> (<name> <type> <size> <offset>)*"
        n = int(toks[1])
        s = cls()
        for i in range(n):
            name, typ, size, off = toks[2 + 4 * i : 6 + 4 * i]
            s.names.append(name)
            s.types.append(typ)
            s.sizes.append(int(size))
            s.offsets.append(int(off))
        return s

    def dtype(self) -> np.dtype:
        m = {"float": "<f4", "double": "<f8", "int32_t": "<i4",
             "int64_t": "<i8", "uint32_t": "<u4", "uint64_t": "<u8",
             "char": "S1"}
        return np.dtype({
            "names": self.names,
            "formats": [m[t] if t in m else f"V{s}"
                        for t, s in zip(self.types, self.sizes)],
            "offsets": self.offsets,
        })


class EtreeReader:
    """Loads every leaf record of an etree database into sorted arrays and
    answers vectorized point/ancestor queries.

    The solver only ever queries the CVM read-only at mesh time
    (SURVEY.md section 2.1), so an in-memory load + binary search replaces
    the reference's LRU page cache entirely.
    """

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            raw = f.read()
        self._parse_headers(raw)
        self._load_leaves(raw)

    def _parse_headers(self, raw: bytes):
        if raw[0:1] not in (b"L", b"B"):
            raise ValueError("bad etree endian byte")
        self.endian = "<" if raw[0:1] == b"L" else ">"
        (self.version, self.dimensions, self.rootlevel,
         self.appmetasize) = struct.unpack_from(self.endian + "4I", raw, 1)
        if self.version != 1:
            raise ValueError(f"unsupported etree version {self.version}")
        off = _ETREE_HDR
        if raw[off:off + 1] not in (b"L", b"B"):
            raise ValueError("bad btree endian byte")
        (self.pagesize,) = struct.unpack_from(self.endian + "I", raw, off + 1)
        (self.pagecount, self.rootpagenum) = struct.unpack_from(
            self.endian + "2q", raw, off + 5)
        (self.keysize, self.valuesize, self.asciischemasize) = (
            struct.unpack_from(self.endian + "3I", raw, off + 21))
        self.asciischema = None
        self.schema = None
        if self.asciischemasize:
            text = raw[off + 33 : off + 33 + self.asciischemasize]
            self.asciischema = text.rstrip(b"\x00").decode()
            self.schema = Schema.from_ascii(self.asciischema)
        end = self.pagesize * (self.rootpagenum + self.pagecount)
        self.appmeta = None
        if self.appmetasize:
            self.appmeta = (
                raw[end : end + self.appmetasize].rstrip(b"\x00").decode())

    def _load_leaves(self, raw: bytes):
        """Walk all pages; collect leaf entries, then Z-order sort."""
        ps, ks, vs = self.pagesize, self.keysize, self.valuesize
        entsize = ks + vs
        cap = (ps - _PAGE_HDR) // entsize
        keys = []
        vals = []
        for p in range(self.rootpagenum, self.rootpagenum + self.pagecount + 1):
            off = p * ps
            if off + _PAGE_HDR > len(raw):
                break
            count, = struct.unpack_from(self.endian + "i", raw, off + 16)
            ptype = raw[off + 24 : off + 25]
            if ptype != b"l" or count <= 0 or count > cap:
                continue
            page = np.frombuffer(
                raw, dtype=np.uint8, count=count * entsize,
                offset=off + _PAGE_HDR).reshape(count, entsize)
            keys.append(page[:, :ks].copy())
            vals.append(page[:, ks:].copy())
        if not keys:
            self.n = 0
            self.hi = np.zeros(0, np.uint64)
            self.lo = np.zeros(0, np.uint64)
            self.level = np.zeros(0, np.uint8)
            self.payload = np.zeros(0, np.uint8)
            return
        kb = np.concatenate(keys, axis=0)
        vb = np.concatenate(vals, axis=0)
        hi, lo, lbyte = morton.bytes_to_key(kb)
        order = morton.zorder_argsort(hi, lo, lbyte & 0x7F)
        self.hi = hi[order]
        self.lo = lo[order]
        self.level = (lbyte[order] & 0x7F).astype(np.uint8)
        raw_payload = vb[order]
        if self.schema is not None:
            self.payload = raw_payload.reshape(-1).view(
                self.schema.dtype()).reshape(len(order))
        else:
            self.payload = raw_payload
        self.n = len(order)

    # ------------------------------------------------------------------
    def total_count(self) -> int:
        return self.n

    def octants(self):
        """All leaf octants as (x, y, z, level, payload) arrays."""
        x, y, z = morton.deinterleave3(self.hi, self.lo)
        return x, y, z, self.level, self.payload

    def search_points(self, x, y, z):
        """Vectorized etree_search at ETREE_MAXLEVEL: for each tick coord,
        return (found mask, index into payload arrays).

        Classic linear-octree lookup (etree.c:563-615): Morton key of the
        query point, floor search, hit iff the floor record is an ancestor.
        """
        if len(np.atleast_1d(x)) >= 1 << 12:
            from .. import native
            idx = native.etree_search(self.hi, self.lo, self.level,
                                      x, y, z)
            if idx is not None:
                ok = idx >= 0
                return ok, np.maximum(idx, 0)
        qhi, qlo = morton.interleave3(x, y, z)
        # floor search on (hi, lo); a max-level query key always compares
        # >= any leaf key with the same Morton prefix, so a plain Morton
        # floor is exact here.
        idx = floor_indices(self.hi, self.lo, qhi, qlo)
        ok = idx >= 0
        safe = np.maximum(idx, 0)
        anc = morton.is_ancestor(
            self.hi[safe], self.lo[safe], self.level[safe],
            qhi, qlo, np.full(qhi.shape, 31, np.int64))
        return ok & anc, safe


def floor_indices(store_hi, store_lo, q_hi, q_lo):
    """For each 128-bit query key, index of the last stored key <= it
    (-1 if none).  Stored keys must be sorted.  Uses the native binary
    search when available, else a vectorized merge sort."""
    q_hi = np.atleast_1d(q_hi)
    q_lo = np.atleast_1d(q_lo)
    if len(q_hi) >= 1 << 12:
        from .. import native
        r = native.floor_search(store_hi, store_lo, q_hi, q_lo)
        if r is not None:
            return r
    ns, nq = len(store_hi), len(q_hi)
    all_hi = np.concatenate([store_hi, q_hi])
    all_lo = np.concatenate([store_lo, q_lo])
    is_q = np.concatenate(
        [np.zeros(ns, dtype=bool), np.ones(nq, dtype=bool)])
    # order queries after equal stored keys so floor includes exact hits
    order = np.lexsort((is_q, all_lo, all_hi))
    stored_before = np.cumsum(~is_q[order])
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    return stored_before[pos[ns:]] - 1
