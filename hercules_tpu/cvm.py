"""CVM (community velocity model) material database.

Mirrors quake/cvm/cvm.c: an etree database whose app-metadata text string
("dbctl") carries the geographic origin/extent and whose leaf payloads are
(Vp, Vs, density) float32 records.  Queries are batch/vectorized
(cvm_query, cvm.c:265-316; dbctl parse, cvm.c:57-215).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .etree.reader import EtreeReader

# meters per degree, cvm.h:32-33
DIST1LAT = 110922.0
DIST1LON = 92382.0


@dataclass
class DBCtl:
    create_model_name: str = ""
    create_author: str = ""
    create_date: str = ""
    create_field_count: str = ""
    create_field_names: str = ""
    region_origin_latitude_deg: float = 0.0
    region_origin_longitude_deg: float = 0.0
    region_length_east_m: float = 0.0
    region_length_north_m: float = 0.0
    region_depth_shallow_m: float = 0.0
    region_depth_deep_m: float = 0.0
    domain_endpoint_x: int = 0
    domain_endpoint_y: int = 0
    domain_endpoint_z: int = 0

    @classmethod
    def from_text(cls, text: str) -> "DBCtl":
        t = text.split()
        return cls(
            create_model_name=t[0], create_author=t[1], create_date=t[2],
            create_field_count=t[3], create_field_names=t[4],
            region_origin_latitude_deg=float(t[5]),
            region_origin_longitude_deg=float(t[6]),
            region_length_east_m=float(t[7]),
            region_length_north_m=float(t[8]),
            region_depth_shallow_m=float(t[9]),
            region_depth_deep_m=float(t[10]),
            domain_endpoint_x=int(t[11]),
            domain_endpoint_y=int(t[12]),
            domain_endpoint_z=int(t[13]),
        )

    def to_text(self) -> str:
        return (f"{self.create_model_name} {self.create_author} "
                f"{self.create_date} {self.create_field_count} "
                f"{self.create_field_names} "
                f"{self.region_origin_latitude_deg:f} "
                f"{self.region_origin_longitude_deg:f} "
                f"{self.region_length_east_m:f} "
                f"{self.region_length_north_m:f} "
                f"{self.region_depth_shallow_m:f} "
                f"{self.region_depth_deep_m:f} "
                f"{self.domain_endpoint_x} {self.domain_endpoint_y} "
                f"{self.domain_endpoint_z} ")


class CVM:
    """Open a CVM etree and answer batched material queries."""

    def __init__(self, path: str):
        self.db = EtreeReader(path)
        if self.db.appmeta is None:
            raise ValueError(f"{path}: CVM database has no control data")
        self.ctl = DBCtl.from_text(self.db.appmeta)
        # cvm.c:291: ticksize from east extent / x endpoint
        self.ticksize = (self.ctl.region_length_east_m
                         / self.ctl.domain_endpoint_x)
        names = self.db.schema.names if self.db.schema else []
        # field names are Vp, Vs, density in reference DBs
        self._vp = names[0] if names else None

    def query(self, east_m, north_m, depth_m):
        """Vectorized cvm_query.  Inputs in meters (arrays broadcast).

        Returns (ok[n] bool, Vp[n], Vs[n], rho[n]) float64 arrays; failed
        queries hold NaN.
        """
        east_m = np.atleast_1d(np.asarray(east_m, dtype=np.float64))
        north_m = np.atleast_1d(np.asarray(north_m, dtype=np.float64))
        depth_m = np.atleast_1d(np.asarray(depth_m, dtype=np.float64))
        x = (east_m / self.ticksize).astype(np.int64)
        y = (north_m / self.ticksize).astype(np.int64)
        z = (depth_m / self.ticksize).astype(np.int64)
        inb = ((x >= 0) & (y >= 0) & (z >= 0)
               & (x < self.ctl.domain_endpoint_x)
               & (y < self.ctl.domain_endpoint_y)
               & (z < self.ctl.domain_endpoint_z))
        ok, idx = self.db.search_points(
            x.astype(np.uint32), y.astype(np.uint32), z.astype(np.uint32))
        ok = ok & inb
        rec = self.db.records(idx)
        nan = np.where(ok, 1.0, np.nan)
        fields = self.db.schema.names
        vp = rec[fields[0]].astype(np.float64) * nan
        vs = rec[fields[1]].astype(np.float64) * nan
        rho = rec[fields[2]].astype(np.float64) * nan
        return ok, vp, vs, rho
