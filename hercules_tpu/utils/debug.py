"""Numerical health checks: NaN scanning and overflow monitoring.

Replaces the reference's DEBUG-guarded nets: solver_check_nan
(psolve.c:3770), solver_debug_overflow (:3674) and the hu_*_nan
scanners (util.c:60-217).  Cheap enough to run per-chunk on device
(one reduction), raising with the offending step range on failure."""

from __future__ import annotations

import numpy as np


def check_state(state, where="", max_disp=None):
    """Raise if the displacement field contains NaN/Inf (or exceeds
    max_disp, the solver_debug_overflow equivalent)."""
    u = np.asarray(state[0])
    if not np.isfinite(u).all():
        bad = np.flatnonzero(~np.isfinite(u).all(axis=-1))[:10]
        raise FloatingPointError(
            f"non-finite displacement {where} at nodes {bad.tolist()}")
    if max_disp is not None:
        peak = float(np.abs(u).max())
        if peak > max_disp:
            raise FloatingPointError(
                f"displacement overflow {where}: |u|={peak:.3e} > "
                f"{max_disp:.3e}")
    return True


def make_chunk_checker(every=1, max_disp=None, inner=None):
    """on_chunk hook running check_state every `every` chunks."""
    n = {"i": 0}

    def hook(done, state):
        n["i"] += 1
        if n["i"] % every == 0:
            check_state(state, where=f"after step {done}",
                        max_disp=max_disp)
        if inner is not None:
            inner(done, state)

    return hook
