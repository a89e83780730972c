"""Checkpoint / restart (io_checkpoint.c:29-236).

The reference alternates two files checkpoint.out{0,1}, writing a tiny
header plus fixed-stride tm1/tm2 slabs per PE, and restarts only with
an identical rank count; BKT convolution state is NOT saved (a known
gap, SURVEY.md section 5).  This implementation keeps the alternating
double-buffer protocol and the checkpoint.in restart convention but
stores the *global* state (u_now, u_prev, plus the BKT convolution
arrays and the nonlinear plastic state when present), so restarts are
rank-elastic and bit-exact for all damping and material models.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

MAGIC = b"HTPUCKPT1"

# ---- async writer (one ordered worker, like the 4-D/plane threads;
# the reference overlaps output with compute via its IO pool) --------
_q: queue.Queue = None
_worker: threading.Thread = None


def _ensure_worker():
    global _q, _worker
    if _worker is None or not _worker.is_alive():
        _q = queue.Queue(maxsize=2)

        def loop():
            while True:
                item = _q.get()
                if item is None:
                    _q.task_done()
                    return
                fn, args = item
                try:
                    fn(*args)
                finally:
                    _q.task_done()

        _worker = threading.Thread(target=loop, daemon=True)
        _worker.start()


def checkpoint_write_async(path_dir, step, state, extra=None):
    """Queue a checkpoint write on the background writer thread.  The
    device arrays are snapshotted to host first (cheap relative to the
    npz serialization + disk write this overlaps)."""
    u_now, u_prev, conv = state
    snap = (np.asarray(u_now), np.asarray(u_prev),
            _tree_asarray(conv))
    _ensure_worker()
    _q.put((checkpoint_write, (path_dir, step, snap, extra)))


def checkpoint_flush():
    """Block until all queued checkpoint writes hit disk."""
    if _q is not None:
        _q.join()


def _tree_asarray(t):
    if t is None:
        return None
    if isinstance(t, (tuple, list)):
        return tuple(_tree_asarray(x) for x in t)
    return np.asarray(t)


def checkpoint_write(path_dir, step, state, extra=None):
    """Write checkpoint for `step` to the alternating output file.

    state: (u_now, u_prev, conv) with u [N,3] or [3,N]; conv pytree of
    arrays or ().
    """
    os.makedirs(path_dir, exist_ok=True)
    which = _next_slot(path_dir)
    path = os.path.join(path_dir, f"checkpoint.out{which}")
    tmp = path + ".tmp"
    u_now, u_prev, conv = state
    arrays = {"u_now": np.asarray(u_now), "u_prev": np.asarray(u_prev)}
    flat, _ = _flatten(conv)
    for i, a in enumerate(flat):
        arrays[f"conv{i}"] = np.asarray(a)
    if extra:
        arrays.update({k: np.asarray(v) for k, v in extra.items()})
    with open(tmp, "wb") as f:
        np.savez(f, step=np.int64(step), **arrays)
    os.replace(tmp, path)
    return path


def _next_slot(path_dir):
    """Alternate between slots 0 and 1, overwriting the older one."""
    t = []
    for w in (0, 1):
        p = os.path.join(path_dir, f"checkpoint.out{w}")
        t.append(os.path.getmtime(p) if os.path.exists(p) else -1.0)
    return 0 if t[0] <= t[1] else 1


def checkpoint_read(path):
    """Read ``checkpoint.in`` (the operator renames the chosen .out, as
    in the reference) or a direct file path.

    Returns (start_step, u_now, u_prev, conv_arrays list, extras dict).
    """
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint.in")
    with np.load(path) as z:
        step = int(z["step"])
        u_now = z["u_now"]
        u_prev = z["u_prev"]
        conv = []
        i = 0
        while f"conv{i}" in z:
            conv.append(z[f"conv{i}"])
            i += 1
        extras = {k: z[k] for k in z.files
                  if not (k in ("step", "u_now", "u_prev")
                          or k.startswith("conv"))}
    return step, u_now, u_prev, conv, extras


def _flatten(tree):
    """Tiny pytree flatten for tuples/lists of arrays."""
    flat = []

    def rec(x):
        if isinstance(x, (tuple, list)):
            for y in x:
                rec(y)
        elif x is not None:
            flat.append(x)

    rec(tree)
    return flat, None
