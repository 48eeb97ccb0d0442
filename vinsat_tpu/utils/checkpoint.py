"""Checkpoint/resume for streaming OD runs.

The reference's algorithmic checkpoint is the streaming prior — each window
emits (state, trailing hessian) and the next window resumes from the
propagated state (SURVEY.md §5 checkpoint bullet).  This module serializes
exactly that tuple plus the window cursor, so a long multi-orbit run can be
killed and resumed per window.  Uses orbax when available, npz otherwise.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def save(path: str, *, states: np.ndarray, last_hessian: Optional[np.ndarray],
         window_idx: int, lamda: float, knot_times: np.ndarray,
         errors: np.ndarray, times: np.ndarray, extra: Optional[Dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        states=states,
        last_hessian=(np.zeros((9, 9)) if last_hessian is None else last_hessian),
        has_hessian=np.array(last_hessian is not None),
        window_idx=np.array(window_idx),
        lamda=np.array(lamda),
        knot_times=knot_times,
        errors=errors,
        times=times,
        **(extra or {}),
    )


def load(path: str) -> Dict[str, Any]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files}
    out["window_idx"] = int(out["window_idx"])
    out["lamda"] = float(out["lamda"])
    if not bool(out.pop("has_hessian")):
        out["last_hessian"] = None
    return out


def save_orbax(path: str, tree) -> bool:
    """Orbax-backed checkpoint for multi-host runs; returns False if orbax
    is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    return True


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
