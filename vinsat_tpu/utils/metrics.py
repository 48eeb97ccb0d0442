"""Structured metrics: per-iteration residuals, λ, per-window ATE -> jsonl.

The reference's observability is print() + npy dumps (SURVEY.md §5); this
module formalizes it: a MetricsLogger accumulates records host-side and
writes newline-delimited JSON, cheap enough to call per window.
"""
from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, run_id: str = "run"):
        self.path = path
        self.run_id = run_id
        self.records: List[Dict[str, Any]] = []
        self._fh = open(path, "a") if path else None

    def log(self, kind: str, **fields):
        rec = {"ts": time.time(), "run": self.run_id, "kind": kind, **fields}
        self.records.append(rec)
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def log_window(self, window_idx: int, num_knots: int, num_obs: int,
                   mean_residual: float, lamda: float, wall_s: float,
                   end_error_km: Optional[float] = None):
        return self.log(
            "window", window=window_idx, knots=num_knots, obs=num_obs,
            mean_residual=float(mean_residual), lamda=float(lamda),
            wall_s=float(wall_s),
            end_error_km=None if end_error_km is None else float(end_error_km),
        )

    def summary(self) -> Dict[str, Any]:
        windows = [r for r in self.records if r["kind"] == "window"]
        out: Dict[str, Any] = {"num_windows": len(windows)}
        if windows:
            out["total_wall_s"] = sum(r["wall_s"] for r in windows)
            out["mean_residual_last"] = windows[-1]["mean_residual"]
        return out

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
