"""Covariance calibration via NEES tracking (SURVEY §5 aux; ROADMAP item).

The terminal window marginal (`ba.terminal_marginal_info`) is a CRLB-style
information matrix under independent pixel noise.  The streaming estimator's
ACTUAL error is dominated by correlated/bias components the CRLB cannot see,
so the raw marginal is overconfident (measured 10-30x in position,
docs/BENCHMARKS.md) — which is why the anchor prior needs covariance floors
(`ba.inflate_info`).  This module makes that calibration *principled and
automatic* instead of hand-measured:

  * `nees(est, gt, H9)` — normalized estimation error squared e^T H e of a
    single state against its information matrix (consistent filter: E[nees]
    = dof).
  * `block_nees(est, gt, H9)` — per-block (pos/rot/vel) NEES using the
    marginal information of each 3-dof block (Schur complement), the right
    quantity for tuning per-block floors.
  * `calibrate_inflation(infos, ests, gts)` — per-block covariance
    inflation factors c such that mean block-NEES == dof after inflating
    cov_X by c_X; and `apply_inflation(H9, c)` to use them.
  * `floors_from_inflation(infos, c)` — translate inflation factors into
    the equivalent `StreamingConfig.prior_*_floor` values (the existing
    prior machinery consumes floors, not factors).

The reference has no covariance-consistency machinery at all (its BA_reg
prior path was dead code behind a live ipdb, BA_filtering.py:135); this is
a framework addition.

No 1/2-factor subtleties here: the rotation error uses the same
`box_plus`/`log` convention as the solver retraction (core/quat.py:163).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from vinsat_tpu.core import quat

_BLOCKS = {"pos": slice(0, 3), "rot": slice(3, 6), "vel": slice(6, 9)}


def pose_error_tangent(est_state: np.ndarray, gt_state: np.ndarray
                       ) -> np.ndarray:
    """Tangent-space error [dpos_km, dphi, dvel] of one (10,) state pair.

    dphi is defined by est = gt ⊞ dphi (the solver's retraction,
    `quat.box_plus`): dphi = log(conj(q_gt) ⊗ q_est).
    """
    est = np.asarray(est_state, np.float64)
    gt = np.asarray(gt_state, np.float64)
    dpos = est[:3] - gt[:3]
    dphi = np.asarray(quat.log(quat.multiply(
        quat.conjugate(jnp.asarray(gt[3:7])), jnp.asarray(est[3:7]))))
    dvel = est[7:10] - gt[7:10]
    return np.concatenate([dpos, dphi, dvel])


def nees(est_state: np.ndarray, gt_state: np.ndarray, H9: np.ndarray
         ) -> float:
    """Full-state NEES e^T H e (consistent estimator: E = 9)."""
    e = pose_error_tangent(est_state, gt_state)
    return float(e @ np.asarray(H9, np.float64) @ e)


def _marginal_block_info(H9: np.ndarray, sl: slice) -> np.ndarray:
    """3x3 marginal information of one block: Schur complement onto it
    (equivalently inv(cov_block))."""
    cov = np.linalg.inv(np.asarray(H9, np.float64) + 1e-12 * np.eye(9))
    return np.linalg.inv(cov[sl, sl])


def block_nees(est_state: np.ndarray, gt_state: np.ndarray, H9: np.ndarray
               ) -> dict:
    """Per-block NEES {pos, rot, vel} (consistent: E = 3 each)."""
    e = pose_error_tangent(est_state, gt_state)
    return {
        name: float(e[sl] @ _marginal_block_info(H9, sl) @ e[sl])
        for name, sl in _BLOCKS.items()
    }


def calibrate_inflation(infos: Sequence[np.ndarray],
                        ests: Sequence[np.ndarray],
                        gts: Sequence[np.ndarray]) -> dict:
    """Per-block covariance inflation factors from NEES samples.

    c_X = mean_w(nees_X_w) / 3: inflating each block covariance by c_X
    makes the mean block NEES equal its dof, i.e. the reported uncertainty
    consistent with the realized errors.  c_X >> 1 = overconfident
    marginal (the measured CRLB-vs-bias gap); c_X < 1 = pessimistic.
    """
    samples = {name: [] for name in _BLOCKS}
    for H9, est, gt in zip(infos, ests, gts):
        bn = block_nees(est, gt, H9)
        for name in _BLOCKS:
            samples[name].append(bn[name])
    return {name: float(np.mean(v) / 3.0) for name, v in samples.items()}


def apply_inflation(H9: np.ndarray, c: dict) -> np.ndarray:
    """Inflate a 9x9 information matrix's covariance blockwise by the
    calibration factors: cov' = S cov S with S = diag(sqrt(c_X)) per block
    (preserves correlations; exact per-block mean-NEES correction)."""
    cov = np.linalg.inv(np.asarray(H9, np.float64) + 1e-12 * np.eye(9))
    s = np.concatenate([
        np.full(3, np.sqrt(max(c["pos"], 1e-12))),
        np.full(3, np.sqrt(max(c["rot"], 1e-12))),
        np.full(3, np.sqrt(max(c["vel"], 1e-12))),
    ])
    cov_c = cov * s[:, None] * s[None, :]
    return np.linalg.inv(cov_c)


def floors_from_inflation(infos: Sequence[np.ndarray], c: dict
                          ) -> Tuple[float, float, float]:
    """Equivalent `StreamingConfig` floors (pos_km, rot, vel) for the
    existing additive-floor prior machinery: floor_X² = (c_X - 1) ·
    median_w(mean diag cov_X_w), i.e. the additive variance that matches
    the multiplicative calibration at the typical window (inflation < 1
    maps to floor 0 — additive floors cannot shrink covariance)."""
    diags = {name: [] for name in _BLOCKS}
    for H9 in infos:
        cov = np.linalg.inv(np.asarray(H9, np.float64) + 1e-12 * np.eye(9))
        for name, sl in _BLOCKS.items():
            diags[name].append(float(np.mean(np.diag(cov)[sl])))
    out = []
    for name in ("pos", "rot", "vel"):
        base = float(np.median(diags[name]))
        out.append(float(np.sqrt(max(c[name] - 1.0, 0.0) * base)))
    return tuple(out)
