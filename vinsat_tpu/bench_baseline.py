"""Pure-numpy baseline of one BA LM iteration, mirroring the reference's
computational pattern for honest speedup measurement.

Replicates the cost structure of BA_filtering.BA (BA_filtering.py:4-98) as
the reference executes it on CPU: per-step 1 Hz RK4 propagation loops over
the max knot gap (BA_utils.py:73-87), numerical Jacobians of the rollout via
column-wise redifferencing (standing in for torch's vectorized autograd of
the whole rollout, BA_utils.py:506), dense (9N)x(9N) assembly and
numpy.linalg.solve (BA_filtering.py:54-55).

This is NOT used by the framework — it exists so bench.py can report a
measured vs-Python-baseline ratio on identical problem sizes.
"""
from __future__ import annotations

import numpy as np

MU = 398600.4418
J2C = 1.75553e10
RMAT = np.array([[6.0, -1.5, -1.5], [6.0, -1.5, -1.5], [3.0, -4.5, -4.5]])


def _dyn(x):
    r, v = x[..., :3], x[..., 3:6]
    rn = np.linalg.norm(r, axis=-1, keepdims=True)
    j2 = (RMAT * (r[..., None, :] ** 2)).sum(-1)
    a = -(MU / rn**3) * r + (J2C / rn**7) * j2 * r
    return np.concatenate([v, a], axis=-1)


def _rk4(x, h):
    f1 = _dyn(x)
    f2 = _dyn(x + 0.5 * h * f1)
    f3 = _dyn(x + 0.5 * h * f2)
    f4 = _dyn(x + h * f3)
    return x + (h / 6.0) * (f1 + 2 * f2 + 2 * f3 + f4)


def propagate_all(x, max_gap):
    """1 Hz RK4 over the max gap for all knots (BA_utils.py:73-87 pattern)."""
    for _ in range(max_gap):
        x = _rk4(x, 1.0)
    return x


def baseline_ba_iteration(states9, ii, uv, lm, max_gap=250):
    """One LM-iteration-shaped workload: rollout + FD Jacobian of the rollout
    + dense normal equations + dense solve.  states9 (N, 9) [pos, phi, vel]
    packed; returns the solved update (value unused by callers)."""
    N = states9.shape[0]
    M = uv.shape[0]
    x = np.concatenate([states9[:, :3], states9[:, 6:9]], axis=-1)

    # residual rollout
    x_pred = propagate_all(x, max_gap)

    # numerical Jacobian of the rollout wrt each of the 6 state dims
    eps = 1e-6
    Jf = np.zeros((N, 6, 6))
    for d in range(6):
        xp = x.copy()
        xp[:, d] += eps
        Jf[:, :, d] = (propagate_all(xp, max_gap) - x_pred) / eps

    # reprojection jacobians (cheap analytic stand-in) + scatter into dense H
    H = np.zeros((N * 9, N * 9))
    g = np.zeros(N * 9)
    rng = np.random.default_rng(0)
    Jg = rng.standard_normal((M, 2, 9))
    r = rng.standard_normal((M, 2))
    for m in range(M):
        i = ii[m]
        H[i * 9:(i + 1) * 9, i * 9:(i + 1) * 9] += Jg[m].T @ Jg[m]
        g[i * 9:(i + 1) * 9] += Jg[m].T @ r[m]
    for t in range(N - 1):
        A = np.zeros((6, 9))
        A[:, 0:3] = Jf[t, :, 0:3]
        A[:, 6:9] = Jf[t, :, 3:6]
        B = np.zeros((6, 9))
        B[0:3, 0:3] = -np.eye(3)
        B[3:6, 6:9] = -np.eye(3)
        H[t * 9:(t + 1) * 9, t * 9:(t + 1) * 9] += A.T @ A
        H[(t + 1) * 9:(t + 2) * 9, (t + 1) * 9:(t + 2) * 9] += B.T @ B
        H[t * 9:(t + 1) * 9, (t + 1) * 9:(t + 2) * 9] += A.T @ B
        H[(t + 1) * 9:(t + 2) * 9, t * 9:(t + 1) * 9] += B.T @ A
    H += np.eye(N * 9) * 1e-2
    return np.linalg.solve(H, g)
