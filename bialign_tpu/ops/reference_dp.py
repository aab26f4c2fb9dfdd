"""Cell-by-cell numpy anchor engine (correctness oracle).

A direct, slow, host-side evaluation of the banded 4D recurrence
(reference fill loops: bialignment.pyx:443-471 non-affine, 474-509 affine),
built on the shared case tables in :mod:`bialign_tpu.ops.cases`.  Every other
engine (XLA scan, Pallas, native C++) is validated cell-for-cell against
this one on small inputs.

Band storage is dense shift-relative:
    H[q, i, j, sk, sl]  with sk = k - i + S, sl = l - j + S
(int64 so the oracle is immune to overflow questions; the fast engines use
int32 after a range check).
"""

from __future__ import annotations

import numpy as np

from .cases import (
    NEG_INF,
    N_STATES,
    STATE_BOTH_MATCH,
    NonAffineTables,
    guard_case,
    iter_affine_cases,
)


def band_range(center: int, limit: int, max_shift: int):
    return range(max(0, center - max_shift), min(limit + 1, center + max_shift + 1))


def fill_affine(mu1, mu2, max_shift, beta, gamma, delta):
    """Affine fill (pyx:474-509).  Returns H[q, i, j, sk, sl] int64."""
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    W = 2 * S + 1

    H = np.zeros((N_STATES, n + 1, m + 1, W, W), dtype=np.int64)
    # init: only the both-match state is reachable at the origin (pyx:483-485)
    H[:, 0, 0, S, S] = NEG_INF
    H[STATE_BOTH_MATCH, 0, 0, S, S] = 0

    cases = [list(iter_affine_cases(q)) for q in range(N_STATES)]

    for i in range(n + 1):
        for j in range(m + 1):
            for k in band_range(i, n, S):
                for l in band_range(j, m, S):
                    if (i, j, k, l) == (0, 0, 0, 0):
                        continue
                    idx = (i, j, k, l)
                    for q in range(N_STATES):
                        best = None
                        for (src, col, mu1c, mu2c, ng, nb, nd, _g) in cases[q]:
                            if not guard_case(col, idx, S):
                                continue
                            pi, pj = i - col[0], j - col[1]
                            pk, pl = k - col[2], l - col[3]
                            val = (
                                H[src, pi, pj, pk - pi + S, pl - pj + S]
                                + ng * gamma
                                + nb * beta
                                + nd * delta
                                + mu1c * mu1[i, j]
                                + mu2c * mu2[k, l]
                            )
                            if best is None or val > best:
                                best = val
                        H[q, i, j, k - i + S, l - j + S] = (
                            best if best is not None else NEG_INF
                        )
    return H


def affine_score_from_band(H, n, m, max_shift):
    S = max_shift
    return int(H[:, n, m, S, S].max())


def fill_nonaffine(mu1, mu2, max_shift, gamma, delta):
    """Non-affine fill (pyx:443-471).  Returns H[i, j, sk, sl] int64."""
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    W = 2 * S + 1

    H = np.zeros((n + 1, m + 1, W, W), dtype=np.int64)
    tab = NonAffineTables(gamma, delta)
    cols = [tuple(int(v) for v in c) for c in tab.cols]

    for i in range(n + 1):
        for j in range(m + 1):
            for k in band_range(i, n, S):
                for l in band_range(j, m, S):
                    if (i, j, k, l) == (0, 0, 0, 0):
                        continue  # implicit 0 init (pyx:464-465)
                    idx = (i, j, k, l)
                    best = None
                    for ci, col in enumerate(cols):
                        if not guard_case(col, idx, S):
                            continue
                        pi, pj = i - col[0], j - col[1]
                        pk, pl = k - col[2], l - col[3]
                        val = (
                            H[pi, pj, pk - pi + S, pl - pj + S]
                            + tab.const[ci]
                            + tab.mu1_coef[ci] * mu1[i, j]
                            + tab.mu2_coef[ci] * mu2[k, l]
                        )
                        if best is None or val > best:
                            best = val
                    H[i, j, k - i + S, l - j + S] = (
                        best if best is not None else NEG_INF
                    )
    return H


def nonaffine_score_from_band(H, n, m, max_shift):
    S = max_shift
    return int(H[n, m, S, S])
