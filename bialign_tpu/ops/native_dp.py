"""Host DP fills backed by the native C++ core.

Same band layout and bit-exact semantics as the numpy oracle
(:mod:`bialign_tpu.ops.reference_dp`); the case tables are marshalled
from :mod:`bialign_tpu.ops.cases` so all engines share one source of
truth.  ~1000x the oracle's throughput on host — the practical CPU
fallback engine (the oracle stays as the readable correctness anchor).
"""

from __future__ import annotations

import functools

import numpy as np

from .. import native
from .cases import (
    N_STATES,
    STATE_BOTH_MATCH,
    NonAffineTables,
    NONAFFINE_COLS,
    iter_affine_cases,
)

N_AFFINE_CASES = 15

assert STATE_BOTH_MATCH == N_STATES - 1  # the C++ origin init relies on it


def available() -> bool:
    return native.available()


@functools.lru_cache(maxsize=None)
def _affine_tables(beta: int, gamma: int, delta: int):
    src = np.zeros((N_STATES, N_AFFINE_CASES), dtype=np.int32)
    col = np.zeros((N_STATES, N_AFFINE_CASES, 4), dtype=np.int32)
    cst = np.zeros((N_STATES, N_AFFINE_CASES), dtype=np.int32)
    m1c = np.zeros((N_STATES, N_AFFINE_CASES), dtype=np.int32)
    m2c = np.zeros((N_STATES, N_AFFINE_CASES), dtype=np.int32)
    for q in range(N_STATES):
        for ci, (s, c, mu1c, mu2c, ng, nb, nd, _g) in enumerate(
            iter_affine_cases(q)
        ):
            src[q, ci] = s
            col[q, ci] = c
            cst[q, ci] = ng * gamma + nb * beta + nd * delta
            m1c[q, ci] = mu1c
            m2c[q, ci] = mu2c
    return src, col, cst, m1c, m2c


def fill_affine(mu1, mu2, max_shift, beta, gamma, delta):
    """Affine fill via C++; returns H[q, i, j, sk, sl] int64 (oracle
    layout, drop-in for the host traceback and eval)."""
    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native engine unavailable (no compiler)")
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    W = 2 * max_shift + 1
    src, col, cst, m1c, m2c = _affine_tables(beta, gamma, delta)
    H = np.zeros((N_STATES, n + 1, m + 1, W, W), dtype=np.int64)
    lib.bialign_affine_fill(
        np.ascontiguousarray(mu1, dtype=np.int32),
        np.ascontiguousarray(mu2, dtype=np.int32),
        n, m, max_shift,
        src, np.ascontiguousarray(col), cst, m1c, m2c,
        N_STATES, N_AFFINE_CASES, H,
    )
    return H


@functools.lru_cache(maxsize=None)
def _nonaffine_tables(gamma: int, delta: int):
    tab = NonAffineTables(gamma, delta)
    col = np.ascontiguousarray(tab.cols, dtype=np.int32)
    return (
        col,
        np.ascontiguousarray(tab.const, dtype=np.int32),
        np.ascontiguousarray(tab.mu1_coef, dtype=np.int32),
        np.ascontiguousarray(tab.mu2_coef, dtype=np.int32),
    )


def fill_nonaffine(mu1, mu2, max_shift, gamma, delta):
    """Non-affine fill via C++; H[i, j, sk, sl] int64."""
    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native engine unavailable (no compiler)")
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    W = 2 * max_shift + 1
    col, cst, m1c, m2c = _nonaffine_tables(gamma, delta)
    H = np.zeros((n + 1, m + 1, W, W), dtype=np.int64)
    lib.bialign_nonaffine_fill(
        np.ascontiguousarray(mu1, dtype=np.int32),
        np.ascontiguousarray(mu2, dtype=np.int32),
        n, m, max_shift,
        col, cst, m1c, m2c, len(NONAFFINE_COLS), H,
    )
    return H
