"""Built-in RNA partition function: base-pair probabilities + MEA structure.

The reference can only align RNAs without a given structure when the
ViennaRNA C library is installed (lazy ``import RNA``,
bialignment.pyx:347-353; otherwise it errors).  This module makes the
framework standalone: a McCaskill-style inside/outside computation over a
Nussinov-class energy model (per-pair Boltzmann weights, minimum hairpin
loop) produces a symmetric base-pair-probability matrix compatible with
everything downstream (``mea``, ``consensus_sbpp``, the stral-like mu2
scoring).

DOCUMENTED DIVERGENCE: probabilities differ numerically from ViennaRNA's
Turner-model ensemble — this is a fallback for when ViennaRNA is absent,
not a re-implementation of it.  When ViennaRNA is importable the
preprocessing uses it, exactly like the reference.

Algorithm (host numpy, float64, O(n^3) inside / sparse outside):

  Qb[i,j] = w(i,j) * Q[i+1,j-1]                 (i pairs j)
  Q[i,j]  = Q[i,j-1] + sum_k Q[i,k-1] * Qb[k,j] (rightmost-pair decomp.)
  P[i,j]  = Qb[i,j] * ( Qext + sum over direct enclosers (k,l):
            P[k,l] * Q[k+1,i-1] * Q[j+1,l-1] / Q[k+1,l-1] )

with per-base rescaling to keep doubles in range.  The outside sum visits
only enclosers with non-negligible probability, giving ~O(n^3) practical
cost.
"""

from __future__ import annotations

import numpy as np

# Boltzmann weights per pair type (unitless; roughly exp(stacking
# strength)): GC strongest, AU, then the GU wobble.
PAIR_WEIGHTS = {
    ("G", "C"): 20.0, ("C", "G"): 20.0,
    ("A", "U"): 7.0, ("U", "A"): 7.0,
    ("G", "U"): 2.0, ("U", "G"): 2.0,
}
MIN_HAIRPIN = 3  # minimum unpaired bases enclosed by a pair
_PROB_CUTOFF = 1e-7


def _weight_matrix(seq: str, scale: float) -> np.ndarray:
    n = len(seq)
    s = seq.upper().replace("T", "U")
    w = np.zeros((n, n))
    for i in range(n):
        for j in range(i + MIN_HAIRPIN + 1, n):
            w[i, j] = PAIR_WEIGHTS.get((s[i], s[j]), 0.0) / (scale * scale)
    return w


def partition_bpp(seq: str) -> np.ndarray:
    """Base-pair probability matrix, 1-based (n+1, n+1), symmetric, with
    the diagonal holding the unpaired probability (same convention as
    ``symmetrize_bpps``, bialignment.pyx:326-338)."""
    n = len(seq)
    if n == 0:
        return np.zeros((1, 1))
    # rescale so Q stays in double range: each base contributes ~1/scale
    scale = max(1.0, (sum(PAIR_WEIGHTS.values()) / 6.0) ** 0.25)
    w = _weight_matrix(seq, scale)
    inv = 1.0 / scale

    # inside: Q[i,j] over 0-based i..j inclusive; empty interval = 1
    Q = np.ones((n + 2, n + 2))   # Q[i, j+1] layout: Q_[i][j] = Q(i..j-1)
    Qb = np.zeros((n, n))

    def q(i, j):
        """Q over 0-based half-open [i, j); 1 when empty."""
        if j <= i:
            return 1.0
        return Q[i, j]

    for span in range(1, n + 1):
        for i in range(0, n - span + 1):
            j = i + span  # half-open end
            jj = j - 1    # last index
            # Qb for pair (i, jj)
            if w[i, jj] > 0.0:
                Qb[i, jj] = w[i, jj] * q(i + 1, jj)
            # Q: last base unpaired, or pairs with some k
            acc = q(i, jj) * inv
            row = Qb[i:jj + 1, jj]
            if row.any():
                ks = np.nonzero(row)[0]
                for k0 in ks:
                    acc += q(i, i + k0) * row[k0]
            Q[i, j] = acc

    Qtot = q(0, n)
    if Qtot <= 0.0 or not np.isfinite(Qtot):
        # no structure possible — everything unpaired
        sbpp = np.zeros((n + 1, n + 1))
        np.fill_diagonal(sbpp, 1.0)
        sbpp[0, 0] = 0.0
        return sbpp

    # outside: process spans longest-first so enclosers are ready
    P = np.zeros((n, n))
    spans = sorted(
        [(i, j) for i in range(n) for j in range(i + MIN_HAIRPIN + 1, n)
         if Qb[i, j] > 0.0],
        key=lambda ij: ij[0] - ij[1],
    )
    enclosers: list = []
    for i, j in spans:
        ext = q(0, i) * q(j + 1, n) / Qtot
        tot = ext
        for (k, l, pkl_over_qint) in enclosers:
            if k < i and j < l:
                tot += pkl_over_qint * q(k + 1, i) * q(j + 1, l)
        P[i, j] = Qb[i, j] * tot
        if P[i, j] > _PROB_CUTOFF:
            enclosers.append((i, j, P[i, j] / max(q(i + 1, j), 1e-300)))

    # 1-based symmetric sbpp with unpaired probability on the diagonal
    sbpp = np.zeros((n + 1, n + 1))
    sbpp[1:, 1:] = P + P.T
    for i in range(1, n + 1):
        sbpp[i, i] = 1.0 - sbpp[i].sum()
    return sbpp


def predict_structure(seq: str):
    """(dot-bracket structure, sbpp) via the built-in partition function +
    MEA decoding — the fallback analog of the reference's
    ViennaRNA ``pf()`` + ``mea`` path (pyx:349-354)."""
    from .structure import mea

    sbpp = partition_bpp(seq)
    structure, _ = mea(sbpp)
    return structure, sbpp
