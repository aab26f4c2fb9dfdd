"""Triplet aligner: XLA engine vs numpy oracle, plus behavioral checks.

The reference triplet module is un-importable dead code
(bialign_triplet.py:28 SyntaxError), so there are no goldens to match —
the oracle anchors correctness and we check structural invariants
(decode shape, score consistency, trace replay).
"""

import numpy as np
import pytest

from bialign_tpu.models.triplet import (
    BiAlignerTriplet,
    fill_oracle,
    fill_xla,
    TRIPLET_COLS,
)


def _rand_tables(rng, n, m):
    mu1 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu2 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu1[1:, 1:] = rng.integers(-400, 900, size=(n, m))
    mu2[1:, 1:] = rng.integers(-400, 900, size=(n, m))
    return mu1, mu2


@pytest.mark.parametrize("n,m,S", [(5, 7, 1), (8, 8, 2), (3, 9, 1),
                                   (9, 3, 2), (1, 1, 1)])
def test_triplet_engines_agree(n, m, S):
    rng = np.random.default_rng(n * 31 + m * 7 + S)
    mu1, mu2 = _rand_tables(rng, n, m)
    want = fill_oracle(mu1, mu2, S, -200, -250)
    got = fill_xla(mu1, mu2, S, -200, -250)
    # compare band cells only
    for i in range(n + 1):
        for j in range(m + 1):
            for k in range(max(0, j - S), min(m + 1, j + S + 1)):
                assert got[i, j, k] == want[i, j, k], (i, j, k)


def test_triplet_end_to_end():
    ba = BiAlignerTriplet(
        "GCGGGGGAUAUCCCCAUCG", "GGGGAUAUCCCCAUCG",
        "...(((.....))).....", ".(((.....)))....",
        type="RNA", structure_weight=400, gap_cost=-200,
        shift_cost=-250, max_shift=2,
    )
    score = ba.optimize()
    trace = ba.traceback()
    # trace must advance A by n and both B copies by m
    assert sum(t[0] for t in trace) == 19
    assert sum(t[1] for t in trace) == 16
    assert sum(t[2] for t in trace) == 16

    rows = ba.decode_trace(trace)
    assert len(rows) == 3
    assert all(len(r) == len(rows[0]) for r in rows)
    assert rows[0].replace("-", "") == "GCGGGGGAUAUCCCCAUCG"
    assert rows[1].replace("-", "") == "GGGGAUAUCCCCAUCG"

    rows6 = ba.decode_trace(trace, show_structures=True)
    assert len(rows6) == 6

    lines = list(ba.eval_trace(trace))
    assert len(lines) == len(trace)
    # final replayed total equals the optimal score
    assert lines[-1].endswith(str(score))


def test_triplet_xla_engine_end_to_end():
    ba = BiAlignerTriplet(
        "ACGGCU", "ACGCU", "((..))", "((.))",
        type="RNA", structure_weight=400, gap_cost=-200,
        shift_cost=-250, max_shift=1, engine="xla",
    )
    bo = BiAlignerTriplet(
        "ACGGCU", "ACGCU", "((..))", "((.))",
        type="RNA", structure_weight=400, gap_cost=-200,
        shift_cost=-250, max_shift=1, engine="numpy",
    )
    assert ba.optimize() == bo.optimize()
    assert ba.decode_trace() == bo.decode_trace()
