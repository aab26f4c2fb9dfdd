"""On-device traceback must reproduce the host walk column-for-column.

The host walk (bialign_tpu.ops.traceback) is itself golden-validated
against the reference's recursive traceback; here we check the
lax.while_loop re-implementation (bialign_tpu.ops.device_traceback)
against it on random score tables — co-optimal paths are abundant with
small integer scores, so this exercises the argmin tie-breaking, the
start-state selection, and the first-call quirk.
"""

import numpy as np
import pytest

from bialign_tpu.ops import reference_dp, traceback as host_tb
from bialign_tpu.ops import xla_dp, device_traceback as dtb


def _rand_tables(rng, n, m, lo=-3, hi=4, scale=100):
    mu1 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu2 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu1[1:, 1:] = rng.integers(lo, hi, size=(n, m)) * scale
    mu2[1:, 1:] = rng.integers(lo, hi, size=(n, m)) * scale
    return mu1, mu2


CASES = [
    (5, 7, 1, -150, -50, -150),
    (8, 8, 2, -100, -200, -250),
    (6, 4, 1, -50, -100, -100),
    (1, 1, 1, -150, -50, -150),
    (9, 9, 2, -150, -50, -210),
]


@pytest.mark.parametrize("n,m,S,beta,gamma,delta", CASES)
def test_affine_device_matches_host(n, m, S, beta, gamma, delta):
    rng = np.random.default_rng(n * 1000 + m * 10 + S)
    for trial in range(3):
        mu1, mu2 = _rand_tables(rng, n, m)
        H = reference_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
        want, want_complete = host_tb.affine_traceback(
            H, mu1, mu2, S, beta, gamma, delta
        )
        band = xla_dp.fill_affine_device(mu1, mu2, S, beta, gamma, delta)
        got, got_complete = dtb.affine_traceback(
            band, beta, gamma, delta, mu1, mu2
        )
        assert [tuple(c) for c in got] == [tuple(c) for c in want]
        assert got_complete == want_complete


@pytest.mark.parametrize("n,m,S,gamma,delta", [
    (5, 7, 1, -200, -250),
    (8, 8, 2, -200, -250),
    (7, 3, 1, -100, -50),
])
def test_nonaffine_device_matches_host(n, m, S, gamma, delta):
    rng = np.random.default_rng(n * 100 + m)
    for trial in range(3):
        mu1, mu2 = _rand_tables(rng, n, m)
        H = reference_dp.fill_nonaffine(mu1, mu2, S, gamma, delta)
        want = host_tb.nonaffine_traceback(H, mu1, mu2, S, gamma, delta)
        band = xla_dp.fill_nonaffine_device(mu1, mu2, S, gamma, delta)
        got = dtb.nonaffine_traceback(band, gamma, delta, mu1, mu2)
        assert [tuple(c) for c in got] == [tuple(c) for c in want]


def test_device_band_cells_match_oracle():
    rng = np.random.default_rng(7)
    n, m, S = 6, 5, 1
    mu1, mu2 = _rand_tables(rng, n, m)
    H = reference_dp.fill_affine(mu1, mu2, S, -150, -50, -150)
    band = xla_dp.fill_affine_device(mu1, mu2, S, -150, -50, -150)
    idxs = []
    for q in range(9):
        for i in range(n + 1):
            for j in range(m + 1):
                idxs.append((q, i, j, i, j))
    idxs = np.asarray(idxs)
    got = band.cells(idxs)
    want = H[idxs[:, 0], idxs[:, 1], idxs[:, 2], S, S]
    assert (got == want).all()
    assert band.final_score() == reference_dp.affine_score_from_band(
        H, n, m, S
    )
