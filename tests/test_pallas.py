"""Pallas kernel parity: bit-exact vs the numpy oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from bialign_tpu.ops import reference_dp
from bialign_tpu.ops import pallas_dp
from bialign_tpu.ops import traceback as host_tb
from bialign_tpu.ops import device_traceback as dtb


def _rand_pair(rng, n, m, scale=100):
    mu1 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu2 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu1[1:, 1:] = rng.integers(-4, 9, size=(n, m)) * scale
    mu2[1:, 1:] = rng.integers(-4, 9, size=(n, m)) * scale
    return mu1, mu2


CASES = [
    (5, 7, 1, -150, -50, -150),
    (8, 8, 2, -100, -200, -250),
    (12, 3, 1, -150, -50, -210),
    (1, 1, 1, -150, -50, -150),
    (6, 6, 2, -50, -100, -100),
    (7, 9, 0, -150, -50, -150),   # max_shift 0 (reference bialign.ipynb)
]


def _genuine_mask(n, m, S):
    """Mask of band cells whose (k, l) lie inside [0,n]x[0,m]."""
    i = np.arange(n + 1)[:, None, None, None]
    j = np.arange(m + 1)[None, :, None, None]
    k = i + np.arange(2 * S + 1)[None, None, :, None] - S
    l = j + np.arange(2 * S + 1)[None, None, None, :] - S
    return (k >= 0) & (k <= n) & (l >= 0) & (l <= m)


@pytest.mark.parametrize("n,m,S,beta,gamma,delta", CASES)
def test_pallas_band_matches_oracle(n, m, S, beta, gamma, delta):
    rng = np.random.default_rng(n * 37 + m * 5 + S)
    mu1, mu2 = _rand_pair(rng, n, m)
    H = reference_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
    band = pallas_dp.fill_affine_device(mu1, mu2, S, beta, gamma, delta)
    got = band.to_numpy()
    assert got.shape == H.shape
    ok = _genuine_mask(n, m, S)[None]
    assert np.where(ok, got == H, True).all(), (
        f"mismatch at {np.argwhere(ok & (got != H))[:5]}"
    )
    assert band.final_score() == reference_dp.affine_score_from_band(
        H, n, m, S
    )


@pytest.mark.parametrize("n,m,S,beta,gamma,delta", CASES[:3])
def test_pallas_device_traceback(n, m, S, beta, gamma, delta):
    rng = np.random.default_rng(n + m + S)
    mu1, mu2 = _rand_pair(rng, n, m)
    H = reference_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
    want, want_complete = host_tb.affine_traceback(
        H, mu1, mu2, S, beta, gamma, delta
    )
    band = pallas_dp.fill_affine_device(mu1, mu2, S, beta, gamma, delta)
    got, got_complete = dtb.affine_traceback(
        band, beta, gamma, delta, mu1, mu2
    )
    assert [tuple(c) for c in got] == [tuple(c) for c in want]
    assert got_complete == want_complete


def test_pallas_score_only():
    rng = np.random.default_rng(0)
    mu1, mu2 = _rand_pair(rng, 9, 11)
    H = reference_dp.fill_affine(mu1, mu2, 1, -150, -50, -150)
    want = reference_dp.affine_score_from_band(H, 9, 11, 1)
    got = pallas_dp.affine_score(mu1, mu2, 1, -150, -50, -150)
    assert got == want


NA_CASES = [
    (5, 7, 1, -200, -250),
    (8, 8, 2, -200, -250),
    (12, 3, 1, -100, -150),
    (1, 1, 1, -200, -250),
    (6, 6, 2, -50, -100),
    (7, 9, 0, -200, -250),        # max_shift 0
]


@pytest.mark.parametrize("n,m,S,gamma,delta", NA_CASES)
def test_pallas_nonaffine_band_matches_oracle(n, m, S, gamma, delta):
    rng = np.random.default_rng(n * 31 + m * 7 + S)
    mu1, mu2 = _rand_pair(rng, n, m)
    H = reference_dp.fill_nonaffine(mu1, mu2, S, gamma, delta)
    band = pallas_dp.fill_nonaffine_device(mu1, mu2, S, gamma, delta)
    got = band.to_numpy()
    assert got.shape == H.shape
    ok = _genuine_mask(n, m, S)
    assert np.where(ok, got == H, True).all(), (
        f"mismatch at {np.argwhere(ok & (got != H))[:5]}"
    )
    assert band.final_score() == reference_dp.nonaffine_score_from_band(
        H, n, m, S
    )
    want = pallas_dp.nonaffine_score(mu1, mu2, S, gamma, delta)
    assert want == band.final_score()


@pytest.mark.parametrize("n,m,S,gamma,delta", NA_CASES[:3])
def test_pallas_nonaffine_device_traceback(n, m, S, gamma, delta):
    rng = np.random.default_rng(n + m + S + 1)
    mu1, mu2 = _rand_pair(rng, n, m)
    H = reference_dp.fill_nonaffine(mu1, mu2, S, gamma, delta)
    want = host_tb.nonaffine_traceback(H, mu1, mu2, S, gamma, delta)
    band = pallas_dp.fill_nonaffine_device(mu1, mu2, S, gamma, delta)
    got = dtb.nonaffine_traceback(band, gamma, delta, mu1, mu2)
    assert [tuple(c) for c in got] == [tuple(c) for c in want]


def test_pallas_engine_nonaffine_golden_rna():
    """README toy RNA, non-affine CLI defaults → SCORE 6300 (BASELINE.md)."""
    from bialign_tpu import BiAligner

    ba = BiAligner(
        "GCGGGGGAUAUCCCCAUCG", "GGGGAUAUCCCCAUCG",
        "...(((.....))).....", ".(((.....)))....."[:16],
        engine="pallas", type="RNA", structure_weight=400,
        gap_opening_cost=0, gap_cost=-200, shift_cost=-250, max_shift=2,
    )
    assert ba.optimize() == 6300
    lines = list(ba.decode_trace())
    assert lines[0].split()[-1] == "GCGGGGGAUAUCCCCAUCG"
    assert lines[1].split()[-1] == "--GGGGAUAUCCCC-AUCG"


def test_bucketed_compile_key_shared_across_lengths():
    """Pairs whose diagonal counts fall in the same bucket produce
    identically-shaped kernel inputs (one Mosaic compile per bucket) and
    still score bit-exactly vs the oracle."""
    from bialign_tpu.ops import pallas_dp, reference_dp

    rng = np.random.default_rng(7)
    shapes = []
    for (n, m) in [(9, 8), (11, 10), (12, 9)]:   # all bucket to the same D_pad
        mu1 = rng.integers(-300, 400, (n + 1, m + 1)).astype(np.int64)
        mu2 = rng.integers(0, 500, (n + 1, m + 1)).astype(np.int64)
        p1, p2, d_last, D_pad, nn, mm = pallas_dp._prep_single(
            mu1, mu2, 1, True, True, True
        )
        shapes.append((p1.shape, p2.shape, D_pad))
        got = pallas_dp.affine_score(mu1, mu2, 1, -150, -50, -120,
                                     interpret=True)
        H = reference_dp.fill_affine(mu1, mu2, 1, -150, -50, -120)
        want = reference_dp.affine_score_from_band(H, nn, mm, 1)
        assert got == want, (n, m)
    assert len(set(shapes)) == 1, shapes


def test_prewarm_compiles_buckets():
    """prewarm() touches every requested bucket/mode once (interpret)."""
    from bialign_tpu.utils.warmup import prewarm

    timings = prewarm(
        [(10, 9), (12, 11)],   # same bucket -> deduplicated
        params=dict(gap_opening_cost=-150, gap_cost=-50, shift_cost=-120),
        max_shift=1, interpret=True,
    )
    descs = [d for d, _ in timings]
    assert len(descs) == 2          # score + band for the shared bucket
    assert any("score" in d for d in descs)
    assert any("band" in d for d in descs)


@pytest.mark.parametrize("S", [3, 4])
def test_wide_shift_band_parity(S):
    """max_shift beyond the CLI default (the reference accepts any
    value): band, score and device traceback vs the oracle."""
    rng = np.random.default_rng(40 + S)
    mu1, mu2 = _rand_pair(rng, 8, 10)
    H = reference_dp.fill_affine(mu1, mu2, S, -150, -50, -150)
    want = reference_dp.affine_score_from_band(H, 8, 10, S)
    band = pallas_dp.fill_affine_device(mu1, mu2, S, -150, -50, -150)
    assert band.final_score() == want
    got, _ = dtb.affine_traceback(band, -150, -50, -150, mu1, mu2)
    wtr, _ = host_tb.affine_traceback(H, mu1, mu2, S, -150, -50, -150)
    assert [tuple(c) for c in got] == [tuple(c) for c in wtr]


@pytest.mark.parametrize("n,m", [(7, 9), (1, 1), (0, 3), (5, 0), (20, 13)])
def test_pallas_ms0_specialized_score(n, m):
    """max_shift 0 score-only fast path (3 live states, no shift axes)
    == oracle, incl. degenerate lengths — VERDICT r3 item 6."""
    rng = np.random.default_rng(n * 13 + m)
    mu1, mu2 = _rand_pair(rng, n, m)
    for beta, gamma, delta in [(-150, -50, -150), (-200, -50, -210)]:
        H = reference_dp.fill_affine(mu1, mu2, 0, beta, gamma, delta)
        want = reference_dp.affine_score_from_band(H, n, m, 0)
        got = pallas_dp.affine_score(mu1, mu2, 0, beta, gamma, delta)
        assert got == want, (n, m, beta, gamma, delta)
