"""Native C++ host engine: bit-exact vs the numpy oracle."""

import numpy as np
import pytest

from bialign_tpu.ops import native_dp, reference_dp

pytestmark = pytest.mark.skipif(
    not native_dp.available(), reason="no C++ toolchain"
)


def _rand_tables(rng, n, m, lo=-500, hi=900):
    mu1 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu2 = np.zeros((n + 1, m + 1), dtype=np.int32)
    mu1[1:, 1:] = rng.integers(lo, hi, size=(n, m))
    mu2[1:, 1:] = rng.integers(lo, hi, size=(n, m))
    return mu1, mu2


CASES = [
    (4, 4, 1, -150, -50, -150),
    (5, 3, 1, -200, -50, -150),
    (6, 6, 2, -100, -200, -250),
    (1, 1, 1, -150, -50, -150),
    (0, 3, 1, -150, -50, -150),
    (7, 5, 3, -150, -50, -150),
]


def _genuine_mask(n, m, S):
    i = np.arange(n + 1)[:, None, None, None]
    j = np.arange(m + 1)[None, :, None, None]
    k = i + np.arange(2 * S + 1)[None, None, :, None] - S
    l = j + np.arange(2 * S + 1)[None, None, None, :] - S
    return (k >= 0) & (k <= n) & (l >= 0) & (l <= m)


@pytest.mark.parametrize("n,m,S,beta,gamma,delta", CASES)
def test_native_affine(n, m, S, beta, gamma, delta):
    rng = np.random.default_rng(n * 11 + m * 7 + S)
    mu1, mu2 = _rand_tables(rng, n, m)
    want = reference_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
    got = native_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
    ok = _genuine_mask(n, m, S)[None]
    assert np.where(ok, got == want, True).all()


@pytest.mark.parametrize("n,m,S,beta,gamma,delta", CASES)
def test_native_nonaffine(n, m, S, beta, gamma, delta):
    rng = np.random.default_rng(n * 13 + m * 3 + S)
    mu1, mu2 = _rand_tables(rng, n, m)
    want = reference_dp.fill_nonaffine(mu1, mu2, S, -200, -250)
    got = native_dp.fill_nonaffine(mu1, mu2, S, -200, -250)
    ok = _genuine_mask(n, m, S)
    assert np.where(ok, got == want, True).all()


def test_native_end_to_end_golden():
    """Toy protein README example through the native engine."""
    from bialign_tpu import BiAligner
    from tests.golden import (
        TOY_PROTEIN,
        TOY_PROTEIN_PARAMS,
        TOY_PROTEIN_SCORE,
        TOY_PROTEIN_SORTED_OUT,
    )

    ba = BiAligner(
        TOY_PROTEIN["seqA"], TOY_PROTEIN["seqB"],
        TOY_PROTEIN["strA"], TOY_PROTEIN["strB"],
        engine="native", **TOY_PROTEIN_PARAMS,
    )
    assert ba.optimize() == TOY_PROTEIN_SCORE
    assert list(ba.decode_trace()) == TOY_PROTEIN_SORTED_OUT
