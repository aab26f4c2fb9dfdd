"""Conveyor-packed batched fill + codes-input serving path.

The conveyor streams a bucket's pairs through ONE slab, phase-offset by
T0 global steps (ops/pallas_dp conveyor section) — these tests pin its
bit-exactness against the reference-order numpy oracle on ragged
buckets, across max_shift 0/1/2 and both recurrences, plus the
codes-input path (device LUT table build) against the tables path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bialign_tpu.ops import pallas_dp, reference_dp
from bialign_tpu.parallel import batch as pbatch
from bialign_tpu.parallel.driver import PairRecord, StreamingAligner

AFF = (-150, -50, -150)
NONAFF = (-200, -250)


def _rand_pair(rng, n, m):
    mu1 = rng.integers(-300, 900, (n + 1, m + 1)).astype(np.int32)
    mu2 = rng.integers(0, 800, (n + 1, m + 1)).astype(np.int32)
    mu1[0, :] = 0
    mu1[:, 0] = 0
    mu2[0, :] = 0
    mu2[:, 0] = 0
    return mu1, mu2


def _oracle(pairs, S, params, affine):
    out = []
    for mu1, mu2 in pairs:
        n, m = mu1.shape[0] - 1, mu1.shape[1] - 1
        if affine:
            H = reference_dp.fill_affine(mu1, mu2, S, *params)
            out.append(reference_dp.affine_score_from_band(H, n, m, S))
        else:
            H = reference_dp.fill_nonaffine(mu1, mu2, S, *params)
            out.append(reference_dp.nonaffine_score_from_band(H, n, m, S))
    return np.asarray(out)


def _conveyor_scores(pairs, S, params, affine):
    N = max(p[0].shape[0] - 1 for p in pairs)
    M = max(p[0].shape[1] - 1 for p in pairs)
    N = ((N + 7) // 8) * 8
    M = ((M + 7) // 8) * 8
    mu1p = pbatch.stack_padded([p[0] for p in pairs], N, M, 0)
    mu2p = pbatch.stack_padded([p[1] for p in pairs], N, M, 0)
    ns = np.asarray([p[0].shape[0] - 1 for p in pairs], np.int32)
    ms = np.asarray([p[0].shape[1] - 1 for p in pairs], np.int32)
    m1, m2 = pallas_dp._lane_pad_rows(jnp.asarray(mu1p),
                                      jnp.asarray(mu2p))
    T0 = pallas_dp._conveyor_T0(M, S)
    return np.asarray(jax.device_get(pallas_dp._pallas_batched_conveyor(
        m1, m2, jnp.asarray(ns), jnp.asarray(ms), T0, S, tuple(params),
        affine,
    )))


@pytest.mark.parametrize("S", [0, 1, 2])
def test_conveyor_affine_matches_oracle(S):
    rng = np.random.default_rng(10 + S)
    pairs = [_rand_pair(rng, rng.integers(6, 20), rng.integers(6, 20))
             for _ in range(5)]
    got = _conveyor_scores(pairs, S, AFF, True)
    assert (got == _oracle(pairs, S, AFF, True)).all()


@pytest.mark.parametrize("S", [1, 2])
def test_conveyor_nonaffine_matches_oracle(S):
    rng = np.random.default_rng(20 + S)
    pairs = [_rand_pair(rng, rng.integers(6, 18), rng.integers(6, 18))
             for _ in range(4)]
    got = _conveyor_scores(pairs, S, NONAFF, False)
    assert (got == _oracle(pairs, S, NONAFF, False)).all()


def test_conveyor_single_pair_and_identical_lengths():
    rng = np.random.default_rng(31)
    pairs = [_rand_pair(rng, 12, 12) for _ in range(3)]
    got = _conveyor_scores(pairs, 1, AFF, True)
    assert (got == _oracle(pairs, 1, AFF, True)).all()
    one = _conveyor_scores(pairs[:1], 1, AFF, True)
    assert one[0] == got[0]


def test_skew_and_shift_primitives():
    """_skew (pad+reshape shear) and _shifted against their index
    definitions — these carry every gather-free table build."""
    rng = np.random.default_rng(2)
    a = rng.integers(-50, 50, (5, 7)).astype(np.int32)
    for D_pad in (7, 9, 16, 30):
        got = np.asarray(pallas_dp._skew(jnp.asarray(a), D_pad))
        assert got.shape == (5, D_pad)
        for i in range(5):
            for d in range(D_pad):
                want = a[i, d - i] if 0 <= d - i < 7 else 0
                assert got[i, d] == want, (i, d)
    for dk in (-2, 0, 1):
        for dl in (-1, 0, 2):
            got = np.asarray(pallas_dp._shifted(jnp.asarray(a), dk, dl))
            for i in range(5):
                for j in range(7):
                    want = (a[i + dk, j + dl]
                            if 0 <= i + dk < 5 and 0 <= j + dl < 7
                            else 0)
                    assert got[i, j] == want, (dk, dl, i, j)


def test_conveyor_capture_collision_regression(monkeypatch):
    """Two equal-n pairs whose m differ by almost the bucket M capture
    into the SAME accumulator slot only T0 - (m0 - m1) steps apart;
    with the TPU chunk size G=16 (forced here — interpret mode
    otherwise uses G=1) the captures must still land in different grid
    steps or pair 0 silently returns pair 1's score.  _conveyor_T0's
    +_CHUNK_CAP term guarantees the separation; this reproduces the
    review-caught failure ((150,64)+(150,3) returned pair 1's score
    for both before the fix)."""
    rng = np.random.default_rng(40)
    monkeypatch.setattr(pallas_dp, "_pick_chunk",
                        lambda *a, **k: 16)
    pairs = [_rand_pair(rng, 150, 64), _rand_pair(rng, 150, 3)]
    got = _conveyor_scores(pairs, 1, AFF, True)
    want = _oracle(pairs, 1, AFF, True)
    assert (got == want).all(), (got, want)


def test_conveyor_safety_cert():
    """Adversarial params must push the routing off the conveyor
    (garbage-drift int32 cert), never produce wrong scores."""
    huge = (-(10 ** 6), -(10 ** 6), -(10 ** 6))
    assert pallas_dp._conveyor_safe_T(huge, True) < 1000
    assert not pallas_dp._use_conveyor(
        True, 64, 4 * pallas_dp.LANES, huge, True,
        pallas_dp._conveyor_T0(512, 1),
    )
    # routing still yields exact scores through the fallback kernel
    rng = np.random.default_rng(7)
    pairs = [_rand_pair(rng, 9, 9) for _ in range(3)]
    got = pbatch.score_batch(pairs, 1, huge, affine=True,
                             bucket_quantum=8, engine="pallas")
    assert (got == _oracle(pairs, 1, huge, True)).all()


def _protein_records(rng, k, lo=6, hi=14):
    alpha = "ARNDCQEGHILKMFPSTWYV"
    ss = "CHET"
    out = []
    for i in range(k):
        la = rng.randint(lo, hi)
        lb = rng.randint(lo, hi)
        out.append(PairRecord(
            id=f"p{i}",
            seqA="".join(rng.choice(alpha) for _ in range(la)),
            seqB="".join(rng.choice(alpha) for _ in range(lb)),
            strA="".join(rng.choice(ss) for _ in range(la)),
            strB="".join(rng.choice(ss) for _ in range(lb)),
        ))
    return out


PARAMS = dict(type="Protein", structure_weight=800, simmatrix="BLOSUM62",
              gap_opening_cost=-150, gap_cost=-50, shift_cost=-150,
              max_shift=1)


def test_codes_path_matches_bialigner():
    """The streaming driver's codes path (device LUT table build) is
    bit-exact vs the per-pair BiAligner, scores AND traces."""
    import random

    from bialign_tpu import BiAligner

    recs = _protein_records(random.Random(3), 8)
    sa = StreamingAligner(PARAMS, chunk_pairs=4, bucket_quantum=8,
                          alignments=True, codes=True)
    assert sa._codes_lut is not None, "codes path should be active"
    got = {i: (s, t) for i, s, t in sa.run(iter(recs))}
    for r in recs:
        ba = BiAligner(r.seqA, r.seqB, r.strA, r.strB, engine="numpy",
                       **PARAMS)
        assert got[r.id][0] == ba.optimize()
        assert got[r.id][1] == ba.traceback()


def test_codes_path_match_mismatch_and_keyerror():
    import random

    from bialign_tpu import BiAligner

    p2 = dict(PARAMS, simmatrix=None)
    recs = _protein_records(random.Random(5), 4)
    sa = StreamingAligner(p2, chunk_pairs=4, bucket_quantum=8,
                          codes=True)
    assert sa._codes_lut is not None
    got = dict(sa.run(iter(recs)))
    for r in recs:
        ba = BiAligner(r.seqA, r.seqB, r.strA, r.strB, engine="numpy",
                       **p2)
        assert got[r.id] == ba.optimize()

    # unknown residue raises KeyError like the reference's dict access
    sa2 = StreamingAligner(PARAMS, chunk_pairs=4, codes=True)
    bad = [PairRecord(id="bad", seqA="AX?", seqB="ARN", strA="CCC",
                      strB="CCC")]
    with pytest.raises(KeyError):
        list(sa2.run(iter(bad)))


def test_codes_path_sharded_mesh():
    """Codes dispatchers under an 8-device data mesh: scores AND traces
    bit-exact vs the per-pair oracle."""
    import random

    from jax.sharding import Mesh

    from bialign_tpu import BiAligner

    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    recs = _protein_records(random.Random(13), 10)
    sa = StreamingAligner(PARAMS, chunk_pairs=5, bucket_quantum=8,
                          mesh=mesh, alignments=True, codes=True)
    assert sa._codes_lut is not None
    got = {i: (s, t) for i, s, t in sa.run(iter(recs))}
    for r in recs:
        ba = BiAligner(r.seqA, r.seqB, r.strA, r.strB, engine="numpy",
                       **PARAMS)
        assert got[r.id][0] == ba.optimize()
        assert got[r.id][1] == ba.traceback()
    sa2 = StreamingAligner(PARAMS, chunk_pairs=5, bucket_quantum=8,
                           mesh=mesh, codes=True)
    got2 = dict(sa2.run(iter(recs)))
    for r in recs:
        assert got2[r.id] == got[r.id][0]


def test_codes_path_rejects_f32_unsafe_lut():
    """LUT values >= 2^24 would break the one-hot f32 contraction's
    exactness — the codes dispatch must refuse them loudly."""
    lut = pbatch.match_mismatch_lut(1 << 24, 0)
    pairs = [pbatch.encode_pair("AR", "AR", "CC", "CC")]
    with pytest.raises(ValueError, match="2\\^24"):
        pbatch.dispatch_score_batch_codes(
            pairs, 1, AFF, affine=True, lut=lut, structure_weight=100)


def test_rna_stream_keeps_host_tables():
    """RNA streams must NOT take the codes path (float64 mu2 parity)."""
    p = dict(type="RNA", structure_weight=400, gap_opening_cost=-200,
             gap_cost=-50, shift_cost=-150, max_shift=1)
    sa = StreamingAligner(p, chunk_pairs=4)
    assert sa._codes_lut is None
