"""Streaming driver: scores, checkpoint/resume, stream sharding, stats."""

import json

import numpy as np

from bialign_tpu.parallel.driver import (
    PairRecord,
    ResultSpool,
    StreamingAligner,
)


PARAMS = dict(
    type="Protein", structure_weight=800, simmatrix="BLOSUM62",
    gap_opening_cost=-150, gap_cost=-50, shift_cost=-150, max_shift=1,
)


def _records(k=6):
    base = "RAKLPLKEKKLTATANYHPGIRYIMTG"
    out = []
    for i in range(k):
        a = base[: 10 + i]
        b = base[1: 11 + i]
        out.append(PairRecord(
            id=f"p{i}", seqA=a, seqB=b,
            strA="H" * len(a), strB="H" * len(b),
        ))
    return out


def _expected_scores(records):
    from bialign_tpu import BiAligner

    out = {}
    for r in records:
        ba = BiAligner(r.seqA, r.seqB, r.strA, r.strB, engine="numpy",
                       **PARAMS)
        out[r.id] = ba.optimize()
    return out


def test_streaming_scores_match_aligner(tmp_path):
    recs = _records()
    want = _expected_scores(recs)
    drv = StreamingAligner(PARAMS, chunk_pairs=4, bucket_quantum=8)
    got = dict(drv.run(recs))
    assert got == want
    assert drv.stats.pairs == len(recs)
    assert drv.stats.cells > 0
    stats = json.loads(drv.stats.to_json())
    assert stats["pairs"] == len(recs)


def test_resume_skips_spooled(tmp_path):
    recs = _records()
    spool = tmp_path / "results.jsonl"

    drv = StreamingAligner(PARAMS, spool_path=str(spool), chunk_pairs=3,
                           bucket_quantum=8)
    first = dict(drv.run(recs[:3]))
    assert len(first) == 3

    # restart: already-done ids are skipped, the rest are scored
    drv2 = StreamingAligner(PARAMS, spool_path=str(spool), chunk_pairs=3,
                            bucket_quantum=8)
    second = dict(drv2.run(recs))
    assert set(second) == {r.id for r in recs[3:]}

    # the spool now holds every pair exactly once
    lines = [json.loads(x) for x in spool.read_text().splitlines()]
    assert sorted(x["id"] for x in lines) == sorted(r.id for r in recs)
    want = _expected_scores(recs)
    assert all(x["score"] == want[x["id"]] for x in lines)


def test_stream_sharding_partitions():
    recs = _records(7)
    want = _expected_scores(recs)
    got = {}
    for p in range(3):
        drv = StreamingAligner(PARAMS, chunk_pairs=4, bucket_quantum=8,
                               process_index=p, process_count=3)
        part = dict(drv.run(recs))
        assert not (set(part) & set(got)), "overlapping shards"
        got.update(part)
    assert got == want


def test_spool_ignores_torn_tail(tmp_path):
    spool = tmp_path / "r.jsonl"
    spool.write_text('{"id": "a", "score": 1}\n{"id": "b", "sco')
    rs = ResultSpool(str(spool))
    assert rs.is_done("a")
    assert not rs.is_done("b")
    rs.write("b", 2)
    rs.close()
    lines = [json.loads(x) for x in spool.read_text().splitlines()
             if x.startswith('{"id"') and x.endswith("}")]
    assert {x["id"] for x in lines} >= {"a", "b"}


def test_merge_spools_conflict_raises(tmp_path):
    import pytest

    from bialign_tpu.parallel.driver import merge_spools

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps({"id": "x", "score": 1}) + "\n")
    b.write_text(json.dumps({"id": "x", "score": 2}) + "\n")
    with pytest.raises(ValueError, match="conflicting"):
        merge_spools([str(a), str(b)])
    # identical duplicates are tolerated (idempotent re-runs)
    b.write_text(json.dumps({"id": "x", "score": 1}) + "\n"
                 + json.dumps({"id": "y", "score": 3}) + "\n"
                 + '{"torn')
    merged = merge_spools([str(a), str(b)])
    assert merged == {"x": {"id": "x", "score": 1},
                      "y": {"id": "y", "score": 3}}


def test_merge_spools_midfile_corruption_raises(tmp_path):
    import pytest

    from bialign_tpu.parallel.driver import merge_spools

    shard = tmp_path / "c.jsonl"
    shard.write_text(json.dumps({"id": "a", "score": 1}) + "\n"
                     + '{"corrupt mid-file\n'
                     + json.dumps({"id": "b", "score": 2}) + "\n")
    # a corrupt line with complete records AFTER it must raise, not
    # silently discard record "b" (ADVICE r3)
    with pytest.raises(ValueError, match="corrupt"):
        merge_spools([str(shard)])


def test_streaming_aligner_alignments_mode(tmp_path):
    """alignments=True yields (id, score, trace) with spooled trace
    codes that decode back to the per-pair BiAligner trace."""
    from bialign_tpu import BiAligner
    from bialign_tpu.parallel.driver import (
        PairRecord, StreamingAligner, trace_from_codes,
    )

    params = dict(type="Protein", structure_weight=800,
                  simmatrix="BLOSUM62", gap_opening_cost=-150,
                  gap_cost=-50, shift_cost=-150, max_shift=1)
    seqA = "RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYARFR"
    seqB = "KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAYFR"
    strA = "CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEECCC"
    strB = "HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEECC"
    recs = [PairRecord(id=f"p{i}", seqA=seqA, seqB=seqB, strA=strA,
                       strB=strB) for i in range(3)]
    spool = tmp_path / "aln.jsonl"
    sa = StreamingAligner(params, spool_path=str(spool), alignments=True)
    results = list(sa.run(recs))
    assert len(results) == 3
    ba = BiAligner(seqA, seqB, strA, strB, engine="xla", **params)
    assert ba.optimize() == 48500
    want_trace = [tuple(c) for c in ba.traceback()]
    for pid, score, trace in results:
        assert score == 48500
        assert [tuple(c) for c in trace] == want_trace
    # spooled codes decode to the same trace
    recs_spooled = [json.loads(ln) for ln in
                    spool.read_text().splitlines()]
    assert all(r["complete"] for r in recs_spooled)
    assert ([tuple(c) for c in trace_from_codes(recs_spooled[0]["trace"])]
            == want_trace)


def test_merge_spools_terminated_corrupt_final_line_raises(tmp_path):
    """A newline-TERMINATED corrupt final line is corruption (not a
    mid-write tear) and must raise (review r4)."""
    import pytest

    from bialign_tpu.parallel.driver import merge_spools

    shard = tmp_path / "d.jsonl"
    shard.write_text(json.dumps({"id": "a", "score": 1}) + "\n"
                     + '{"id": "b", "sco\n')
    with pytest.raises(ValueError, match="corrupt"):
        merge_spools([str(shard)])
