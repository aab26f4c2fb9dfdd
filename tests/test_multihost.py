"""2-process jax.distributed smoke: disjoint stream shards, score parity.

The SURVEY (§4(d)) prescribes multi-host tests on the CPU backend; this
launches two real processes that form a jax.distributed cluster, each
scoring its modulo share of the same stream into its own spool.  The
merged spools must cover every pair exactly once with scores identical
to a single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_stream(tmp_path):
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)
    env.pop("XLA_FLAGS", None)  # workers don't need 8 virtual devices
    spools = [str(tmp_path / f"spool{i}.jsonl") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), spools[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    shards = []
    for sp in spools:
        with open(sp) as fh:
            shards.append({
                r["id"]: r["score"]
                for r in (json.loads(ln) for ln in fh)
            })
    # disjoint coverage of the full stream
    assert not (shards[0].keys() & shards[1].keys())
    from bialign_tpu.parallel.driver import merge_spools

    merged = {pid: rec["score"]
              for pid, rec in merge_spools(spools).items()}
    assert merged == {**shards[0], **shards[1]}
    assert set(merged) == {f"p{i:02d}" for i in range(10)}

    # score parity vs a single-process run of the same stream
    from bialign_tpu.parallel.driver import PairRecord, StreamingAligner

    base = "GCGGGGGAUAUCCCCAUCG"
    records = [
        PairRecord(
            id=f"p{i:02d}",
            seqA=base,
            seqB=base[i % 4:] or base,
            strA="." * len(base),
            strB="." * (len(base[i % 4:] or base)),
        )
        for i in range(10)
    ]
    sa = StreamingAligner(dict(type="RNA"), chunk_pairs=10,
                          bucket_quantum=8)
    want = dict(sa.run(records))
    assert merged == want
