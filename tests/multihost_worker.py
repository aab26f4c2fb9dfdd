"""Worker process for the 2-process jax.distributed smoke test.

Usage: multihost_worker.py <process_id> <num_processes> <coord_port> <spool>

Each process joins the cluster, then consumes its modulo share of a
deterministic toy-pair stream through StreamingAligner, spooling
(id, score) records.  The parent test merges the spools and asserts
disjoint coverage + score parity (SURVEY.md §4(d), VERDICT r2 item 8).
"""

import os
import sys


def main():
    proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, spool = sys.argv[3], sys.argv[4]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from bialign_tpu.utils.jaxconfig import ensure_compile_cache

    ensure_compile_cache()
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs

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
    sa = StreamingAligner(
        dict(type="RNA"),
        spool_path=spool,
        chunk_pairs=3,
        bucket_quantum=8,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    results = list(sa.run(records))
    print(f"proc {proc_id}: {len(results)} pairs", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
