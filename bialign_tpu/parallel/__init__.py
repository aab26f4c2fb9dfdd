"""Scaling subsystems: batched data parallelism, the streaming driver,
and sequence-split (context-parallel) single-pair sharding.

The reference is single-process, single-threaded (SURVEY.md §2.4); this
package is the TPU-native scale-out layer.
"""

from .batch import (
    PreparedBatch,
    align_batch,
    make_buckets,
    make_buckets_dense,
    score_batch,
)
from .driver import (
    PairRecord,
    ResultSpool,
    StreamingAligner,
    init_distributed,
    merge_spools,
    trace_from_codes,
    trace_to_codes,
)
from .seqsplit import fill_seqsplit, score_seqsplit

__all__ = [
    "PairRecord",
    "PreparedBatch",
    "align_batch",
    "ResultSpool",
    "StreamingAligner",
    "fill_seqsplit",
    "init_distributed",
    "make_buckets",
    "make_buckets_dense",
    "merge_spools",
    "score_batch",
    "score_seqsplit",
    "trace_from_codes",
    "trace_to_codes",
]
