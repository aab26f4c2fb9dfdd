"""Kernel prewarming for serving deployments.

The Pallas fill kernels are compiled per (length bucket, max_shift,
params, mode) — see :mod:`bialign_tpu.ops.pallas_dp` (``_bucket_D``).
With the persistent compile cache (:mod:`bialign_tpu.utils.jaxconfig`)
a bucket's first compile (~2-4 s on v5e) happens once per machine; this
module lets a serving process pay all of them at startup instead of on
the first live request.

The reference has no analog (single CLI process, compile-free Cython);
this is part of the TPU-native production story (SURVEY.md §5
tracing/metrics, §7.6 batch driver).

Usage::

    from bialign_tpu.utils.warmup import prewarm
    prewarm([(932, 932)], params=dict(gap_opening_cost=-150,
             gap_cost=-50, shift_cost=-150), max_shift=1)

or from the shell::

    python -m bialign_tpu.utils.warmup --lengths 932x932 512x512 \
        --max-shift 1 --gap_opening_cost -150 --gap_cost -50 \
        --shift_cost -150
"""

from __future__ import annotations

import time

import numpy as np


def prewarm(lengths, *, params, max_shift: int = 2, band: bool = True,
            score_only: bool = True, traceback: bool = False,
            streaming: bool = False, streaming_batch: int = 512,
            interpret=None, log=None):
    """Compile the DP kernels for every length bucket in ``lengths``.

    ``lengths``: iterable of (n, m) pair lengths expected in production;
    pairs mapping to the same bucket are deduplicated.
    ``params``: dict with ``gap_opening_cost``, ``gap_cost``,
    ``shift_cost`` (non-zero gap opening selects the affine kernels,
    like the engine, pyx:203-205).
    ``band``/``score_only`` select which fill modes to compile;
    ``traceback`` additionally compiles the on-device walk, whose
    compile is shared per 64-quantized (n, m) bucket (the walk pads its
    mu tables via ``device_traceback._pad_mu``), like the fills.
    ``streaming`` additionally compiles the StreamingAligner codes-path
    batched kernels (device LUT build + packed/conveyor) for
    ``streaming_batch``-pair chunks — a cold corpus chunk otherwise
    pays several seconds of bucket-geometry compiles on first flush.

    Returns a list of ``(description, seconds)`` compile timings.
    """
    from ..ops import pallas_dp
    from ..utils.jaxconfig import ensure_compile_cache

    ensure_compile_cache()

    beta = int(params.get("gap_opening_cost", 0))
    gamma = int(params.get("gap_cost", -200))
    delta = int(params.get("shift_cost", -250))
    affine = beta != 0

    timings = []
    seen = set()
    for (n, m) in lengths:
        mu1 = np.zeros((n + 1, m + 1), dtype=np.int32)
        mu2 = np.zeros((n + 1, m + 1), dtype=np.int32)
        modes = []
        if score_only:
            modes.append(("score", True))
        if band:
            modes.append(("band", False))
        for label, so in modes:
            if interpret is None:
                interp = not pallas_dp._on_tpu()
            else:
                interp = interpret
            p1, p2, d_last, D_pad, _, _ = pallas_dp._prep_single(
                mu1, mu2, max_shift, so, interp, affine
            )
            key = (p1.shape, D_pad, so, affine)
            if key in seen:
                continue
            seen.add(key)
            t0 = time.perf_counter()
            if affine:
                fn = pallas_dp._affine_pallas_dense
                ptuple = (beta, gamma, delta)
            else:
                fn = pallas_dp._nonaffine_pallas_dense
                ptuple = (gamma, delta)
            import jax

            jax.block_until_ready(
                fn(p1, p2, d_last, D_pad, max_shift, ptuple, so, interp)
            )
            dt = time.perf_counter() - t0
            desc = (f"{'affine' if affine else 'nonaffine'} {label} "
                    f"bucket={p1.shape}xD{D_pad} ms={max_shift}")
            timings.append((desc, dt))
            if log:
                log(f"prewarmed {desc} in {dt:.2f}s")
        if streaming:
            # the StreamingAligner codes path: device LUT table build +
            # packed/conveyor batched kernels, per (bucket, B-quantum)
            import jax

            from ..parallel import batch as pbatch

            la = max(n, 1)
            lb = max(m, 1)
            pairs = [pbatch.encode_pair("A" * la, "A" * lb, "." * la,
                                        "." * lb)] * streaming_batch
            lut = pbatch.match_mismatch_lut(100, 0)
            ptuple = ((beta, gamma, delta) if affine
                      else (gamma, delta))
            # structure_weight is a STATIC jit arg of the codes kernels:
            # compiling with a different value than production would
            # miss the cache and defeat the prewarm entirely
            sw = int(params.get("structure_weight", 400))
            key = ("codes", (la + 63) // 64, (lb + 63) // 64,
                   streaming_batch, affine, sw)
            if key not in seen:
                seen.add(key)
                t0 = time.perf_counter()
                pbatch.dispatch_score_batch_codes(
                    pairs, max_shift, ptuple, affine=affine,
                    lut=jax.device_put(lut), structure_weight=sw,
                ).get()
                dt = time.perf_counter() - t0
                timings.append(
                    (f"codes batch n={n} m={m} B={streaming_batch} "
                     f"ms={max_shift}", dt))
                if log:
                    log(f"prewarmed codes batch n={n} m={m} "
                        f"B={streaming_batch} in {dt:.2f}s")
        if traceback:
            from .. import BiAligner

            t0 = time.perf_counter()
            ba = BiAligner("A" * n, "A" * m, "." * n, "." * m,
                           engine="pallas", type="RNA", max_shift=max_shift,
                           gap_opening_cost=beta, gap_cost=gamma,
                           shift_cost=delta)
            ba.optimize()
            ba.traceback()
            dt = time.perf_counter() - t0
            timings.append((f"traceback n={n} m={m} ms={max_shift}", dt))
            if log:
                log(f"prewarmed traceback n={n} m={m} in {dt:.2f}s")
    return timings


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Precompile bialign-tpu kernels for expected "
        "input-length buckets."
    )
    ap.add_argument("--lengths", nargs="+", required=True,
                    help="pair lengths as NxM (e.g. 932x932)")
    ap.add_argument("--max-shift", type=int, nargs="+", default=[2])
    ap.add_argument("--gap_opening_cost", type=int, default=0)
    ap.add_argument("--gap_cost", type=int, default=-200)
    ap.add_argument("--shift_cost", type=int, default=-250)
    ap.add_argument("--structure_weight", type=int, default=400)
    ap.add_argument("--traceback", action="store_true",
                    help="also compile the on-device traceback walk")
    ap.add_argument("--streaming", action="store_true",
                    help="also compile the StreamingAligner codes-path "
                    "batched kernels")
    ap.add_argument("--streaming-batch", type=int, default=512)
    ns = ap.parse_args(argv)

    lengths = []
    for tok in ns.lengths:
        n, _, m = tok.partition("x")
        lengths.append((int(n), int(m or n)))
    params = dict(gap_opening_cost=ns.gap_opening_cost,
                  gap_cost=ns.gap_cost, shift_cost=ns.shift_cost,
                  structure_weight=ns.structure_weight)
    total = 0.0
    for S in ns.max_shift:
        for desc, dt in prewarm(lengths, params=params, max_shift=S,
                                traceback=ns.traceback,
                                streaming=ns.streaming,
                                streaming_batch=ns.streaming_batch,
                                log=print):
            total += dt
    print(f"prewarm total {total:.2f}s")


if __name__ == "__main__":
    main()
