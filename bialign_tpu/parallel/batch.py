"""Batched, sharded bi-alignment scoring.

The reference is single-pair, single-threaded (SURVEY.md §2.4: no
parallelism of any kind).  This module provides the TPU-native scaling
axis: data parallelism over independent pairs.

Pipeline:
  1. pairs are bucketed by padded length (multiples of ``bucket_quantum``)
     so one compilation serves a whole bucket;
  2. per pair, dense int32 score tables are padded to the bucket shape and
     converted to diagonal layout on host;
  3. a ``vmap`` of the traced-length wavefront scan
     (:func:`bialign_tpu.ops.xla_dp.affine_score_traced`) scores the whole
     batch on device; per-pair true lengths ride along as data, so padding
     never changes scores (validated in tests/test_batch.py);
  4. with a :class:`jax.sharding.Mesh`, the batch axis is sharded over the
     ``"data"`` axis — XLA partitions the scan SPMD, scores are gathered by
     the output sharding (fully replicated gather = one small collective).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import xla_dp


def quantize(x: int, q: int) -> int:
    return ((max(x, 1) + q - 1) // q) * q


def pad_table(mu: np.ndarray, N: int, M: int) -> np.ndarray:
    """Zero-pad a (n+1, m+1) score table to (N+1, M+1).

    Padded entries are only read by cells outside the genuine region
    (i > n or j > m), which never feed genuine cells (the recurrence is
    monotone in (i, j)), so the pad value cannot change any score.
    """
    out = np.zeros((N + 1, M + 1), dtype=np.int32)
    out[: mu.shape[0], : mu.shape[1]] = mu
    return out


@dataclass
class Bucket:
    """One padded shape bucket of pairs awaiting scoring."""

    N: int
    M: int
    indices: list = field(default_factory=list)   # position in user order
    mu1d: list = field(default_factory=list)
    mu2d: list = field(default_factory=list)
    n: list = field(default_factory=list)
    m: list = field(default_factory=list)


def make_buckets(tables, max_shift: int, bucket_quantum: int = 64):
    """Group (mu1, mu2) pairs into padded-shape buckets of XLA-layout
    diagonal tables.

    ``tables``: iterable of (mu1, mu2) int32 arrays (shape (n+1, m+1)).
    Returns a dict keyed by (N, M).
    """
    buckets: dict = {}
    for idx, (mu1, mu2) in enumerate(tables):
        n = mu1.shape[0] - 1
        m = mu1.shape[1] - 1
        N = quantize(n, bucket_quantum)
        M = quantize(m, bucket_quantum)
        b = buckets.setdefault((N, M), Bucket(N, M))
        p1 = pad_table(np.asarray(mu1), N, M)
        p2 = pad_table(np.asarray(mu2), N, M)
        m1d, m2d = xla_dp._diag_mu_tables(p1, p2, max_shift)
        b.indices.append(idx)
        b.mu1d.append(np.asarray(m1d))
        b.mu2d.append(np.asarray(m2d))
        b.n.append(n)
        b.m.append(m)
    return buckets


def make_buckets_dense(tables, bucket_quantum: int = 64):
    """Group pairs into buckets of DENSE raw tables for the Pallas
    batched path (diagonal tables are built on device, so the host only
    pads — no O(D*W^2*P) per-pair numpy work).

    Tables are kept raw here; :func:`stack_padded` pads each bucket's
    stack to the bucket-exact [B, N+1, M+1] in one vectorized write
    (the all-same-shape serving case skips per-pair padding entirely).
    The kernel wrapper lane-pads the row axis ON DEVICE, so the
    host->device transfer carries no lane padding (4x smaller for
    toy-sized pairs through a constrained link).
    """
    buckets: dict = {}
    for idx, (mu1, mu2) in enumerate(tables):
        n = mu1.shape[0] - 1
        m = mu1.shape[1] - 1
        N = quantize(n, bucket_quantum)
        M = quantize(m, bucket_quantum)
        b = buckets.setdefault((N, M), Bucket(N, M))
        b.mu1d.append(np.asarray(mu1))
        b.mu2d.append(np.asarray(mu2))
        b.indices.append(idx)
        b.n.append(n)
        b.m.append(m)
    return buckets


def stack_padded(raws, N: int, M: int, pad_count: int = 0) -> np.ndarray:
    """Stack raw (n+1, m+1) tables into one [B, N+1, M+1] int32 array
    (+ ``pad_count`` repeats of the last table for batch-axis padding).

    Single-shape fast path: one stack + one block write — the
    steady-state serving case where every pair in a bucket has the same
    length pays no per-pair padding loop.
    """
    raws = list(raws) + [raws[-1]] * pad_count
    shapes = {a.shape for a in raws}
    out = np.zeros((len(raws), N + 1, M + 1), dtype=np.int32)
    if len(shapes) == 1:
        (n1, m1), = shapes
        out[:, :n1, :m1] = np.stack(raws)
        return out
    for i, a in enumerate(raws):
        out[i, : a.shape[0], : a.shape[1]] = a
    return out


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _batched_affine(mu1d, mu2d, n, m, max_shift, params, _bucket_shape):
    fn = functools.partial(
        xla_dp.affine_score_traced, max_shift=max_shift, params=params
    )
    return jax.vmap(fn)(mu1d, mu2d, n, m)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _batched_nonaffine(mu1d, mu2d, n, m, max_shift, params, _bucket_shape):
    fn = functools.partial(
        xla_dp.nonaffine_score_traced, max_shift=max_shift, params=params
    )
    return jax.vmap(fn)(mu1d, mu2d, n, m)


def _device_put_sharded(arr, mesh):
    if mesh is None:
        return arr
    spec = P("data", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _require_int32_safe(tables, params, affine: bool):
    """Entry-level int32-overflow guard for the batched engines.

    The batched kernels compute in int32 with a -2^30 sentinel;
    :class:`bialign_tpu.BiAligner` certifies this per pair
    (ops/cases.check_int32_safe) and falls back to an int64 XLA scan,
    but the batch paths have no int64 twin — so an unsafe pair must
    fail loudly, not silently wrap.  Checked on the ORIGINAL tables
    before any int32 cast (the bucket-padding cast would wrap first and
    hide the magnitude), per-pair form of ops/cases.int32_value_bound.
    """
    if affine:
        beta, gamma, delta = params
    else:
        beta = 0
        gamma, delta = params
    for idx, (mu1, mu2) in enumerate(tables):
        amax = max(int(np.abs(mu1).max(initial=0)),
                   int(np.abs(mu2).max(initial=0)))
        n = mu1.shape[0] - 1
        m = mu1.shape[1] - 1
        per_col = (2 * abs(int(gamma)) + 2 * abs(int(beta))
                   + 2 * abs(int(delta)) + 2 * amax)
        bound = 2 * (n + m + 2) * per_col
        if not ((-(1 << 30)) - bound > np.iinfo(np.int32).min
                + (1 << 20)):
            raise ValueError(
                "scoring parameters/tables exceed the certified int32 "
                f"range for pair {idx} (value drift bound {bound}); the "
                "batched engines have no int64 path — score these pairs "
                "individually via BiAligner (engine='xla'), which falls "
                "back to the overflow-safe int64 scan"
            )


def _on_tpu() -> bool:
    """engine="auto" policy: the Pallas batched path runs on a TPU
    (single-device or mesh), the vmapped XLA scan elsewhere.  Delegates
    to the single platform probe (lazily — importing pallas costs)."""
    from ..ops.pallas_dp import _on_tpu as probe

    return probe()


@functools.lru_cache(maxsize=None)
def _sharded_scores_fn(D, max_shift, params, mesh, affine):
    """Cached jitted shard_map of the batched score kernel — built once
    per (bucket geometry, params, mesh), not per chunk (re-tracing the
    wrapper per call was pure dispatch-latency waste)."""
    from ..ops import pallas_dp

    kern = (pallas_dp._affine_pallas_batched_dense if affine
            else pallas_dp._nonaffine_pallas_batched_dense)

    def shard_fn(m1, m2, nn, mm):
        return kern(m1, m2, nn, mm, D, max_shift, params)

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        # pallas_call's output avals carry no varying-mesh-axes typing
        check_vma=False,
    ))


def _pallas_scores_sharded(mu1p, mu2p, ns, ms, D, max_shift, params, mesh,
                           affine):
    """shard_map of the batched Pallas kernel over the "data" mesh axis.

    Each device builds the diagonal tables for its local slice of the
    bucket's batch axis and runs the kernel on it; the output sharding
    reassembles the scores (one tiny gather).  The caller pads the batch
    to a multiple of the axis size.
    """
    fn = _sharded_scores_fn(D, max_shift, tuple(params), mesh, affine)
    args = [
        _device_put_sharded(jnp.asarray(x), mesh)
        for x in (mu1p, mu2p, ns, ms)
    ]
    return np.asarray(jax.device_get(fn(*args)))


class PendingScores:
    """Dispatched-but-unharvested batched scores.

    JAX dispatch is asynchronous: the kernels are already running (or
    queued) on the device when this object is returned, so the caller
    can overlap host work — preprocessing and packing the NEXT chunk —
    with device compute.  :meth:`get` blocks on the transfers and
    assembles the scores in input order (the streaming driver's
    double-buffering rides on this).
    """

    def __init__(self, n_pairs: int, parts):
        self._n = n_pairs
        self._parts = parts          # [(indices, device_scores)]

    @property
    def n_dispatches(self) -> int:
        """Kernel dispatches issued (one per length bucket)."""
        return len(self._parts)

    def get(self) -> np.ndarray:
        out = np.zeros(self._n, dtype=np.int64)
        # ONE device_get over all buckets: each get is a host-link
        # round trip (~tens of ms on a tunnel-attached device), so
        # per-bucket gets serialized the latency
        fetched = jax.device_get([dev for _, dev in self._parts])
        for (indices, _), scores in zip(self._parts, fetched):
            scores = np.asarray(scores)
            for pos, idx in enumerate(indices):
                out[idx] = scores[pos]
        return out


def dispatch_score_batch(tables, max_shift: int, params, *, affine: bool,
                         mesh: Mesh | None = None,
                         bucket_quantum: int = 64,
                         engine: str = "auto") -> PendingScores:
    """Pack and LAUNCH every bucket's score kernel without blocking.

    Same arguments/semantics as :func:`score_batch`; returns a
    :class:`PendingScores` instead of the assembled array.
    """
    tables = list(tables)
    _require_int32_safe(tables, params, affine)
    use_pallas = (
        engine == "pallas"
        or (engine == "auto" and _on_tpu())
    )
    parts = []
    if use_pallas:
        from ..ops import pallas_dp

        buckets = make_buckets_dense(tables, bucket_quantum)
        for (N, M), b in buckets.items():
            B = len(b.indices)
            # round the batch up to a PACK (x mesh-size) multiple so
            # small buckets — and every per-device SHARD of them — stay
            # eligible for the sublane-packed kernel (falling to the
            # SUB=1 kernel wastes 7/8 of every vreg) and compile keys
            # quantize
            q = pallas_dp.PACK
            if mesh is not None:
                q *= mesh.shape["data"]
            Bp = ((B + q - 1) // q) * q
            pad = Bp - B
            D = N + M + 1
            # narrow the STACKED arrays (not per table) so a bucket always
            # ships one dtype — per-table narrowing made the jit compile
            # key data-dependent (one outlier pair doubled compiles)
            mu1p = pallas_dp._narrow_if_fits(stack_padded(b.mu1d, N, M,
                                                          pad))
            mu2p = pallas_dp._narrow_if_fits(stack_padded(b.mu2d, N, M,
                                                          pad))
            ns = np.asarray(b.n + [b.n[-1]] * pad, dtype=np.int32)
            ms = np.asarray(b.m + [b.m[-1]] * pad, dtype=np.int32)
            if mesh is not None:
                fn = _sharded_scores_fn(D, max_shift, tuple(params), mesh,
                                        affine)
                args = [
                    _device_put_sharded(jnp.asarray(x), mesh)
                    for x in (mu1p, mu2p, ns, ms)
                ]
                dev = fn(*args)
            else:
                kern = (pallas_dp._affine_pallas_batched_dense if affine
                        else pallas_dp._nonaffine_pallas_batched_dense)
                dev = kern(
                    jnp.asarray(mu1p), jnp.asarray(mu2p),
                    jnp.asarray(ns), jnp.asarray(ms),
                    D, max_shift, tuple(params),
                )
            parts.append((b.indices, dev))
        return PendingScores(len(tables), parts)

    buckets = make_buckets(tables, max_shift, bucket_quantum)
    for (N, M), b in buckets.items():
        B = len(b.indices)
        Bp = B
        if mesh is not None:
            ds = mesh.shape["data"]
            Bp = ((B + ds - 1) // ds) * ds
        pad = Bp - B

        mu1d = np.stack(b.mu1d + [b.mu1d[-1]] * pad)
        mu2d = np.stack(b.mu2d + [b.mu2d[-1]] * pad)
        n = np.asarray(b.n + [b.n[-1]] * pad, dtype=np.int32)
        m = np.asarray(b.m + [b.m[-1]] * pad, dtype=np.int32)

        args = [
            _device_put_sharded(jnp.asarray(x), mesh)
            for x in (mu1d, mu2d, n, m)
        ]
        fn = _batched_affine if affine else _batched_nonaffine
        parts.append((b.indices, fn(*args, max_shift, tuple(params),
                                    (N, M))))
    return PendingScores(len(tables), parts)


def score_batch(tables, max_shift: int, params, *, affine: bool,
                mesh: Mesh | None = None, bucket_quantum: int | None = None,
                engine: str = "auto"):
    """Score a batch of pairs; returns int scores in input order.

    ``params``: (beta, gamma, delta) for affine, (gamma, delta) otherwise.
    With ``mesh``, every bucket's batch axis is sharded over mesh axis
    "data" (pad the batch to a multiple of the axis size).

    ``engine``: "auto" (Pallas batched kernel on TPU, vmapped XLA scan
    otherwise), "pallas", or "xla".

    ``tables`` may also be a :class:`PreparedBatch` (device-resident
    buckets built once): scoring then skips the bucket rebuild and the
    host->device transfer entirely (steady-state serving path).
    """
    if isinstance(tables, PreparedBatch):
        tables.check_compatible(max_shift, params, affine, mesh,
                                engine=engine,
                                bucket_quantum=bucket_quantum)
        return tables.scores()

    if bucket_quantum is None:
        bucket_quantum = 64
    return dispatch_score_batch(
        tables, max_shift, params, affine=affine, mesh=mesh,
        bucket_quantum=bucket_quantum, engine=engine,
    ).get()


# -- batched alignments (corpus-scale traceback) ------------------------------
#
# The reference produces a FULL alignment per invocation
# (/root/reference/src/bialignment.pyx:513-586); at corpus scale the repo
# previously only batched scores.  This path batches the traceback too:
# one fused dispatch per bucket-chunk runs the band-emitting batched
# Pallas fill AND the vmapped on-device walk, so the host receives only
# per-pair trace codes (O(n+m) ints each) — not bands.

def _fill_walk_affine_planes(mu1p, mu2p, ns, ms, D, max_shift, params):
    """Traced body shared by the tables- and codes-input wrappers:
    band-emitting batched fill + vmapped device walk."""
    from ..ops import device_traceback as dtb
    from ..ops import pallas_dp

    ys = pallas_dp._affine_pallas_batched_dense(
        mu1p, mu2p, ns, ms, D, max_shift, params, False
    )
    beta, gamma, delta = params
    const = jnp.asarray(dtb._affine_const(beta, gamma, delta))
    m1 = mu1p.astype(jnp.int32)
    m2 = mu2p.astype(jnp.int32)
    # the batched band arrives in the folded HBM layout
    return dtb._affine_walk_batch(ys, m1, m2, const, max_shift, "folded",
                                  ns, ms)


def _fill_walk_nonaffine_planes(mu1p, mu2p, ns, ms, D, max_shift, params):
    from ..ops import device_traceback as dtb
    from ..ops import pallas_dp
    from ..ops.cases import NonAffineTables

    ysb = pallas_dp._nonaffine_pallas_batched_dense(
        mu1p, mu2p, ns, ms, D, max_shift, params, False
    )
    gamma, delta = params
    tabs = NonAffineTables(gamma, delta)
    const = jnp.asarray(tabs.const)
    m1 = mu1p.astype(jnp.int32)
    m2 = mu2p.astype(jnp.int32)
    codes, steps = dtb._nonaffine_walk_batch(ysb, m1, m2, const,
                                             max_shift, "folded", ns, ms)
    # non-affine score: final-diagonal center cell (d = n+m, i = n),
    # read through the folded layout [B, D, W*W*SUB, LANES]
    B = mu1p.shape[0]
    S = max_shift
    W = 2 * S + 1
    SUBw = ysb.shape[2] // (W * W)
    L = dtb._LANES
    f = (S * W + S) * SUBw + ns // L
    scores = ysb[jnp.arange(B), ns + ms, f, ns % L]
    return codes, steps, scores


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _fill_walk_affine(mu1p, mu2p, ns, ms, D, max_shift, params, _shape):
    return _fill_walk_affine_planes(mu1p, mu2p, ns, ms, D, max_shift,
                                    params)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _fill_walk_nonaffine(mu1p, mu2p, ns, ms, D, max_shift, params, _shape):
    return _fill_walk_nonaffine_planes(mu1p, mu2p, ns, ms, D, max_shift,
                                       params)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _fill_walk_codes(lut, ca, cb, sa, sb, ns, ms, D, max_shift, params,
                     sw, affine):
    """Codes-input fused fill+walk: device LUT table build, then the
    shared planes body (the walk re-evaluates cases against the same
    on-device mu planes)."""
    from ..ops import pallas_dp

    mu1p, mu2p = pallas_dp._mu_planes_from_codes(lut, ca, cb, sa, sb,
                                                 ns, ms, sw)
    body = (_fill_walk_affine_planes if affine
            else _fill_walk_nonaffine_planes)
    return body(mu1p, mu2p, ns, ms, D, max_shift, params)


@functools.lru_cache(maxsize=None)
def _sharded_align_fn(D, max_shift, params, mesh, affine):
    """Cached jitted shard_map of the fused fill+walk over the "data"
    mesh axis: each device fills and walks its local slice of the
    chunk's batch axis (per-pair DP and traceback are chip-local; only
    the tiny code/score gather crosses chips via the output sharding).
    Cached per geometry — see :func:`_sharded_scores_fn` for why it
    must not rebuild per chunk."""
    inner = _fill_walk_affine if affine else _fill_walk_nonaffine

    def shard_fn(m1, m2, nn, mm):
        return inner(m1, m2, nn, mm, D, max_shift, params, None)

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    ))


class PendingAlignments:
    """Dispatched-but-unharvested fused fill+walk chunks (the alignments
    twin of :class:`PendingScores`); :meth:`get` blocks, decodes the
    walk codes on host and assembles (scores, traces, complete)."""

    def __init__(self, n_pairs: int, parts):
        self._n = n_pairs
        self._parts = parts          # [(indices, affine, device_tuple)]

    @property
    def n_dispatches(self) -> int:
        """Fused fill+walk dispatches issued (one per bucket-chunk)."""
        return len(self._parts)

    def get(self):
        from ..ops.device_traceback import decode_walk_codes

        scores = np.zeros(self._n, dtype=np.int64)
        traces: list = [None] * self._n
        complete = [True] * self._n
        # one round trip for all chunks (see PendingScores.get)
        fetched = jax.device_get([dev for _, _, dev in self._parts])
        for (idxs, affine, _), got in zip(self._parts, fetched):
            if affine:
                codes, steps, done, scs = got
            else:
                codes, steps, scs = got
                done = None
            for pos, idx in enumerate(idxs):
                traces[idx] = decode_walk_codes(codes[pos],
                                                int(steps[pos]))
                scores[idx] = int(scs[pos])
                if done is not None:
                    complete[idx] = int(done[pos]) == 1
        return scores, traces, complete


def _auto_chunk(N: int, M: int, max_shift: int, affine: bool,
                budget: int = 2 << 30) -> int:
    """Pairs per fused fill+walk dispatch, sized so one chunk's HBM
    band stays under ``budget`` bytes: every dispatch is a host-link
    round trip (~tens of ms on tunnel-attached devices), so chunks
    should be as large as the band memory allows."""
    from ..ops.cases import N_STATES
    from ..ops.pallas_dp import LANES, _round_up

    W2 = (2 * max_shift + 1) ** 2
    Ppad = _round_up(N + 1, LANES)
    D_pad = _round_up(N + M + 1, 16)
    q = N_STATES if affine else 1
    per_pair = D_pad * q * W2 * Ppad * 4
    return max(8, min(1024, budget // max(per_pair, 1)))


def dispatch_align_batch(tables, max_shift: int, params, *, affine: bool,
                         mesh: Mesh | None = None, bucket_quantum: int = 64,
                         chunk: int | None = None) -> PendingAlignments:
    """Pack and LAUNCH every bucket-chunk's fused fill+walk without
    blocking (same arguments as :func:`align_batch`); chunks queue on
    the device in dispatch order, so peak band memory stays one chunk's
    worth while the caller overlaps host packing of the next batch.
    ``chunk=None`` sizes chunks per bucket from the band-memory budget
    (:func:`_auto_chunk`)."""
    from ..ops.pallas_dp import _narrow_if_fits

    tables = list(tables)
    _require_int32_safe(tables, params, affine)
    buckets = make_buckets_dense(tables, bucket_quantum)
    parts = []
    for (N, M), b in buckets.items():
        D = N + M + 1
        bchunk = (_auto_chunk(N, M, max_shift, affine)
                  if chunk is None else chunk)
        for lo in range(0, len(b.indices), bchunk):
            idxs = b.indices[lo:lo + bchunk]
            B = len(idxs)
            Bp = B
            if mesh is not None:
                ds = mesh.shape["data"]
                Bp = ((B + ds - 1) // ds) * ds
            pad = Bp - B
            sl = slice(lo, lo + bchunk)
            mu1p = _narrow_if_fits(stack_padded(b.mu1d[sl], N, M, pad))
            mu2p = _narrow_if_fits(stack_padded(b.mu2d[sl], N, M, pad))
            ns = np.asarray(b.n[sl] + [b.n[sl][-1]] * pad,
                            dtype=np.int32)
            ms = np.asarray(b.m[sl] + [b.m[sl][-1]] * pad,
                            dtype=np.int32)
            if mesh is not None:
                fn = _sharded_align_fn(D, max_shift, tuple(params), mesh,
                                       affine)
                args = [
                    _device_put_sharded(jnp.asarray(x), mesh)
                    for x in (mu1p, mu2p, ns, ms)
                ]
                dev = fn(*args)
            else:
                args = (jnp.asarray(mu1p), jnp.asarray(mu2p),
                        jnp.asarray(ns), jnp.asarray(ms),
                        D, max_shift, tuple(params), (N, M))
                dev = (_fill_walk_affine(*args) if affine
                       else _fill_walk_nonaffine(*args))
            parts.append((idxs, affine, dev))
    return PendingAlignments(len(tables), parts)


def align_batch(tables, max_shift: int, params, *, affine: bool,
                mesh: Mesh | None = None, bucket_quantum: int = 64,
                chunk: int | None = None):
    """Traces + scores for a batch of pairs, in input order.

    Returns ``(scores, traces, complete)``: int64 scores, per-pair
    forward trace lists (same (a, b, c, d) tuples as
    :meth:`bialign_tpu.BiAligner.traceback`, bit-exact including the
    reference's co-optimal tie-breaking — tests/test_batch.py), and
    per-pair completeness flags (False = the reference's
    incomplete-traceback warning case; non-affine walks always
    complete).

    ``chunk`` caps pairs per fused dispatch: the band for a chunk is
    materialized in HBM (B * D * 9 * W^2 * Ppad int32), so chunking
    bounds peak memory while the walk+fill still amortize dispatches.

    With ``mesh``, each chunk's batch axis is sharded over mesh axis
    "data" (chunk is padded to a multiple of the axis size): fills and
    walks run chip-local, scaling the BASELINE.md pair-alignments/s
    north star to N chips/hosts.
    """
    return dispatch_align_batch(
        tables, max_shift, params, affine=affine, mesh=mesh,
        bucket_quantum=bucket_quantum, chunk=chunk,
    ).get()


# -- codes-input serving path (device-side table build) -----------------------
#
# The tables-input paths ship O(n*m) ints per pair to the device; the
# raw inputs are O(n) bytes.  On a bandwidth-constrained host link the
# transfer dominates (measured 47 MB/s through the axon tunnel: 721 ms
# of a ~970 ms 64-pair realistic batch), so the streaming driver ships
# per-pair CODE vectors + one device-resident 256x256 LUT and the mu
# tables are built on device (ops/pallas_dp._mu_planes_from_codes).
# Protein scoring only — RNA mu2 keeps host float64 (tables.py).

def encode_pair(seqA: str, seqB: str, strA: str, strB: str):
    """1-based uint8 code vectors (index 0 unused = 0) for the
    device-LUT scoring path."""
    def enc(s):
        a = np.zeros(len(s) + 1, dtype=np.uint8)
        a[1:] = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
        return a

    return enc(seqA), enc(seqB), enc(strA), enc(strB)


def match_mismatch_lut(match: int, mismatch: int) -> np.ndarray:
    """256x256 LUT equivalent of the match/mismatch mu1 (tables.py
    sequence_similarity_table without a simmatrix)."""
    lut = np.full((256, 256), int(mismatch), dtype=np.int32)
    np.fill_diagonal(lut, int(match))
    return lut


def _require_int32_safe_codes(lut, sw, buckets, params, affine):
    """Codes-path twin of :func:`_require_int32_safe`: the mu magnitude
    bound comes from the LUT and structure weight instead of per-pair
    tables.  Additionally requires |LUT| < 2^24: the device LUT
    application is an exact one-hot f32 contraction ONLY while every
    entry is f32-representable (the int32 drift cert alone would admit
    larger values for very short pairs)."""
    amax = max(int(np.abs(np.asarray(lut)).max()), abs(int(sw)))
    if int(np.abs(np.asarray(lut)).max()) >= (1 << 24):
        raise ValueError(
            "similarity-matrix values must stay below 2^24 for the "
            "codes path's exact f32 LUT contraction; use the tables "
            "path (score_batch) for larger scores"
        )
    if affine:
        beta, gamma, delta = params
    else:
        beta = 0
        gamma, delta = params
    per_col = (2 * abs(int(gamma)) + 2 * abs(int(beta))
               + 2 * abs(int(delta)) + 2 * amax)
    worst = max(N + M for (N, M) in buckets)
    bound = 2 * (worst + 2) * per_col
    if not ((-(1 << 30)) - bound > np.iinfo(np.int32).min + (1 << 20)):
        raise ValueError(
            "scoring parameters/LUT exceed the certified int32 range "
            f"(value drift bound {bound}); score these pairs "
            "individually via BiAligner (engine='xla')"
        )


def _code_buckets(pairs, bucket_quantum: int, mesh=None):
    """Bucket (ca, cb, sa, sb) code-vector pairs by quantized shape;
    each bucket's ca/sa are padded to the LANE-padded row count so the
    device build skips the lane pad.  With a mesh, the batch axis pads
    to a (mesh size x PACK) multiple so every shard stays
    packed-kernel eligible."""
    from ..ops.pallas_dp import LANES, PACK, _round_up

    buckets: dict = {}
    for idx, (ca, cb, sa, sb) in enumerate(pairs):
        n = len(ca) - 1
        m = len(cb) - 1
        N = quantize(n, bucket_quantum)
        M = quantize(m, bucket_quantum)
        b = buckets.setdefault((N, M), Bucket(N, M))
        b.indices.append(idx)
        b.mu1d.append((ca, sa))      # reuse Bucket fields for codes
        b.mu2d.append((cb, sb))
        b.n.append(n)
        b.m.append(m)

    q = PACK if mesh is None else PACK * mesh.shape["data"]
    packed = {}
    for (N, M), b in buckets.items():
        B = len(b.indices)
        Bp = ((B + q - 1) // q) * q
        Ppad = _round_up(N + 1, LANES)
        ca = np.zeros((Bp, Ppad), dtype=np.uint8)
        sa = np.zeros((Bp, Ppad), dtype=np.uint8)
        cb = np.zeros((Bp, M + 1), dtype=np.uint8)
        sb = np.zeros((Bp, M + 1), dtype=np.uint8)
        for pos in range(Bp):
            a_, s_ = b.mu1d[min(pos, B - 1)]
            c_, t_ = b.mu2d[min(pos, B - 1)]
            ca[pos, : len(a_)] = a_
            sa[pos, : len(s_)] = s_
            cb[pos, : len(c_)] = c_
            sb[pos, : len(t_)] = t_
        ns = np.asarray(b.n + [b.n[-1]] * (Bp - B), dtype=np.int32)
        ms = np.asarray(b.m + [b.m[-1]] * (Bp - B), dtype=np.int32)
        packed[(N, M)] = (b.indices, ca, cb, sa, sb, ns, ms)
    return packed


@functools.lru_cache(maxsize=None)
def _sharded_codes_fn(D, max_shift, params, sw, mesh, affine):
    """Cached jitted shard_map of the codes-input batched score fill
    over the "data" mesh axis (LUT replicated; each device builds its
    shard's mu tables and runs the kernel chip-local)."""
    from ..ops import pallas_dp

    def shard_fn(lut, ca, cb, sa, sb, ns, ms):
        return pallas_dp._pallas_batched_codes(
            lut, ca, cb, sa, sb, ns, ms, D, max_shift, params, sw,
            affine,
        )

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, None), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    ))


def _put_codes(mesh, lut, arrays):
    """Device placement for one codes bucket: shard the batch-axis
    arrays, replicate the LUT (no-ops without a mesh)."""
    if mesh is None:
        return lut, [jnp.asarray(a) for a in arrays]
    lut_r = jax.device_put(jnp.asarray(lut),
                           NamedSharding(mesh, P(None, None)))
    return lut_r, [_device_put_sharded(jnp.asarray(a), mesh)
                   for a in arrays]


def dispatch_score_batch_codes(pairs, max_shift: int, params, *,
                               affine: bool, lut, structure_weight: int,
                               mesh: Mesh | None = None,
                               bucket_quantum: int = 64) -> PendingScores:
    """Launch batched scoring from code vectors (see module section
    doc).  ``pairs``: list of :func:`encode_pair` tuples; ``lut``: a
    [256, 256] int32 device (or host) array — pass the SAME array
    object across chunks so JAX reuses its device copy.  With ``mesh``,
    each bucket's batch axis is sharded over mesh axis "data"."""
    from ..ops import pallas_dp

    pairs = list(pairs)
    packed = _code_buckets(pairs, bucket_quantum, mesh)
    _require_int32_safe_codes(lut, structure_weight, packed, params,
                              affine)
    parts = []
    for (N, M), (indices, ca, cb, sa, sb, ns, ms) in packed.items():
        D = N + M + 1
        lut_d, arrs = _put_codes(mesh, lut, (ca, cb, sa, sb, ns, ms))
        if mesh is not None:
            fn = _sharded_codes_fn(D, max_shift, tuple(params),
                                   int(structure_weight), mesh, affine)
            dev = fn(lut_d, *arrs)
        else:
            dev = pallas_dp._pallas_batched_codes(
                lut_d, *arrs, D, max_shift, tuple(params),
                int(structure_weight), affine,
            )
        parts.append((indices, dev))
    return PendingScores(len(pairs), parts)


@functools.lru_cache(maxsize=None)
def _sharded_align_codes_fn(D, max_shift, params, sw, mesh, affine):
    """Cached jitted shard_map of the codes-input fused fill+walk."""

    def shard_fn(lut, ca, cb, sa, sb, ns, ms):
        return _fill_walk_codes(lut, ca, cb, sa, sb, ns, ms, D,
                                max_shift, params, sw, affine)

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, None), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    ))


def dispatch_align_batch_codes(pairs, max_shift: int, params, *,
                               affine: bool, lut, structure_weight: int,
                               mesh: Mesh | None = None,
                               bucket_quantum: int = 64,
                               chunk: int | None = None
                               ) -> PendingAlignments:
    """Codes-input twin of :func:`dispatch_align_batch`."""
    pairs = list(pairs)
    packed = _code_buckets(pairs, bucket_quantum, mesh)
    _require_int32_safe_codes(lut, structure_weight, packed, params,
                              affine)
    parts = []
    for (N, M), (indices, ca, cb, sa, sb, ns, ms) in packed.items():
        D = N + M + 1
        bchunk = (_auto_chunk(N, M, max_shift, affine)
                  if chunk is None else chunk)
        if mesh is not None:
            ds = mesh.shape["data"]
            bchunk = ((bchunk + ds - 1) // ds) * ds
        for lo in range(0, len(indices), bchunk):
            idxs = indices[lo:lo + bchunk]
            hi = lo + len(idxs)
            if mesh is not None:
                ds = mesh.shape["data"]
                hi = lo + ((len(idxs) + ds - 1) // ds) * ds
                hi = min(hi, ca.shape[0])   # tail rides the bucket pad
            sl = slice(lo, hi)
            lut_d, arrs = _put_codes(
                mesh, lut, (ca[sl], cb[sl], sa[sl], sb[sl], ns[sl],
                            ms[sl]))
            if mesh is not None:
                fn = _sharded_align_codes_fn(
                    D, max_shift, tuple(params), int(structure_weight),
                    mesh, affine)
                dev = fn(lut_d, *arrs)
            else:
                dev = _fill_walk_codes(
                    lut_d, *arrs, D, max_shift, tuple(params),
                    int(structure_weight), affine,
                )
            parts.append((idxs, affine, dev))
    return PendingAlignments(len(pairs), parts)


# -- prepared (cached) device buckets -----------------------------------------

class PreparedBatch:
    """Device-resident buckets built once, scored many times.

    ``score_batch`` rebuilds buckets and re-transfers every table per
    call — right for one-shot streams, wasteful for steady-state serving
    where the same corpus (or the same shapes) is scored repeatedly.
    ``PreparedBatch`` does the host-side packing and the host->device
    transfer once; :meth:`scores` then runs only the kernels.

    Accepted by :func:`score_batch` in place of ``tables``.
    """

    def __init__(self, tables, max_shift: int, params, *, affine: bool,
                 mesh: Mesh | None = None, bucket_quantum: int = 64):
        from ..ops.pallas_dp import _narrow_if_fits

        tables = list(tables)
        _require_int32_safe(tables, params, affine)
        self.max_shift = max_shift
        self.params = tuple(params)
        self.affine = affine
        self.mesh = mesh
        self.bucket_quantum = bucket_quantum
        self.n_pairs = len(tables)
        self._buckets = []
        for (N, M), b in make_buckets_dense(tables, bucket_quantum).items():
            B = len(b.indices)
            # PACK (x mesh-size) pad: keep every shard packed-kernel
            # eligible (see dispatch_score_batch)
            from ..ops.pallas_dp import PACK

            q = PACK if mesh is None else PACK * mesh.shape["data"]
            Bp = ((B + q - 1) // q) * q
            pad = Bp - B
            mu1p = _narrow_if_fits(stack_padded(b.mu1d, N, M, pad))
            mu2p = _narrow_if_fits(stack_padded(b.mu2d, N, M, pad))
            ns = np.asarray(b.n + [b.n[-1]] * pad, dtype=np.int32)
            ms = np.asarray(b.m + [b.m[-1]] * pad, dtype=np.int32)
            dev = [
                _device_put_sharded(jnp.asarray(x), mesh)
                for x in (mu1p, mu2p, ns, ms)
            ]
            self._buckets.append((N, M, b.indices, dev))

    def check_compatible(self, max_shift: int, params, affine: bool,
                         mesh, *, engine: str = "auto",
                         bucket_quantum: int | None = None) -> None:
        """Fail loudly if a score_batch call's arguments differ from
        what this batch was prepared with — the prepared device arrays
        bake in those choices, so silently returning stale-parameter
        scores would be wrong results, not a cache hit.  The same
        strictness applies to ``engine`` (the prepared buckets always
        run the Pallas batched kernels) and to an explicit
        ``bucket_quantum`` that differs from the one the buckets were
        built with."""
        got = (max_shift, tuple(params), affine, mesh)
        have = (self.max_shift, self.params, self.affine, self.mesh)
        if got != have:
            raise ValueError(
                "PreparedBatch was built with (max_shift, params, "
                f"affine, mesh)={have} but score_batch was called with "
                f"{got}; rebuild the PreparedBatch for the new settings"
            )
        if engine not in ("auto", "pallas"):
            raise ValueError(
                f"engine={engine!r} conflicts with a PreparedBatch: its "
                "device buckets always run the Pallas batched kernels; "
                "pass the raw tables to score_batch for another engine"
            )
        if bucket_quantum is not None and \
                bucket_quantum != self.bucket_quantum:
            raise ValueError(
                f"bucket_quantum={bucket_quantum} conflicts with the "
                f"PreparedBatch (built with {self.bucket_quantum}); "
                "rebuild it to re-bucket"
            )

    def scores(self) -> np.ndarray:
        """Score every pair; returns int64 scores in the original input
        order.  Only kernel dispatches — no bucket rebuild, no transfer."""
        from ..ops import pallas_dp

        out = np.zeros(self.n_pairs, dtype=np.int64)
        for (N, M, indices, dev) in self._buckets:
            D = N + M + 1
            if self.mesh is not None:
                mu1p, mu2p, ns, ms = dev
                scores = _pallas_scores_sharded(
                    mu1p, mu2p, ns, ms, D, self.max_shift, self.params,
                    self.mesh, self.affine,
                )
            else:
                kern = (pallas_dp._affine_pallas_batched_dense
                        if self.affine
                        else pallas_dp._nonaffine_pallas_batched_dense)
                scores = np.asarray(jax.device_get(
                    kern(*dev, D, self.max_shift, self.params)
                ))
            for pos, idx in enumerate(indices):
                out[idx] = scores[pos]
        return out
