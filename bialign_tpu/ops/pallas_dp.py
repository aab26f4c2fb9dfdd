"""Pallas TPU kernel for the affine bi-alignment wavefront.

The XLA scan (:mod:`bialign_tpu.ops.xla_dp`) round-trips its carry
through HBM every diagonal and leaves vector-register layout to the
compiler.  This kernel owns both: the per-diagonal slabs live in VMEM
scratch across a 1-D grid over anti-diagonals ``d = i + j``, the lattice
row ``i`` is mapped to vector *lanes* (P padded to 128), the shift
offsets ``(sk, sl)`` to the small leading dims, and the 9 affine states
unroll into straight-line VPU code.  Per step only the mu tables stream
in (pipelined by the BlockSpec machinery) and one slab streams out.

Same case algebra as the XLA engine — group A (full columns, 9 sources),
group C (seq-only half columns), and the within-diagonal group-B sweep
over shift anti-diagonals ``t = sk + sl`` (reference recursion:
bialignment.pyx:255-296, 474-509).  Bit-exact int32; validated against
the numpy oracle and the XLA engine in tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).

Band layout note: output is ``ys[d, q, sk, sl, i]`` (P LAST, unlike the
XLA engine's ``ys[d, q, i, sk, sl]``); :class:`~bialign_tpu.ops.band.
DeviceBand` carries a ``p_last`` flag so the on-device traceback and
cell gathers work on either layout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cases import (
    NEG_INF,
    N_STATES,
    STATES,
    STATE_BOTH_MATCH,
    AffineTables,
    NonAffineTables,
    NONAFFINE_COLS,
)
from .xla_dp import INVALID

LANES = 128


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _shift_w(x, dk: int, dl: int):
    """result[..., sk, sl, :] = x[..., sk-dk, sl-dl, :], INVALID fill.

    Shifts along the small static shift dims (axes -3, -2); the P/lane
    axis is untouched.  Static pad+slice — unrolls to sublane moves.
    """
    W = x.shape[-3]
    pad = [(0, 0)] * (x.ndim - 3) + [
        (max(dk, 0), max(-dk, 0)),
        (max(dl, 0), max(-dl, 0)),
        (0, 0),
    ]
    padded = jnp.pad(x, pad, constant_values=INVALID)
    sl_ = tuple(
        [slice(None)] * (x.ndim - 3)
        + [
            slice(max(-dk, 0), max(-dk, 0) + W),
            slice(max(-dl, 0), max(-dl, 0) + W),
            slice(None),
        ]
    )
    return padded[sl_]


def _shift_p(x, lane_idx):
    """result[..., i] = x[..., i-1], INVALID at lane 0 (lane roll+mask)."""
    rolled = pltpu.roll(x, shift=1, axis=x.ndim - 1)
    return jnp.where(lane_idx == 0, INVALID, rolled)


def _make_update(S: int, params, Ppad: int):
    """Pure per-diagonal slab update shared by the single-pair and the
    batched kernels: (d, mu1_row, mu2_blk, vm1, vm2) -> val."""
    beta, gamma, delta = params
    W = 2 * S + 1
    Q = N_STATES
    tabs = AffineTables(beta, gamma, delta)
    a_const = tabs.a_const.tolist()       # [Q][Q] python ints -> folded
    b_const = tabs.b_const.tolist()
    c_const = tabs.c_const.tolist()
    b_src = tabs.b_src.tolist()
    c_src = tabs.c_src.tolist()
    mu1_coef = tabs.mu1_coef.tolist()
    mu2_coef = tabs.mu2_coef.tolist()
    b_mu2 = tabs.b_mu2_coef.tolist()
    c_mu1 = tabs.c_mu1_coef.tolist()

    shape = (W, W, Ppad)

    def update(d, mu1_row, mu2_blk, vm1, vm2):
        i_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        sk_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        sl_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        origin_pos = (i_ar == 0) & (sk_ar == S) & (sl_ar == S)

        j_ar = d - i_ar
        k_ar = i_ar + sk_ar - S
        l_ar = j_ar + sl_ar - S
        # predecessor slabs advanced by one lattice row (column a == 1)
        vm1_p = _shift_p(vm1, i_ar)
        vm2_p = _shift_p(vm2, i_ar)

        best = []
        for q in range(Q):
            a, b, c, dd = STATES[q]
            pred0 = vm1 if a + b == 1 else vm2
            pred1 = vm1_p if a + b == 1 else vm2_p
            pred = pred1 if a == 1 else pred0

            # group A: full column == state q, all 9 sources
            agg = None
            for s in range(Q):
                contrib = _shift_w(pred[s], c - a, dd - b) + a_const[q][s]
                agg = contrib if agg is None else jnp.maximum(agg, contrib)
            mu_term = mu1_coef[q] * mu1_row + mu2_coef[q] * mu2_blk
            gA = (
                (i_ar >= a) & (j_ar >= b) & (k_ar >= c) & (l_ar >= dd)
                & (sk_ar - c + a >= 0) & (sk_ar - c + a < W)
                & (sl_ar - dd + b >= 0) & (sl_ar - dd + b < W)
            )
            cA = jnp.where(gA, agg + mu_term, INVALID)

            # group C: seq-only half column (a, b, 0, 0); predecessor
            # shift indices grow: sk' = sk + a, sl' = sl + b
            predc = pred1 if a == 1 else pred0
            aggC = None
            for h in range(3):
                contrib = (
                    _shift_w(predc[c_src[q][h]], -a, -b) + c_const[q][h]
                )
                aggC = (
                    contrib if aggC is None else jnp.maximum(aggC, contrib)
                )
            gC = (
                (i_ar >= a) & (j_ar >= b)
                & (sk_ar + a < W) & (sl_ar + b < W)
            )
            cC = jnp.where(gC, aggC + c_mu1[q] * mu1_row, INVALID)

            best.append(jnp.maximum(cA, cC))

        best = jnp.stack(best)                   # [Q, W, W, Ppad]
        val = jnp.where(best == INVALID, NEG_INF, best)

        # origin initialization (pyx:483-485), diagonal 0 only
        is_d0 = (d == 0)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, 1, 1, 1), 0)
        init_col = jnp.where(q_iota == STATE_BOTH_MATCH, 0, NEG_INF)
        val = jnp.where(is_d0 & origin_pos, init_col, val)
        protect = is_d0 & origin_pos

        # group B sweep: str-only half columns move within this diagonal;
        # dependencies strictly decrease t = sk + sl
        for t in range(1, 4 * S + 1):
            commit = (sk_ar + sl_ar == t) & ~protect
            newb = []
            newv = []
            for q in range(Q):
                _a, _b, c, dd = STATES[q]
                aggB = None
                for h in range(3):
                    contrib = (
                        _shift_w(val[b_src[q][h]], c, dd) + b_const[q][h]
                    )
                    aggB = (
                        contrib if aggB is None
                        else jnp.maximum(aggB, contrib)
                    )
                gB = (
                    (k_ar >= c) & (l_ar >= dd)
                    & (sk_ar >= c) & (sl_ar >= dd)
                )
                cB = jnp.where(gB, aggB + b_mu2[q] * mu2_blk, INVALID)
                bq = jnp.maximum(best[q], cB)
                vq = jnp.where(bq == INVALID, NEG_INF, bq)
                newb.append(jnp.where(commit, bq, best[q]))
                newv.append(jnp.where(commit, vq, val[q]))
            best = jnp.stack(newb)
            val = jnp.stack(newv)

        return val

    return update


def _make_nonaffine_update(S: int, params, Ppad: int):
    """Per-diagonal slab update for the 13-case non-affine recurrence
    (reference recursion_cases, bialignment.pyx:225-252; fill loop 443-471).
    Slabs are [W, W, Ppad] — no state axis."""
    gamma, delta = params
    W = 2 * S + 1
    tab = NonAffineTables(gamma, delta)
    external = [
        (col, int(tab.const[ci]), int(tab.mu1_coef[ci]),
         int(tab.mu2_coef[ci]))
        for ci, col in enumerate(NONAFFINE_COLS)
        if col[0] or col[1]
    ]
    internal = [
        (col, int(tab.const[ci]), int(tab.mu2_coef[ci]))
        for ci, col in enumerate(NONAFFINE_COLS)
        if not (col[0] or col[1])
    ]
    shape = (W, W, Ppad)

    def update(d, mu1_row, mu2_blk, vm1, vm2):
        i_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        sk_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        sl_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        origin_pos = (i_ar == 0) & (sk_ar == S) & (sl_ar == S)

        j_ar = d - i_ar
        k_ar = i_ar + sk_ar - S
        l_ar = j_ar + sl_ar - S
        vm1_p = _shift_p(vm1, i_ar)
        vm2_p = _shift_p(vm2, i_ar)

        best = None
        for (x0, x1, x2, x3), const, m1c, m2c in external:
            pred = (vm1_p if x0 == 1 else vm1) if x0 + x1 == 1 else (
                vm2_p if x0 == 1 else vm2
            )
            shifted = _shift_w(pred, x2 - x0, x3 - x1)
            g = (
                (i_ar >= x0) & (j_ar >= x1) & (k_ar >= x2) & (l_ar >= x3)
                & (sk_ar - x2 + x0 >= 0) & (sk_ar - x2 + x0 < W)
                & (sl_ar - x3 + x1 >= 0) & (sl_ar - x3 + x1 < W)
            )
            contrib = shifted + const + m1c * mu1_row + m2c * mu2_blk
            c = jnp.where(g, contrib, INVALID)
            best = c if best is None else jnp.maximum(best, c)

        val = jnp.where(best == INVALID, NEG_INF, best)
        is_d0 = (d == 0)
        val = jnp.where(is_d0 & origin_pos, 0, val)
        protect = is_d0 & origin_pos

        # within-diagonal str-only cases; dependencies strictly decrease
        # t = sk + sl
        for t in range(1, 4 * S + 1):
            commit = (sk_ar + sl_ar == t) & ~protect
            b2 = best
            for (x0, x1, x2, x3), const, m2c in internal:
                shifted = _shift_w(val, x2, x3)
                g = (
                    (k_ar >= x2) & (l_ar >= x3)
                    & (sk_ar >= x2) & (sl_ar >= x3)
                )
                contrib = shifted + const + m2c * mu2_blk
                b2 = jnp.maximum(b2, jnp.where(g, contrib, INVALID))
            v2 = jnp.where(b2 == INVALID, NEG_INF, b2)
            best = jnp.where(commit, b2, best)
            val = jnp.where(commit, v2, val)
        return val

    return update


def _nonaffine_kernel(D: int, G: int, S: int, params, Ppad: int,
                      score_only: bool):
    """Single-pair non-affine kernel body (G diagonals per grid step)."""
    W = 2 * S + 1
    update = _make_nonaffine_update(S, params, Ppad)

    def kernel(mu1_ref, mu2_ref, out_ref, vm1_ref, vm2_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            vm1_ref[:] = jnp.full((W, W, Ppad), INVALID, jnp.int32)
            vm2_ref[:] = jnp.full((W, W, Ppad), INVALID, jnp.int32)

        v1 = vm1_ref[:]
        v2 = vm2_ref[:]
        for u in range(G):
            d = g * G + u
            val = update(d, mu1_ref[u, 0], mu2_ref[u], v1, v2)
            if score_only:
                @pl.when(d == D - 1)
                def _(val=val):
                    out_ref[0] = val
            else:
                out_ref[u] = val
            v2 = v1
            v1 = val
        vm1_ref[:] = v1
        vm2_ref[:] = v2

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _nonaffine_pallas(mu1d, mu2d, n, m, max_shift, params, score_only,
                      interpret):
    S = max_shift
    W = 2 * S + 1
    D = n + m + 1
    Ppad = mu1d.shape[1]
    # non-affine slabs have no state axis: out block is Q x smaller
    slab_bytes = W * W * Ppad * 4
    out_bytes = 4 if score_only else slab_bytes
    per_diag = 2 * (W * W * Ppad * 4 + Ppad * 4 + out_bytes)
    G = 1 if interpret else int(
        min(max(1, min(16, (6 * 1024 * 1024) // per_diag)), D)
    )
    Dg = -(-D // G)
    D_pad = Dg * G

    mu1d = mu1d.reshape(mu1d.shape[0], 1, Ppad)
    if D_pad > D:
        mu1d = jnp.pad(mu1d, ((0, D_pad - D), (0, 0), (0, 0)))
        mu2d = jnp.pad(mu2d, ((0, D_pad - D), (0, 0), (0, 0), (0, 0)))
    kernel = _nonaffine_kernel(D, G, S, params, Ppad, score_only)
    if score_only:
        out_shape = jax.ShapeDtypeStruct((1, W, W, Ppad), jnp.int32)
        out_specs = pl.BlockSpec((1, W, W, Ppad), lambda g: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((D_pad, W, W, Ppad), jnp.int32)
        out_specs = pl.BlockSpec((G, W, W, Ppad), lambda g: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    slab = pltpu.VMEM((W, W, Ppad), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Dg,),
        in_specs=[
            pl.BlockSpec((G, 1, Ppad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W, W, Ppad), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[slab, slab],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(mu1d, mu2d)


def fill_nonaffine_device(mu1, mu2, max_shift, gamma, delta, *,
                          interpret=None):
    """Non-affine Pallas fill; returns a DeviceBand (p_last layout)."""
    from .band import DeviceBand

    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    if interpret is None:
        interpret = not _on_tpu()
    mu1d, mu2d = _diag_mu_tables_plast(np.asarray(mu1), np.asarray(mu2), S)
    ys = _nonaffine_pallas(
        mu1d, mu2d, n, m, S, (gamma, delta), False, interpret
    )
    return DeviceBand(ys=ys, n=n, m=m, max_shift=S, affine=False,
                      p_last=True)


def nonaffine_score(mu1, mu2, max_shift, gamma, delta, *, interpret=None):
    """Non-affine optimal score via the Pallas kernel (score-only path)."""
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    if interpret is None:
        interpret = not _on_tpu()
    mu1d, mu2d = _diag_mu_tables_plast(np.asarray(mu1), np.asarray(mu2), S)
    last = _nonaffine_pallas(
        mu1d, mu2d, n, m, S, (gamma, delta), True, interpret
    )
    return int(jax.device_get(last[0, S, S, n]))


def _affine_kernel(D: int, G: int, S: int, params, Ppad: int,
                   score_only: bool):
    """Single-pair kernel body: each grid step advances G diagonals.

    Chunking amortizes the per-step grid/pipelining overhead (the slab
    math itself is far from VMEM- or VPU-bound at these sizes); the carry
    rides SSA values within a chunk and round-trips the VMEM scratch
    slabs only at chunk boundaries.  Diagonals past D-1 (the padded tail
    of the last chunk) compute garbage that is provably never read.
    """
    Q = N_STATES
    W = 2 * S + 1
    update = _make_update(S, params, Ppad)

    def kernel(mu1_ref, mu2_ref, out_ref, vm1_ref, vm2_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            vm1_ref[:] = jnp.full((Q, W, W, Ppad), INVALID, jnp.int32)
            vm2_ref[:] = jnp.full((Q, W, W, Ppad), INVALID, jnp.int32)

        v1 = vm1_ref[:]
        v2 = vm2_ref[:]
        for u in range(G):
            d = g * G + u
            val = update(d, mu1_ref[u, 0], mu2_ref[u], v1, v2)
            if score_only:
                @pl.when(d == D - 1)
                def _(val=val):
                    out_ref[0] = val
            else:
                out_ref[u] = val
            v2 = v1
            v1 = val
        vm1_ref[:] = v1
        vm2_ref[:] = v2

    return kernel


def _pick_chunk(D: int, S: int, Ppad: int, score_only: bool,
                interpret: bool) -> int:
    """Diagonals per grid step, sized to keep pipelined VMEM blocks small
    (~16 MB/core budget): in-flight = 2*(mu blocks) + 2*(out block).
    Interpret mode (CPU tests) keeps G=1 — unrolling only pays on TPU."""
    if interpret:
        return 1
    W = 2 * S + 1
    slab_bytes = N_STATES * W * W * Ppad * 4
    out_bytes = 4 if score_only else slab_bytes    # per diagonal
    per_diag = 2 * (W * W * Ppad * 4 + Ppad * 4 + out_bytes)
    budget = 6 * 1024 * 1024
    G = max(1, min(16, budget // max(per_diag, 1)))
    return int(min(G, max(1, D)))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _affine_pallas(mu1d, mu2d, n, m, max_shift, params, score_only,
                   interpret):
    S = max_shift
    W = 2 * S + 1
    Q = N_STATES
    D = n + m + 1
    Ppad = mu1d.shape[1]
    G = _pick_chunk(D, S, Ppad, score_only, interpret)
    Dg = -(-D // G)
    D_pad = Dg * G

    mu1d = mu1d.reshape(mu1d.shape[0], 1, Ppad)
    if D_pad > D:
        mu1d = jnp.pad(mu1d, ((0, D_pad - D), (0, 0), (0, 0)))
        mu2d = jnp.pad(mu2d, ((0, D_pad - D), (0, 0), (0, 0), (0, 0)))
    kernel = _affine_kernel(D, G, S, params, Ppad, score_only)
    if score_only:
        out_shape = jax.ShapeDtypeStruct((1, Q, W, W, Ppad), jnp.int32)
        out_specs = pl.BlockSpec((1, Q, W, W, Ppad),
                                 lambda g: (0, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((D_pad, Q, W, W, Ppad), jnp.int32)
        out_specs = pl.BlockSpec((G, Q, W, W, Ppad),
                                 lambda g: (g, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    slab = pltpu.VMEM((Q, W, W, Ppad), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Dg,),
        in_specs=[
            pl.BlockSpec((G, 1, Ppad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W, W, Ppad), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[slab, slab],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(mu1d, mu2d)


def _diag_mu_tables_plast(mu1: np.ndarray, mu2: np.ndarray, S: int):
    """Diagonal-layout mu tables with the lattice row LAST (lane axis).

    MU1D[d, i] = mu1[i, d-i]; MU2D[d, sk, sl, i] = mu2[i+sk-S, (d-i)+sl-S];
    0 out of range (only ever read by masked-out cases).
    """
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    W = 2 * S + 1
    D = n + m + 1
    Ppad = _round_up(n + 1, LANES)

    d_ = np.arange(D)[:, None]
    i_ = np.arange(Ppad)[None, :]
    j_ = d_ - i_
    ok = (j_ >= 0) & (j_ <= m) & (i_ <= n)
    MU1D = np.where(
        ok, mu1[np.minimum(i_, n), np.clip(j_, 0, m)], 0
    ).astype(np.int32)

    k_ = i_[:, None, None, :] + np.arange(W)[None, :, None, None] - S
    l_ = j_[:, None, None, :] + np.arange(W)[None, None, :, None] - S
    ok2 = (k_ >= 0) & (k_ <= n) & (l_ >= 0) & (l_ <= m)
    MU2D = np.where(
        ok2, mu2[np.clip(k_, 0, n), np.clip(l_, 0, m)], 0
    ).astype(np.int32)
    return jnp.asarray(MU1D), jnp.asarray(MU2D)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _slab_score(last, S, n):
    """Optimal score from the final-diagonal slab [1, Q, W, W, Ppad]."""
    return jnp.max(last[0, :, S, S, n])


def _affine_batched_kernel(S: int, params, Ppad: int):
    """Batched score-only kernel: grid (B, D), per-pair true lengths in
    SMEM via scalar prefetch; the slab update is identical to the
    single-pair kernel (it never references n/m — garbage lattice
    positions are computed but provably never read), and the score is
    captured on the fly when the pair's final diagonal d == n + m passes.
    """
    W = 2 * S + 1
    Q = N_STATES
    update = _make_update(S, params, Ppad)
    shape = (W, W, Ppad)

    def kernel(ns_ref, ms_ref, mu1_ref, mu2_ref, out_ref, vm1_ref,
               vm2_ref):
        b = pl.program_id(0)
        d = pl.program_id(1)

        @pl.when(d == 0)
        def _():
            vm1_ref[:] = jnp.full((Q, W, W, Ppad), INVALID, jnp.int32)
            vm2_ref[:] = jnp.full((Q, W, W, Ppad), INVALID, jnp.int32)
            out_ref[0] = jnp.full((LANES,), NEG_INF, jnp.int32)

        val = update(d, mu1_ref[0, 0], mu2_ref[0], vm1_ref[:], vm2_ref[:])
        vm2_ref[:] = vm1_ref[:]
        vm1_ref[:] = val

        n = ns_ref[b]
        m = ms_ref[b]

        @pl.when(d == n + m)
        def _():
            i_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            sk_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            sl_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            hit = (i_ar == n) & (sk_ar == S) & (sl_ar == S)
            score = jnp.max(jnp.where(hit[None], val, INVALID))
            out_ref[0] = jnp.full((LANES,), score, jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5))
def _affine_pallas_batched(mu1d, mu2d, ns, ms, max_shift, params):
    """Scores for a same-bucket batch.

    mu1d: [B, D, 1, Ppad]; mu2d: [B, D, W, W, Ppad]; ns/ms: [B] int32.
    Returns [B] int32 scores.
    """
    S = max_shift
    W = 2 * S + 1
    Q = N_STATES
    B, D = mu1d.shape[0], mu1d.shape[1]
    Ppad = mu1d.shape[-1]
    # fold (B, D) so per-step blocks have the single-pair shapes
    mu1f = mu1d.reshape(B * D, 1, Ppad)
    mu2f = mu2d.reshape(B * D, W, W, Ppad)

    kernel = _affine_batched_kernel(S, params, Ppad)
    slab = pltpu.VMEM((Q, W, W, Ppad), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, D),
        in_specs=[
            pl.BlockSpec((1, 1, Ppad),
                         lambda b, d, ns, ms: (b * D + d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, W, Ppad),
                         lambda b, d, ns, ms: (b * D + d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda b, d, ns, ms: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[slab, slab],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        interpret=not _on_tpu(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(ns, ms, mu1f, mu2f)
    return out[:, 0]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fill_affine_device(mu1, mu2, max_shift, beta, gamma, delta, *,
                       interpret=None):
    """Affine Pallas fill; returns a DeviceBand (p_last layout)."""
    from .band import DeviceBand

    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    if interpret is None:
        interpret = not _on_tpu()
    mu1d, mu2d = _diag_mu_tables_plast(np.asarray(mu1), np.asarray(mu2), S)
    ys = _affine_pallas(
        mu1d, mu2d, n, m, S, (beta, gamma, delta), False, interpret
    )
    return DeviceBand(ys=ys, n=n, m=m, max_shift=S, affine=True,
                      p_last=True)


def affine_score(mu1, mu2, max_shift, beta, gamma, delta, *,
                 interpret=None):
    """Affine optimal score via the Pallas kernel (score-only path)."""
    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    S = max_shift
    if interpret is None:
        interpret = not _on_tpu()
    mu1d, mu2d = _diag_mu_tables_plast(np.asarray(mu1), np.asarray(mu2), S)
    last = _affine_pallas(
        mu1d, mu2d, n, m, S, (beta, gamma, delta), True, interpret
    )
    return int(jax.device_get(_slab_score(last, S, n)))


def affine_scan(mu1d, mu2d, n, m, max_shift, params, score_only=False):
    """Compatibility shim for xla_dp.fill_affine(pallas=True): takes the
    XLA engine's diagonal tables, converts layout, runs the kernel, and
    returns (last_slab, ys) in the XLA engine's [.., P, W, W] layout."""
    mu1d = np.asarray(mu1d)
    mu2d = np.asarray(mu2d)
    D, P = mu1d.shape
    Ppad = _round_up(P, LANES)
    W = 2 * max_shift + 1
    m1 = np.zeros((D, Ppad), dtype=np.int32)
    m1[:, :P] = mu1d
    m2 = np.zeros((D, W, W, Ppad), dtype=np.int32)
    m2[:, :, :, :P] = mu2d.transpose(0, 2, 3, 1)
    interpret = not _on_tpu()
    ys = _affine_pallas(
        jnp.asarray(m1), jnp.asarray(m2), n, m, max_shift, tuple(params),
        score_only, interpret,
    )
    ys = jnp.moveaxis(ys, -1, 2)[:, :, :P]       # [D?, Q, P, W, W]
    if score_only:
        return ys[0], None
    return ys[n + m], ys[:n + m + 1]   # padded chunk tail is garbage
