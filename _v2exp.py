"""Scratch experiment: folded-sublane (WW) affine Pallas kernel, v2.

Layout change vs ops/pallas_dp.py: slabs are [Q, W*W, Ppad] (shift dims
folded onto one sublane axis), and the per-case shift is hoisted OUT of
the 9-source reduction (max first, one roll after).  Score-only; compares
against the known DNA-Pol-1 score 761500 and times steady-state.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bialign_tpu.ops.cases import (
    NEG_INF, N_STATES, STATES, STATE_BOTH_MATCH, AffineTables,
)
from bialign_tpu.ops.xla_dp import INVALID
from bialign_tpu.ops import pallas_dp

LANES = 128


def _make_update_v2(S, params, Ppad):
    beta, gamma, delta = params
    W = 2 * S + 1
    WW = W * W
    Q = N_STATES
    tabs = AffineTables(beta, gamma, delta)
    a_const = tabs.a_const.tolist()
    b_const = tabs.b_const.tolist()
    c_const = tabs.c_const.tolist()
    b_src = tabs.b_src.tolist()
    c_src = tabs.c_src.tolist()
    mu1_coef = tabs.mu1_coef.tolist()
    mu2_coef = tabs.mu2_coef.tolist()
    b_mu2 = tabs.b_mu2_coef.tolist()
    c_mu1 = tabs.c_mu1_coef.tolist()
    shape = (WW, Ppad)

    def roll_w(x, dk, dl):
        s = (dk * W + dl) % WW
        if s == 0:
            return x
        return pltpu.roll(x, shift=s, axis=x.ndim - 2)

    def shift_p(x, lane_idx):
        rolled = pltpu.roll(x, shift=1, axis=x.ndim - 1)
        return jnp.where(lane_idx == 0, INVALID, rolled)

    def update(d, mu1_row, mu2_blk, vm1, vm2):
        # vm1/vm2: lists of Q arrays [WW, Ppad]; mu1_row [1, Ppad];
        # mu2_blk [WW, Ppad]
        i_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        r_ar = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        sk_ar = r_ar // W
        sl_ar = r_ar - sk_ar * W
        origin_pos = (i_ar == 0) & (r_ar == S * W + S)

        j_ar = d - i_ar
        k_ar = i_ar + sk_ar - S
        l_ar = j_ar + sl_ar - S

        vm1s = jnp.stack(vm1)
        vm2s = jnp.stack(vm2)
        vm1p = shift_p(vm1s, i_ar)
        vm2p = shift_p(vm2s, i_ar)

        best = []
        for q in range(Q):
            a, b, c, dd = STATES[q]
            pred = (vm1p if a == 1 else vm1s) if a + b == 1 else (
                vm2p if a == 1 else vm2s)
            red = None
            for s in range(Q):
                t_ = pred[s] + a_const[q][s]
                red = t_ if red is None else jnp.maximum(red, t_)
            agg = roll_w(red, c - a, dd - b)
            mu_term = mu1_coef[q] * mu1_row + mu2_coef[q] * mu2_blk
            gA = (
                (i_ar >= a) & (j_ar >= b) & (k_ar >= c) & (l_ar >= dd)
                & (sk_ar - (c - a) >= 0) & (sk_ar - (c - a) < W)
                & (sl_ar - (dd - b) >= 0) & (sl_ar - (dd - b) < W)
            )
            cA = jnp.where(gA, agg + mu_term, INVALID)

            predc = vm1p if a == 1 else vm1s
            if a + b != 1:
                predc = vm2p if a == 1 else vm2s
            redC = None
            for h in range(3):
                t_ = predc[c_src[q][h]] + c_const[q][h]
                redC = t_ if redC is None else jnp.maximum(redC, t_)
            aggC = roll_w(redC, -a, -b)
            gC = (
                (i_ar >= a) & (j_ar >= b)
                & (sk_ar + a < W) & (sl_ar + b < W)
            )
            cC = jnp.where(gC, aggC + c_mu1[q] * mu1_row, INVALID)
            best.append(jnp.maximum(cA, cC))

        val = [jnp.where(b_ == INVALID, NEG_INF, b_) for b_ in best]

        is_d0 = (d == 0)
        for q in range(Q):
            initv = 0 if q == STATE_BOTH_MATCH else NEG_INF
            val[q] = jnp.where(is_d0 & origin_pos, initv, val[q])
        protect = is_d0 & origin_pos

        for t in range(1, 4 * S + 1):
            commit = (sk_ar + sl_ar == t) & ~protect
            newb, newv = [], []
            for q in range(Q):
                _a, _b, c, dd = STATES[q]
                redB = None
                for h in range(3):
                    t_ = val[b_src[q][h]] + b_const[q][h]
                    redB = t_ if redB is None else jnp.maximum(redB, t_)
                aggB = roll_w(redB, c, dd)
                gB = (
                    (k_ar >= c) & (l_ar >= dd)
                    & (sk_ar >= c) & (sl_ar >= dd)
                )
                cB = jnp.where(gB, aggB + b_mu2[q] * mu2_blk, INVALID)
                bq = jnp.maximum(best[q], cB)
                vq = jnp.where(bq == INVALID, NEG_INF, bq)
                newb.append(jnp.where(commit, bq, best[q]))
                newv.append(jnp.where(commit, vq, val[q]))
            best = newb
            val = newv
        return val

    return update


def _affine_kernel_v2(D, G, S, params, Ppad):
    Q = N_STATES
    W = 2 * S + 1
    WW = W * W
    update = _make_update_v2(S, params, Ppad)

    def kernel(mu1_ref, mu2_ref, out_ref, vm1_ref, vm2_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            vm1_ref[:] = jnp.full((Q, WW, Ppad), INVALID, jnp.int32)
            vm2_ref[:] = jnp.full((Q, WW, Ppad), INVALID, jnp.int32)

        v1 = [vm1_ref[q] for q in range(Q)]
        v2 = [vm2_ref[q] for q in range(Q)]
        for u in range(G):
            d = g * G + u
            val = update(d, mu1_ref[u], mu2_ref[u], v1, v2)

            @pl.when(d == D - 1)
            def _(val=val):
                out_ref[0] = jnp.stack(val)

            v2 = v1
            v1 = val
        vm1_ref[:] = jnp.stack(v1)
        vm2_ref[:] = jnp.stack(v2)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _affine_pallas_v2(mu1d, mu2d, n, m, max_shift, params, G):
    S = max_shift
    W = 2 * S + 1
    WW = W * W
    Q = N_STATES
    D = n + m + 1
    Ppad = mu1d.shape[1]
    Dg = -(-D // G)
    D_pad = Dg * G

    mu1d = mu1d.reshape(mu1d.shape[0], 1, Ppad)
    mu2f = mu2d.reshape(mu2d.shape[0], WW, Ppad)
    if D_pad > D:
        mu1d = jnp.pad(mu1d, ((0, D_pad - D), (0, 0), (0, 0)))
        mu2f = jnp.pad(mu2f, ((0, D_pad - D), (0, 0), (0, 0)))
    kernel = _affine_kernel_v2(D, G, S, params, Ppad)
    out_shape = jax.ShapeDtypeStruct((1, Q, WW, Ppad), jnp.int32)
    out_specs = pl.BlockSpec((1, Q, WW, Ppad), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    slab = pltpu.VMEM((Q, WW, Ppad), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(Dg,),
        in_specs=[
            pl.BlockSpec((G, 1, Ppad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WW, Ppad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[slab, slab],
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(mu1d, mu2f)


def main():
    from bialign_tpu.io.cfssp import read_molecule_from_file
    from bialign_tpu.models.molecule import preprocess_molecule
    from bialign_tpu.scoring.tables import build_score_tables

    ex = "/root/reference/Examples"
    seqA, strA = read_molecule_from_file(
        f"{ex}/DNAPolymerase1_Escherichia.cfssp", "Protein")
    seqB, strB = read_molecule_from_file(
        f"{ex}/DNAPolymerase1_Xanthomonas.cfssp", "Protein")
    params = dict(type="Protein", structure_weight=800,
                  simmatrix="BLOSUM62", gap_opening_cost=-150,
                  gap_cost=-50, shift_cost=-150, max_shift=1)
    molA = preprocess_molecule(seqA, strA, is_rna=False)
    molB = preprocess_molecule(seqB, strB, is_rna=False)
    mu1, mu2 = build_score_tables(molA, molB, params, is_rna=False)
    n, m, S = len(seqA), len(seqB), 1
    pt = (-150, -50, -150)
    mu1d, mu2d = pallas_dp._diag_mu_tables_plast(mu1, mu2, S)
    mu1d = jax.device_put(mu1d)
    mu2d = jax.device_put(mu2d)

    for G in [int(x) for x in sys.argv[1:]] or [16]:
        t0 = time.perf_counter()
        out = _affine_pallas_v2(mu1d, mu2d, n, m, S, pt, G)
        out.block_until_ready()
        tc = time.perf_counter() - t0
        sc = int(jax.device_get(jnp.max(out[0, :, S * (2 * S + 1) + S, n])))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = _affine_pallas_v2(mu1d, mu2d, n, m, S, pt, G)
            o.block_until_ready()
            ts.append(time.perf_counter() - t0)
        cells = (n + 1) * (m + 1) * (2 * S + 1) ** 2
        print(f"v2 G={G:3d} score={sc} (expect 761500) compile={tc:.0f}s "
              f"best={min(ts)*1e3:.2f}ms cells/s={cells/min(ts)/1e6:.1f}M",
              flush=True)


if __name__ == "__main__":
    main()
