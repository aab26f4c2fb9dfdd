"""Headline benchmarks on the DNA-Polymerase-1 pair (928 x 933 aa).

Reference baselines (BASELINE.md / Notebooks/bialign.ipynb cell 5, single
CPU thread, Cython engine):

* affine fill, max_shift 1:  626.7 s  (~12.46k 4D-cells/s)
* affine fill, max_shift 2: 2201.0 s  (~ 9.86k 4D-cells/s)

Metrics produced (all on the default JAX device — Pallas kernel on TPU,
XLA scan elsewhere):

1. dnapol1_affine_ms1_4d_cells_per_s   — headline (as rounds 1-2)
2. dnapol1_affine_ms2_4d_cells_per_s   — the CLI's default max_shift
3. dnapol1_nonaffine_ms2_4d_cells_per_s
4. toy_protein_batched_pairs_per_s     — batched Pallas kernel, 64 pairs
   (+ the same at B=512, amortizing per-call host/dispatch overhead)
5. dnapol1_affine_ms1_e2e_s            — fill + traceback + 14-line decode
6. vpu_peak_fraction_ms1               — speed-of-light accounting

Prints ONE JSON line: the headline metric plus an ``extra_metrics`` list.

Timing methodology: the serving platform has a large fixed per-execution
latency (tens of ms through the device tunnel) and ``block_until_ready``
does not reliably block, so kernel metrics use the marginal slope between
chained-K programs (distinct inputs, so XLA cannot CSE), forced complete
with ``jax.device_get``; the fixed round-trip cancels exactly.  The e2e
metric is honest wall-clock (it is inherently round-trip-bound).

Speed-of-light model for metric 6: per 4D cell the affine recurrence
performs ~R required int32 VPU ops (R = 9 states * [9-source max tree +
masks + adds] + group B/C sweeps, counted from the kernel's op graph
~ 360 ops/cell at ms 1); VPU peak is modeled as 8 sublanes x 128 lanes x
4 ALU slots x 0.94 GHz ~ 3.85e12 int32 ops/s (v5e-class, public figures).
"""

import json
import time

import numpy as np

REPS = 3


def _dnapol_tables(params):
    from bialign_tpu.data import example_path
    from bialign_tpu.io.cfssp import read_molecule_from_file
    from bialign_tpu.models.molecule import preprocess_molecule
    from bialign_tpu.scoring.tables import build_score_tables

    seqA, strA = read_molecule_from_file(
        example_path("DNAPolymerase1_Escherichia.cfssp"), "Protein"
    )
    seqB, strB = read_molecule_from_file(
        example_path("DNAPolymerase1_Xanthomonas.cfssp"), "Protein"
    )
    molA = preprocess_molecule(seqA, strA, is_rna=False)
    molB = preprocess_molecule(seqB, strB, is_rna=False)
    mu1, mu2 = build_score_tables(molA, molB, params, is_rna=False)
    return (seqA, strA, seqB, strB), mu1, mu2


PARAMS = dict(
    type="Protein", structure_weight=800, simmatrix="BLOSUM62",
    gap_opening_cost=-150, gap_cost=-50, shift_cost=-150,
)


def _marginal_time(make_chain, k_lo, k_hi, expect=None):
    """Seconds per call via the marginal slope between two chain lengths."""
    import jax

    f_lo, args_lo = make_chain(k_lo)
    f_hi, args_hi = make_chain(k_hi)
    out = jax.device_get(f_lo(*args_lo))
    if expect is not None:
        assert int(np.ravel(out)[0]) == expect, f"SCORE {np.ravel(out)[0]}"
    jax.device_get(f_hi(*args_hi))

    def timed(f, args):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(f_lo, args_lo)
    t_hi = timed(f_hi, args_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    if per <= 0:  # noise floor: conservative fallback
        per = t_hi / k_hi
    return per


def _fill_cells_metric(mu1, mu2, S, affine, expect, on_tpu):
    """4D cells/s for one score-only fill at max_shift S."""
    import jax
    import jax.numpy as jnp

    from bialign_tpu.ops import pallas_dp, xla_dp

    n = mu1.shape[0] - 1
    m = mu1.shape[1] - 1
    beta, gamma, delta = (PARAMS["gap_opening_cost"], PARAMS["gap_cost"],
                          PARAMS["shift_cost"])
    ptuple = (beta, gamma, delta) if affine else (gamma, delta)

    if on_tpu:
        Ppad = pallas_dp._round_up(n + 1, pallas_dp.LANES)
        pick = (pallas_dp._pick_chunk if affine
                else pallas_dp._pick_chunk_nonaffine)
        G = pick(S, Ppad, True, False)
        D_pad = pallas_dp._bucket_D(n + m + 1, G, False)
        mu1d, mu2d = pallas_dp._diag_mu_tables_plast(mu1, mu2, S, D_pad)
        d_last = jnp.asarray([n + m], dtype=jnp.int32)

        def one(m1, m2):
            if affine:
                o = pallas_dp._affine_pallas(m1, m2, d_last, S, ptuple,
                                             True, False)
                return jnp.max(o[0, :, S, S, n])
            o = pallas_dp._nonaffine_pallas(m1, m2, d_last, S, ptuple,
                                            True, False)
            return o[0, S, S, n]
    else:
        mu1d, mu2d = xla_dp._diag_mu_tables(mu1, mu2, S)

        def one(m1, m2):
            if affine:
                last, _ = xla_dp._affine_scan(m1, m2, n, m, S, ptuple, True)
                return jnp.max(last[:, n, S, S])
            last, _ = xla_dp._nonaffine_scan(m1, m2, n, m, S, ptuple, True)
            return last[n, S, S]

    mu1d = jax.device_put(mu1d)
    mu2d = jax.device_put(mu2d)

    def make_chain(K):
        @jax.jit
        def f(m1, m2):
            # kk perturbs inputs so XLA cannot CSE the K kernels
            return jnp.stack([one(m1 + kk, m2) for kk in range(K)])
        return f, (mu1d, mu2d)

    per = _marginal_time(make_chain, 1, 9, expect=expect)
    cells = (n + 1) * (m + 1) * (2 * S + 1) ** 2
    return cells / per, per, cells


def _batched_pairs_metric(on_tpu, B=64):
    """Pairs/s on a B-pair bucket of the toy protein (42 x 42, ms 1)."""
    import jax

    from bialign_tpu.models.molecule import preprocess_molecule
    from bialign_tpu.scoring.tables import build_score_tables
    from bialign_tpu.parallel import batch as pbatch

    seqA = "RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYARFR"
    seqB = "KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAYFR"
    strA = "CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEECCC"
    strB = "HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEECC"
    molA = preprocess_molecule(seqA, strA, is_rna=False)
    molB = preprocess_molecule(seqB, strB, is_rna=False)
    mu1, mu2 = build_score_tables(molA, molB, PARAMS, is_rna=False)
    tables = [(mu1, mu2)] * B
    args = dict(
        max_shift=1,
        params=(PARAMS["gap_opening_cost"], PARAMS["gap_cost"],
                PARAMS["shift_cost"]),
        affine=True,
        engine="pallas" if on_tpu else "xla",
    )
    scores = pbatch.score_batch(tables, args["max_shift"], args["params"],
                                affine=True, engine=args["engine"])
    assert (scores == 48500).all(), scores[:4]
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        pbatch.score_batch(tables, args["max_shift"], args["params"],
                           affine=True, engine=args["engine"])
        best = min(best, time.perf_counter() - t0)
    return B / best


def _e2e_metric(raw, on_tpu):
    """Full user path: fill + traceback + 14-line decode, wall-clock."""
    from bialign_tpu import BiAligner

    seqA, strA, seqB, strB = raw
    engine = "pallas" if on_tpu else "xla"
    best = float("inf")
    score = None
    for _ in range(2):
        t0 = time.perf_counter()
        ba = BiAligner(seqA, seqB, strA, strB, engine=engine, max_shift=1,
                       **PARAMS)
        score = ba.optimize()
        lines = list(ba.decode_trace())
        best = min(best, time.perf_counter() - t0)
    assert score == 761500, score
    assert len(lines) == 6
    return best


def main():
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    extras = []

    _, mu1_ms1, mu2_ms1 = _dnapol_tables(dict(PARAMS, max_shift=1))
    raw, mu1_ms2, mu2_ms2 = _dnapol_tables(dict(PARAMS, max_shift=2))

    # 1. headline: affine ms1 cells/s
    v1, _, _ = _fill_cells_metric(mu1_ms1, mu2_ms1, 1, True, 761500, on_tpu)
    base1 = ((929 * 934 * 9) / 626.7)
    headline = {
        "metric": "dnapol1_affine_ms1_4d_cells_per_s",
        "value": round(v1, 1),
        "unit": "cells/s",
        "vs_baseline": round(v1 / base1, 2),
    }

    # 1b. affine ms0 (the reference's fastest recorded config: 26.2 s)
    _, mu1_ms0, mu2_ms0 = _dnapol_tables(dict(PARAMS, max_shift=0))
    v0, _, _ = _fill_cells_metric(mu1_ms0, mu2_ms0, 0, True, None, on_tpu)
    base0 = (929 * 934) / 26.2
    extras.append({
        "metric": "dnapol1_affine_ms0_4d_cells_per_s",
        "value": round(v0, 1), "unit": "cells/s",
        "vs_baseline": round(v0 / base0, 2),
    })

    # 2. affine ms2 (CLI default shift band)
    v2, _, _ = _fill_cells_metric(mu1_ms2, mu2_ms2, 2, True, None, on_tpu)
    base2 = (929 * 934 * 25) / 2201.0
    extras.append({
        "metric": "dnapol1_affine_ms2_4d_cells_per_s",
        "value": round(v2, 1), "unit": "cells/s",
        "vs_baseline": round(v2 / base2, 2),
    })

    # 3. non-affine ms2 (no reference timing exists; vs_baseline uses the
    # reference's affine ms2 rate — the only published ms2 number)
    v3, _, _ = _fill_cells_metric(mu1_ms2, mu2_ms2, 2, False, None, on_tpu)
    extras.append({
        "metric": "dnapol1_nonaffine_ms2_4d_cells_per_s",
        "value": round(v3, 1), "unit": "cells/s",
        "vs_baseline": round(v3 / base2, 2),
    })

    # 4. batched pairs/s (toy protein bucket).  Reference rate derived from
    # its ms1 cells/s: 43*43*9 cells / 12.46k cells/s = 1.335 s/pair.
    v4 = _batched_pairs_metric(on_tpu)
    extras.append({
        "metric": "toy_protein_batched_pairs_per_s",
        "value": round(v4, 2), "unit": "pairs/s",
        "vs_baseline": round(v4 / (1.0 / 1.335), 2),
    })

    # 4b. same metric at a serving-sized batch (B=512) — amortizes the
    # per-call host/dispatch overhead the 64-pair bucket exposes
    v4b = _batched_pairs_metric(on_tpu, B=512)
    extras.append({
        "metric": "toy_protein_batched_pairs_per_s_b512",
        "value": round(v4b, 2), "unit": "pairs/s",
        "vs_baseline": round(v4b / (1.0 / 1.335), 2),
    })

    # 5. end-to-end fill + traceback + decode (reference: 626.7 s fill
    # alone; its traceback/decode add seconds at most)
    v5 = _e2e_metric(raw, on_tpu)
    extras.append({
        "metric": "dnapol1_affine_ms1_e2e_s",
        "value": round(v5, 2), "unit": "s",
        "vs_baseline": round(626.7 / v5, 2),
    })

    # 6. speed-of-light: fraction of modeled VPU int32 peak at ms1
    ops_per_cell = 360.0           # required slab ops per 4D cell (module doc)
    vpu_peak = 8 * 128 * 4 * 0.94e9
    extras.append({
        "metric": "vpu_peak_fraction_ms1",
        "value": round(v1 * ops_per_cell / vpu_peak, 4),
        "unit": "fraction",
        "vs_baseline": round((v1 * ops_per_cell / vpu_peak)
                             / (12.46e3 * 360 / vpu_peak), 2),
    })

    headline["extra_metrics"] = extras
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
