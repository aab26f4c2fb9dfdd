"""Headline benchmark: DP 4D-cells/s on the DNA-Polymerase-1 affine fill.

Reference baseline (BASELINE.md): the Cython engine fills the 928x933,
max_shift=1 affine band in 626.7 s = ~12.46k 4D-cells/s (single CPU
thread).  This benchmark runs the same problem (README CLI flags:
gap -150/-50, shift -150, structure_weight 800, BLOSUM62) through the
Pallas wavefront kernel on TPU (XLA scan engine on other backends),
score-only, steady-state (post-compile), and prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    from bialign_tpu.io.cfssp import read_molecule_from_file
    from bialign_tpu.models.molecule import preprocess_molecule
    from bialign_tpu.scoring.tables import build_score_tables
    from bialign_tpu.ops import pallas_dp, xla_dp

    ex = "/root/reference/Examples"
    seqA, strA = read_molecule_from_file(
        f"{ex}/DNAPolymerase1_Escherichia.cfssp", "Protein"
    )
    seqB, strB = read_molecule_from_file(
        f"{ex}/DNAPolymerase1_Xanthomonas.cfssp", "Protein"
    )
    params = dict(
        type="Protein", structure_weight=800, simmatrix="BLOSUM62",
        gap_opening_cost=-150, gap_cost=-50, shift_cost=-150, max_shift=1,
    )
    molA = preprocess_molecule(seqA, strA, is_rna=False)
    molB = preprocess_molecule(seqB, strB, is_rna=False)
    mu1, mu2 = build_score_tables(molA, molB, params, is_rna=False)

    n, m, S = len(seqA), len(seqB), params["max_shift"]
    ptuple = (params["gap_opening_cost"], params["gap_cost"],
              params["shift_cost"])
    on_tpu = pallas_dp._on_tpu()

    if on_tpu:
        mu1d, mu2d = pallas_dp._diag_mu_tables_plast(mu1, mu2, S)
        mu1d = jax.device_put(mu1d)
        mu2d = jax.device_put(mu2d)

        def run():
            out = pallas_dp._affine_pallas(
                mu1d, mu2d, n, m, S, ptuple, True, False
            )
            out.block_until_ready()
            return out

        last = run()  # compile
        score = int(jax.device_get(pallas_dp._slab_score(last, S, n)))
    else:
        mu1d, mu2d = xla_dp._diag_mu_tables(mu1, mu2, S)
        mu1d = jax.device_put(mu1d)
        mu2d = jax.device_put(mu2d)

        def run():
            last, _ = xla_dp._affine_scan(mu1d, mu2d, n, m, S, ptuple, True)
            last.block_until_ready()
            return last

        last = run()
        score = int(np.max(np.asarray(last[:, n, S, S])))

    assert score == 761500, f"SCORE mismatch: {score} (expect 761500)"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)

    cells = (n + 1) * (m + 1) * (2 * S + 1) ** 2
    value = cells / best
    baseline = cells / 626.7  # reference Cython, bialign.ipynb cell 5
    print(json.dumps({
        "metric": "dnapol1_affine_ms1_4d_cells_per_s",
        "value": round(value, 1),
        "unit": "cells/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
