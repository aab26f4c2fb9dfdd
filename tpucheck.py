"""TPU end-to-end smoke tier (VERDICT r2 item 3).

Runs the COMPILED (non-interpret) Pallas fill + on-device traceback +
full decode on the attached accelerator and asserts golden outputs:

* toy RNA, affine, max_shift 1        -> SCORE 6800 + 6 default lines
* toy RNA, non-affine CLI defaults,
  max_shift 2                          -> SCORE 6300 + 6 default lines
* toy protein, affine, sorted outmode  -> SCORE 48500 + 17 sorted lines
* DNA-Pol-1 prefix 150x150, affine     -> SCORE 117180 (fill + traceback)
* DNA-Pol-1 FULL 928x933 (README CLI flags, reference README.md:159-162)
  -> SCORE 761500 + all six SURVEY.md §8 md5 row anchors — re-proven at
  HEAD every round (VERDICT r3 item 4)

Each case reports cold (first-call, incl. compile) and warm wall times.
Writes ONE JSON object to TPUCHECK_r0N.json (argv[1], default
TPUCHECK.json) and prints it; rc 0 iff every case passed.

The pytest suite runs on forced-CPU interpret mode (tests/conftest.py);
this script is the compiled-on-TPU evidence the CPU tier cannot give.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import golden as G  # noqa: E402


def _strip_names(lines):
    return [ln for ln in lines]


def _run_case(name, mol, params, want_score, want_lines, engine="pallas"):
    from bialign_tpu import BiAligner

    res = {"name": name, "engine": engine}
    try:
        t0 = time.perf_counter()
        ba = BiAligner(mol["seqA"], mol["seqB"], mol.get("strA"),
                       mol.get("strB"), engine=engine, **params)
        score = ba.optimize()
        res["t_fill_cold_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        lines = list(ba.decode_trace())
        res["t_traceback_decode_s"] = round(time.perf_counter() - t0, 2)

        # warm repeat (fresh aligner, same shapes -> compile cache hits)
        t0 = time.perf_counter()
        ba2 = BiAligner(mol["seqA"], mol["seqB"], mol.get("strA"),
                        mol.get("strB"), engine=engine, **params)
        score2 = ba2.optimize()
        lines2 = list(ba2.decode_trace())
        res["t_warm_total_s"] = round(time.perf_counter() - t0, 2)

        res["score"] = score
        res["score_ok"] = (score == want_score) and (score2 == want_score)
        if want_lines is not None:
            res["lines_ok"] = (lines == want_lines) and (lines2 == want_lines)
            if not res["lines_ok"]:
                res["got_lines"] = lines[:4]
        else:
            res["lines_ok"] = bool(lines) and lines == lines2
        res["ok"] = bool(res["score_ok"] and res["lines_ok"])
    except Exception as e:  # noqa: BLE001 - smoke tier records any failure
        res["ok"] = False
        res["error"] = f"{type(e).__name__}: {e}"
    return res


def _dnapol_mols():
    from bialign_tpu.data import example_path
    from bialign_tpu.io.cfssp import read_molecule_from_file

    seqA, strA = read_molecule_from_file(
        example_path("DNAPolymerase1_Escherichia.cfssp"), "Protein"
    )
    seqB, strB = read_molecule_from_file(
        example_path("DNAPolymerase1_Xanthomonas.cfssp"), "Protein"
    )
    return seqA, strA, seqB, strB


def _dnapol_prefix_case():
    seqA, strA, seqB, strB = _dnapol_mols()
    mol = dict(seqA=seqA[:150], seqB=seqB[:150], strA=strA[:150],
               strB=strB[:150])
    params = dict(
        type="Protein", shift_cost=-210, structure_weight=800,
        simmatrix="BLOSUM62", gap_opening_cost=-200, gap_cost=-50,
        max_shift=1,
    )
    return mol, params


# SURVEY.md §8 anchors for the flagship README invocation
# (/root/reference/README.md:159-162): md5 of each default-outmode
# alignment string, name column excluded.
FULL_MD5 = {
    "A": "4f49c3ed126e81d65bc13e6b963384fd",
    "B": "cf1a0953be5d5fffa9eb8a63e03aed51",
    "A ss": "755f0f228092a86aaf2458b7962b6c7b",
    "B ss": "89a56b820328ee1e1ed80c4f10370c49",
    "A shifts": "d5c459dce9c5e48d2eca62e1851e053a",
    "B shifts": "57bc03db8fe01bdfa4fdc169078679de",
}


def _run_dnapol_full(engine="pallas"):
    """Full 928x933 fill + traceback + decode at HEAD, with per-row md5
    anchors."""
    import hashlib

    from bialign_tpu import BiAligner

    res = {"name": "dnapol_full_928x933", "engine": engine}
    try:
        seqA, strA, seqB, strB = _dnapol_mols()
        t0 = time.perf_counter()
        ba = BiAligner(
            seqA, seqB, strA, strB, engine=engine, type="Protein",
            shift_cost=-150, structure_weight=800, simmatrix="BLOSUM62",
            gap_opening_cost=-150, gap_cost=-50, max_shift=1,
        )
        score = ba.optimize()
        res["t_fill_cold_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        lines = list(ba.decode_trace())
        res["t_traceback_decode_s"] = round(time.perf_counter() - t0, 2)
        res["score"] = score
        res["score_ok"] = score == 761500
        md5s = {}
        for line in lines:
            name = line[:16].rstrip()
            md5s[name] = hashlib.md5(line[16:].encode()).hexdigest()
        res["md5_ok"] = md5s == FULL_MD5
        if not res["md5_ok"]:
            res["got_md5"] = md5s
        res["ok"] = bool(res["score_ok"] and res["md5_ok"])
    except Exception as e:  # noqa: BLE001 - smoke tier records any failure
        res["ok"] = False
        res["error"] = f"{type(e).__name__}: {e}"
    return res


def _run_conveyor_codes_case():
    """Conveyor + codes serving path, COMPILED on the real chip: 12
    mixed 150-250-aa DNA-Pol windows through dispatch_score_batch_codes
    (device LUT build -> conveyor kernel) must match the tables-input
    per-pair batched kernel bit-for-bit."""
    import random

    import jax

    from bialign_tpu.models.molecule import preprocess_molecule
    from bialign_tpu.parallel import batch as pbatch
    from bialign_tpu.scoring.tables import _sim_lut, build_score_tables

    res = {"name": "conveyor_codes_150_250aa", "ok": False}
    try:
        seqA, strA, seqB, strB = _dnapol_mols()
        rng = random.Random(9)
        params = {"type": "Protein", "structure_weight": 800,
                  "simmatrix": "BLOSUM62", "gap_opening_cost": -150,
                  "gap_cost": -50, "shift_cost": -150, "max_shift": 1}
        recs = []
        for _ in range(12):
            la = rng.randint(150, 250)
            a0 = rng.randint(0, len(seqA) - la)
            lb = la + rng.randint(-8, 8)
            b0 = rng.randint(0, len(seqB) - lb)
            recs.append((seqA[a0:a0 + la], strA[a0:a0 + la],
                         seqB[b0:b0 + lb], strB[b0:b0 + lb]))
        lut, _ = _sim_lut("BLOSUM62")
        t0 = time.perf_counter()
        pairs = [pbatch.encode_pair(a, b, sa, sb)
                 for a, sa, b, sb in recs]
        got = pbatch.dispatch_score_batch_codes(
            pairs, 1, (-150, -50, -150), affine=True,
            lut=jax.device_put(lut), structure_weight=800,
        ).get()
        res["t_codes_s"] = round(time.perf_counter() - t0, 2)
        tables = []
        for a, sa, b, sb in recs:
            molA = preprocess_molecule(a, sa, is_rna=False)
            molB = preprocess_molecule(b, sb, is_rna=False)
            tables.append(build_score_tables(molA, molB, params,
                                             is_rna=False))
        # cross-ENGINE anchor: the vmapped XLA scan shares no code with
        # the conveyor kernel or the device LUT build
        want = pbatch.score_batch(tables, 1, (-150, -50, -150),
                                  affine=True, engine="xla")
        res["scores"] = [int(x) for x in got]
        res["ok"] = bool((got == want).all())
        if not res["ok"]:
            res["want"] = [int(x) for x in want]
    except Exception as e:  # noqa: BLE001
        res["error"] = f"{type(e).__name__}: {e}"
    return res


def main():
    # apply JAX_PLATFORMS/compile-cache config BEFORE any backend init
    # (a sitecustomize may have pinned the platform already)
    from bialign_tpu.utils.jaxconfig import ensure_compile_cache

    ensure_compile_cache()
    import jax

    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPUCHECK.json"
    engine = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    t_start = time.perf_counter()
    platform = jax.devices()[0].platform
    # First device execution pays the platform/tunnel session warmup
    # (measured 20-200 s on the axon-tunneled v5e, independent of the
    # program) — time it separately so per-case numbers reflect the
    # framework, not the serving platform.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.device_get(jax.device_put(jnp.ones((8, 128))) + 1)
    t_init = round(time.perf_counter() - t0, 2)
    report = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "t_device_init_s": t_init,
        "cases": [],
    }

    report["cases"].append(_run_case(
        "toy_rna_affine_ms1", G.TOY_RNA, G.TOY_RNA_AFFINE_PARAMS,
        G.TOY_RNA_AFFINE_SCORE, G.TOY_RNA_AFFINE_DEFAULT_OUT, engine,
    ))
    report["cases"].append(_run_case(
        "toy_rna_nonaffine_ms2", G.TOY_RNA, G.TOY_RNA_NONAFFINE_PARAMS,
        G.TOY_RNA_NONAFFINE_SCORE, G.TOY_RNA_NONAFFINE_DEFAULT_OUT, engine,
    ))
    report["cases"].append(_run_case(
        "toy_protein_affine_sorted", G.TOY_PROTEIN, G.TOY_PROTEIN_PARAMS,
        G.TOY_PROTEIN_SCORE, G.TOY_PROTEIN_SORTED_OUT, engine,
    ))
    mol, params = _dnapol_prefix_case()
    report["cases"].append(_run_case(
        "dnapol_prefix150_affine", mol, params, 117180, None, engine,
    ))
    report["cases"].append(_run_conveyor_codes_case())
    report["cases"].append(_run_dnapol_full(engine))

    report["ok"] = all(c["ok"] for c in report["cases"])
    report["t_total_s"] = round(time.perf_counter() - t_start, 1)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
