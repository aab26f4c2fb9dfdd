"""Built-in RNA partition function: probability sanity + end-to-end path."""

import numpy as np
import pytest

from bialign_tpu.scoring.fold import partition_bpp, predict_structure
from bialign_tpu.scoring.structure import parse_dotbracket


def test_bpp_is_probability_matrix():
    seq = "GGGAAAACCC"
    sbpp = partition_bpp(seq)
    n = len(seq)
    assert sbpp.shape == (n + 1, n + 1)
    inner = sbpp[1:, 1:]
    assert np.allclose(inner, inner.T)
    assert (inner >= -1e-12).all()
    # each row: paired probs + unpaired prob == 1
    for i in range(1, n + 1):
        off = sbpp[i, 1:].sum() - sbpp[i, i]
        assert abs(off + sbpp[i, i] - 1.0) < 1e-9
        assert -1e-9 <= sbpp[i, i] <= 1 + 1e-9


def test_hairpin_forms_stem():
    # GGGAAAACCC: the three GC pairs should dominate the ensemble
    sbpp = partition_bpp("GGGAAAACCC")
    assert sbpp[1, 10] > 0.5
    assert sbpp[2, 9] > 0.5
    assert sbpp[3, 8] > 0.5


def test_predict_structure_balanced():
    structure, sbpp = predict_structure("GCGGGGGAUAUCCCCAUCG")
    assert len(structure) == 19
    parse_dotbracket(structure)  # raises on imbalance
    assert "(" in structure


def test_no_pairs_possible():
    sbpp = partition_bpp("AAAA")
    assert np.allclose(np.diag(sbpp)[1:], 1.0)
    structure, _ = predict_structure("AAAA")
    assert structure == "...."


def test_300nt_preprocesses_fast():
    """The vectorized inside/outside must handle corpus-scale RNAs:
    300 nt in well under a second (the round-4 review set <1 s as the
    bar; the pure-Python loops took ~10 s here)."""
    import random
    import time

    rng = random.Random(11)
    seq = "".join(rng.choice("ACGU") for _ in range(300))
    t0 = time.perf_counter()
    sbpp = partition_bpp(seq)
    dt = time.perf_counter() - t0
    inner = sbpp[1:, 1:]
    assert np.allclose(inner, inner.T)
    assert np.allclose(inner.sum(1), 1.0, atol=1e-6)
    assert (inner >= -1e-9).all()
    assert dt < 1.0, f"300-nt partition function took {dt:.2f}s"


def test_rna_without_structure_end_to_end():
    """BiAligner on RNA with NO structures: works standalone (the
    reference requires ViennaRNA here)."""
    pytest.importorskip("numpy")
    try:
        import RNA  # noqa: F401
        has_vienna = True
    except ImportError:
        has_vienna = False
    if has_vienna:
        pytest.skip("ViennaRNA present; fallback path not taken")

    from bialign_tpu import BiAligner

    ba = BiAligner(
        "GCGGGGGAUAUCCCCAUCG", "GGGGAUAUCCCCAUCG", None, None,
        engine="numpy", type="RNA", structure_weight=400,
        gap_opening_cost=-200, gap_cost=-50, max_shift=1, shift_cost=-150,
    )
    score = ba.optimize()
    lines = list(ba.decode_trace())
    assert len(lines) == 6
    assert lines[0][16:].replace("-", "") == "GCGGGGGAUAUCCCCAUCG"
