"""Golden test of the ViennaRNA RNA-no-structure branch via a recorded
API fixture (tests/vienna_fixture.py).

Pins the reference path bialignment.pyx:347-353 as rebuilt in
models/molecule.py:119-125: ``fold_compound(seq)`` → ``mfe()``, ``pf()``
(ensemble string becomes the molecule structure), ``bpp()`` →
``symmetrize_bpps`` → up/down/unp pairing vectors → the stral-like RNA
mu2.  The expected score/lines below were computed once from the recorded
fixture values and must never drift.
"""

import sys

sys.path.insert(0, "tests")

from vienna_fixture import RECORDS, install_fake_rna  # noqa: E402

PARAMS = dict(
    type="RNA", structure_weight=400, gap_opening_cost=-200,
    gap_cost=-50, max_shift=1, shift_cost=-150,
)
SEQA = "GCGGGGGAUAUCCCCAUCG"
SEQB = "GGGGAUAUCCCCAUCG"

# Golden output under the recorded fixture (computed 2026-08-20, engine
# cross-checked numpy == xla).  The ``,{}`` characters come from the
# recorded pf ensemble strings — proof the ViennaRNA branch (not the
# built-in fallback) produced the structures.
GOLD_SCORE = 6790
GOLD_LINES = [
    "A               GCGGGGGAUAUCCCCAU-CG",
    "B               ---GGGGAUAUCCCCAU-CG",
    "A ss            ..-,{{{.....}}},....",
    "B ss            ---.{{{.....}}},.-..",
    "A shifts        ..<..............>..",
    "B shifts        ....................",
]


def _align(engine):
    from bialign_tpu import BiAligner

    ba = BiAligner(SEQA, SEQB, None, None, engine=engine, **PARAMS)
    score = ba.optimize()
    return ba, score, list(ba.decode_trace())


def test_vienna_branch_golden(monkeypatch):
    install_fake_rna(monkeypatch)
    ba, score, lines = _align("numpy")
    assert score == GOLD_SCORE
    assert lines == GOLD_LINES
    # the molecule took the ViennaRNA path: pf string is the structure,
    # mfe/pf results are stored (pyx:349-352)
    assert ba.molA["structure"] == RECORDS[SEQA]["pf"][0]
    assert ba.molB["structure"] == RECORDS[SEQB]["pf"][0]
    assert ba.molA["mfe"] == RECORDS[SEQA]["mfe"]
    assert ba.molA["pf"] == RECORDS[SEQA]["pf"]


def test_vienna_branch_engines_agree(monkeypatch):
    install_fake_rna(monkeypatch)
    _, score, lines = _align("xla")
    assert score == GOLD_SCORE
    assert lines == GOLD_LINES


def test_vienna_branch_cli(monkeypatch, capsys):
    """Expected CLI output for the RNA-no-structure invocation."""
    install_fake_rna(monkeypatch)
    from bialign_tpu import cli

    rc = cli.main([
        SEQA, SEQB, "--type", "RNA", "--structure_weight", "400",
        "--gap_opening_cost", "-200", "--gap_cost", "-50",
        "--max_shift", "1", "--shift_cost", "-150", "--engine", "numpy",
    ])
    out = capsys.readouterr().out
    assert rc in (None, 0)
    assert f"SCORE: {GOLD_SCORE}" in out
    for line in GOLD_LINES:
        assert line in out


def test_fixture_pf_alphabet_is_not_fallback():
    """The recorded pf strings use ViennaRNA's ensemble alphabet, which the
    built-in fallback (mea over scoring/fold.py bpp) cannot emit — so the
    golden lines above can only come from the ViennaRNA branch."""
    for rec in RECORDS.values():
        assert any(c in rec["pf"][0] for c in ",{}|")
