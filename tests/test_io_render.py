"""I/O readers and rendering utilities."""

import numpy as np
import pytest

import golden as G
from bialign_tpu.data import example_path, example_text
from bialign_tpu.io.cfssp import read_molecule, read_molecule_from_file
from bialign_tpu.io.simmatrix import read_simmatrix
from bialign_tpu.render.plot import breaklines, runs, fourway_from_full


# -- CFSSP ----------------------------------------------------------------

def test_cfssp_reference_examples():
    seq, struc = read_molecule_from_file(
        example_path("DNAPolymerase1_Escherichia.cfssp"), "Protein"
    )
    assert len(seq) == len(struc) == 928
    seq2, struc2 = read_molecule_from_file(
        example_path("DNAPolymerase1_Xanthomonas.cfssp"), "Protein"
    )
    assert len(seq2) == len(struc2) == 933


def test_cfssp_rejects_rna():
    with pytest.raises(IOError, match="Cannot read files of type RNA"):
        read_molecule("Query 1 ACDE 4", "RNA")


def test_cfssp_rejects_unequal():
    txt = "Query 1 ACDE 4\nStruc 1 HHH 3"
    with pytest.raises(IOError, match="unequal length"):
        read_molecule(txt, "Protein")


def test_cfssp_rejects_empty():
    with pytest.raises(IOError, match="does not contain"):
        read_molecule("nothing here", "Protein")


def test_cfssp_rejects_bad_field_count():
    with pytest.raises(IOError, match="Cannot parse"):
        read_molecule("Query 1 ACDE", "Protein")


# -- simmatrix ------------------------------------------------------------

def test_blosum62_embedded_matches_data_file():
    import os

    emb = read_simmatrix("BLOSUM62")
    ref_file = "/root/reference/Data/BLOSUM62.txt"
    if os.path.exists(ref_file):       # optional cross-check vs reference
        fil = read_simmatrix(ref_file)
        assert emb.keys() == fil.keys()
        for k in emb:
            assert emb[k] == fil[k]
    assert emb["A"]["A"] == 400           # 4 * scale 100
    assert emb["W"]["W"] == 1100
    assert emb["A"]["R"] == -100


def test_bundled_examples_match_reference_when_present():
    """The gzipped package data must byte-match the reference inputs."""
    import os

    ref_dir = "/root/reference/Examples"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not mounted")
    from bialign_tpu.data import EXAMPLES

    for name in EXAMPLES:
        with open(os.path.join(ref_dir, name)) as fh:
            assert example_text(name) == fh.read()


def test_simmatrix_scale():
    m = read_simmatrix("BLOSUM62", scale=10)
    assert m["A"]["A"] == 40


# -- render helpers -------------------------------------------------------

def test_breaklines():
    ali = [("A", "abcdefgh"), ("B", "12345678")]
    blocks = breaklines(ali, 3)
    assert blocks == [
        [("A", "abc"), ("B", "123")],
        [("A", "def"), ("B", "456")],
        [("A", "gh"), ("B", "78")],
    ]


def test_runs():
    assert list(runs("HHEEC")) == [("H", 0, 2), ("E", 2, 4), ("C", 4, 5)]
    assert list(runs("")) == []
    assert list(runs("A")) == [("A", 0, 1)]


def test_fourway_from_full_and_plot_smoke(tmp_path):
    from bialign_tpu import BiAligner
    from bialign_tpu.render.plot import plot_alignment

    ba = BiAligner(
        G.TOY_PROTEIN["seqA"], G.TOY_PROTEIN["seqB"],
        G.TOY_PROTEIN["strA"], G.TOY_PROTEIN["strB"],
        engine="numpy", **G.TOY_PROTEIN_PARAMS,
    )
    ba.optimize()
    full = ba.decode_trace_full()
    four = fourway_from_full(full)
    assert [name for name, _ in four] == [
        "A", "B", "A ss", "B ss", "A shifts", "B shifts"
    ]

    pytest.importorskip("matplotlib")
    out = tmp_path / "ali.svg"
    plot_alignment(full, 60, outname=str(out))
    assert out.exists() and out.stat().st_size > 0
