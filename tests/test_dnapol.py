"""DNA-Polymerase-1 CFSSP example: file-input path + long-protein anchor.

SCORE anchors measured from the reference algorithm (SURVEY.md §8 /
BASELINE.md): prefix-150 with gap -200/-50, shift -210, sw 800, ms 1
scores 117180.
"""

from pathlib import Path

import pytest

from bialign_tpu import BiAligner
from bialign_tpu.io.cfssp import read_molecule_from_file

EXAMPLES = Path("/root/reference/Examples")

PARAMS = dict(
    type="Protein",
    shift_cost=-210,
    structure_weight=800,
    simmatrix="BLOSUM62",
    gap_opening_cost=-200,
    gap_cost=-50,
    max_shift=1,
)


@pytest.fixture(scope="module")
def dnapol():
    seqA, strA = read_molecule_from_file(
        str(EXAMPLES / "DNAPolymerase1_Escherichia.cfssp"), "Protein"
    )
    seqB, strB = read_molecule_from_file(
        str(EXAMPLES / "DNAPolymerase1_Xanthomonas.cfssp"), "Protein"
    )
    return seqA, seqB, strA, strB


def test_cfssp_lengths(dnapol):
    seqA, seqB, strA, strB = dnapol
    assert len(seqA) == len(strA) == 928
    assert len(seqB) == len(strB) == 933


def test_dnapol_prefix150_score(dnapol):
    seqA, seqB, strA, strB = dnapol
    ba = BiAligner(
        seqA[:150], seqB[:150], strA[:150], strB[:150],
        engine="xla", **PARAMS,
    )
    assert ba.optimize() == 117180
    # property check: re-scoring the decoded trace reproduces the score
    lines = list(ba.eval_trace())
    assert lines[-1].split(" --> ")[-1] == "117180"
