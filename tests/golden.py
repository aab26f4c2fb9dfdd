"""Shared golden inputs/outputs (verified against the reference; SURVEY.md §8).

The expected strings come from the reference README (README.md:81-152) and
from runs of a de-Cythonized copy of the reference recorded in SURVEY.md §8;
scores are exact integers of the DP.
"""

TOY_RNA = dict(
    seqA="GCGGGGGAUAUCCCCAUCG",
    seqB="GGGGAUAUCCCCAUCG",
    strA="...(((.....))).....",
    strB=".(((.....)))....",
)

# README.md:81-103 — affine parameters
TOY_RNA_AFFINE_PARAMS = dict(
    type="RNA",
    structure_weight=400,
    gap_opening_cost=-200,
    gap_cost=-50,
    max_shift=1,
    shift_cost=-150,
)
TOY_RNA_AFFINE_SCORE = 6800
TOY_RNA_AFFINE_DEFAULT_OUT = [
    "A               GCGGGGGAUAUCCCC-AUCG",
    "B               G---GGGAUAUCCCC-AUCG",
    "A ss            ...-(((.....))).....",
    "B ss            .---(((.....)))-....",
    "A shifts        ...<...........>....",
    "B shifts        ....................",
]

# SURVEY.md §8 — same toy RNA, affine, outmode full (all 14 rows)
TOY_RNA_AFFINE_FULL_OUT = [
    "A ss            ...(((.....))).-....",
    "A               GCGGGGGAUAUCCCC-AUCG",
    "B ss            .---(((.....)))-....",
    "B               G---GGGAUAUCCCC-AUCG",
    "consensus ss    ....................",
    "consensus       G...GGGAUAUCCCC-AUCG",
    "A ss            ...-(((.....))).....",
    "A               GCG-GGGGAUAUCCCCAUCG",
    "B ss            .---(((.....)))-....",
    "B               G---GGGAUAUCCCC-AUCG",
    "consensus ss    ....[[[.....]]].....",
    "consensus       G..-GGG.....CCC.AUCG",
    "A shifts        ...<...........>....",
    "B shifts        ....................",
]

# SURVEY.md §8 — toy RNA at CLI defaults (non-affine)
TOY_RNA_NONAFFINE_PARAMS = dict(type="RNA")
TOY_RNA_NONAFFINE_SCORE = 6300
TOY_RNA_NONAFFINE_DEFAULT_OUT = [
    "A               GCGGGGGAUAUCCCCAUCG",
    "B               --GGGGAUAUCCCC-AUCG",
    "A ss            ...(((.....))).....",
    "B ss            --.(((.....)))-....",
    "A shifts        ...................",
    "B shifts        ...................",
]

# README.md:117-152 — toy protein, affine, BLOSUM62, outmode sorted
TOY_PROTEIN = dict(
    seqA="RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYARFR",
    seqB="KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAYFR",
    strA="CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEECCC",
    strB="HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEECC",
)
TOY_PROTEIN_PARAMS = dict(
    type="Protein",
    shift_cost=-150,
    structure_weight=800,
    simmatrix="BLOSUM62",
    gap_opening_cost=-150,
    gap_cost=-50,
    max_shift=1,
    outmode="sorted",
)
TOY_PROTEIN_SCORE = 48500
TOY_PROTEIN_SORTED_OUT = [
    "A ss            -CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEEC-CC",
    "A               -RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYAR-FR",
    "consensus       -.AKLPLKEKKLT.TANYHPGIRYIMTGYSAK.IYSSTYA.-FR",
    "B               -KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAY-FR",
    "B ss            -HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEE-CC",
    "consensus ss    -.HHHHHHHHHHH..CCCCTCEEEEEEECC.C.EEEEEEE.-CC",
    "",
    "A               RAKLPLKEKKLTA-TANYHPGIRYIMTGYSAK-YIYSSTYARFR",
    "A ss            CHHHHHHHHHHHH-HCCCCTCEEEEEEECCTC-EEEEEEEECCC",
    "consensus ss    .HHHHHHHHHHHH..CCCCTCEEEEEEECC.C.EEEEEEEE.CC",
    "B ss            -HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEE-CC",
    "B               -KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAY-FR",
    "consensus       .........K....TANYHPGIRYIMTGYSAK....S.....FR",
    "",
    "A shifts        >............<..................<........>..",
    "B shifts        ............................................",
]
