"""README walkthrough — the script counterpart of the reference's
``Notebooks/example.ipynb``: both toy examples through the Python API,
with the expected golden outputs asserted.

Run: python examples/readme_walkthrough.py [engine]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bialign_tpu import BiAligner

engine = sys.argv[1] if len(sys.argv) > 1 else "auto"

# -- toy RNA (README.md:81-103): expect SCORE 6800 ------------------------
ba = BiAligner(
    "GCGGGGGAUAUCCCCAUCG", "GGGGAUAUCCCCAUCG",
    "...(((.....))).....", ".(((.....)))....",
    engine=engine,
    type="RNA", structure_weight=400, gap_opening_cost=-200,
    gap_cost=-50, max_shift=1, shift_cost=-150,
)
score = ba.optimize()
print("SCORE:", score)
assert score == 6800
for line in ba.decode_trace():
    print(line)
print()

# -- toy protein (README.md:117-152): expect SCORE 48500 ------------------
ba = BiAligner(
    "RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYARFR",
    "KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAYFR",
    "CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEECCC",
    "HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEECC",
    engine=engine,
    type="Protein", shift_cost=-150, structure_weight=800,
    simmatrix="BLOSUM62", gap_opening_cost=-150, gap_cost=-50,
    max_shift=1, outmode="sorted",
)
score = ba.optimize()
print("SCORE:", score)
assert score == 48500
for line in ba.decode_trace():
    print(line)
