"""Recorded ViennaRNA-API fixture for the RNA-no-structure branch.

The reference's primary RNA path (bialignment.pyx:347-353) calls the
ViennaRNA bindings: ``fc = RNA.fold_compound(seq)``, ``fc.mfe()``,
``fc.pf()`` (ensemble structure string), ``fc.bpp()`` (upper-triangular
(n+1)x(n+1) base-pair probabilities).  ViennaRNA is not installed in CI,
so this module provides a fake ``RNA`` module with RECORDED return values
for the two toy sequences, letting tests pin the branch's behaviour
(models/molecule.py:119-125) without the C library.

The numbers are hand-authored stand-ins with the exact API *shape* of the
real bindings — upper-triangular tuple-of-tuples bpp, ``(string, energy)``
from mfe()/pf() — not real Turner-model outputs.  The pf ensemble strings
deliberately use the ViennaRNA pf alphabet (``,{}|``), characters the
built-in fallback (scoring/fold.py + mea) never emits, so any accidental
re-route through the fallback path changes the golden output and fails.
"""

from __future__ import annotations

import sys
import types


def _bpp_matrix(n: int, pairs: dict) -> tuple:
    """Upper-triangular (n+1)x(n+1) tuple-of-tuples, 1-based like ViennaRNA."""
    rows = []
    for i in range(n + 1):
        rows.append(tuple(
            pairs.get((i, j), 0.0) if j > i else 0.0
            for j in range(n + 1)
        ))
    return tuple(rows)


# Recorded fold results, keyed by exact sequence.
RECORDS = {
    # toy RNA seqA (README.md:82), n = 19; helix 4-14 / 5-13 / 6-12
    "GCGGGGGAUAUCCCCAUCG": {
        "mfe": ("...(((.....))).....", -3.2),
        "pf": ("..,{{{.....}}},....", -3.9),
        "bpp": _bpp_matrix(19, {
            (4, 14): 0.91, (5, 13): 0.94, (6, 12): 0.89,
            (3, 15): 0.04, (7, 11): 0.03, (2, 17): 0.01,
        }),
    },
    # toy RNA seqB, n = 16; helix 2-12 / 3-11 / 4-10
    "GGGGAUAUCCCCAUCG": {
        "mfe": (".(((.....)))....", -2.8),
        "pf": (".{{{.....}}},...", -3.1),
        "bpp": _bpp_matrix(16, {
            (2, 12): 0.92, (3, 11): 0.95, (4, 10): 0.90,
            (1, 13): 0.03, (5, 9): 0.02,
        }),
    },
}


class _FoldCompound:
    """API twin of ``RNA.fold_compound`` backed by the records above."""

    def __init__(self, seq):
        if seq not in RECORDS:
            raise KeyError(f"no recorded fold for sequence {seq!r}")
        self._rec = RECORDS[seq]

    def mfe(self):
        return self._rec["mfe"]

    def pf(self):
        return self._rec["pf"]

    def bpp(self):
        return self._rec["bpp"]


def install_fake_rna(monkeypatch):
    """Install the fixture as the importable ``RNA`` module."""
    mod = types.ModuleType("RNA")
    mod.fold_compound = _FoldCompound
    monkeypatch.setitem(sys.modules, "RNA", mod)
    return mod
