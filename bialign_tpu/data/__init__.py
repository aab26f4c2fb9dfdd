"""Bundled example inputs (reference parity: ``Examples/`` + ``Data/``).

The reference package ships its demonstration inputs — the DNA-Polymerase-1
pair as CFSSP (Chou-Fasman server) output and FASTA (reference
setup.py:49-55, Examples/) — so the README walkthrough, benchmarks, and
tests run without any external checkout.  This package bundles the same
public protein records gzip-compressed and materializes them on demand
into a per-process temporary directory, so the repo is fully standalone.

BLOSUM62 is bundled separately as an embedded constant
(:mod:`bialign_tpu.io.simmatrix`).
"""

from __future__ import annotations

import gzip
import os
import tempfile

_DATA_DIR = os.path.dirname(__file__)
_materialized: dict[str, str] = {}

EXAMPLES = (
    "DNAPolymerase1_Escherichia.cfssp",
    "DNAPolymerase1_Xanthomonas.cfssp",
    "DNAPolymerase1_Escherichia.fa",
    "DNAPolymerase1_Xanthomonas.fa",
)


def example_text(name: str) -> str:
    """Contents of a bundled example input file."""
    if name not in EXAMPLES:
        raise KeyError(f"unknown example {name!r}; have {EXAMPLES}")
    with gzip.open(os.path.join(_DATA_DIR, name + ".gz"), "rt") as fh:
        return fh.read()


def example_path(name: str) -> str:
    """Path of a materialized copy of a bundled example input.

    Files are written once per process into a private ``mkdtemp``
    directory (no fixed world-shared paths; see ADVICE r2 on
    ``/tmp/BLOSUM62.txt``).
    """
    if name not in _materialized:
        dirpath = _materialized.get("__dir__")
        if dirpath is None:
            dirpath = tempfile.mkdtemp(prefix="bialign_tpu_examples_")
            _materialized["__dir__"] = dirpath
        path = os.path.join(dirpath, name)
        with open(path, "w") as fh:
            fh.write(example_text(name))
        _materialized[name] = path
    return _materialized[name]
