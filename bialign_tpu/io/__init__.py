from .simmatrix import BLOSUM62_TEXT, blosum62, read_simmatrix
from .cfssp import read_molecule, read_molecule_from_file
from .fasta import iter_fasta, read_fasta, read_first_sequence

__all__ = [
    "BLOSUM62_TEXT",
    "blosum62",
    "read_simmatrix",
    "read_molecule",
    "read_molecule_from_file",
    "iter_fasta",
    "read_fasta",
    "read_first_sequence",
]
