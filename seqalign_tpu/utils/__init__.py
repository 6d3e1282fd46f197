"""Host-side utilities: FASTA IO, batch packing, timing."""

from .fasta import SeqRecord, read_fasta, read_first
from .packing import PackedBatch, lattice_round_up, pack_encoded

__all__ = [
    "PackedBatch",
    "SeqRecord",
    "lattice_round_up",
    "pack_encoded",
    "read_fasta",
    "read_first",
]
