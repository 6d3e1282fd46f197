"""seqalign_tpu: TPU-native Smith-Waterman database-search engine.

A from-scratch JAX/Pallas re-design of the capabilities of the reference
AVX2/OpenMP C engine (Aseeef/seq-align-gpu): one-to-many local alignment
(Smith-Waterman with affine gaps, Gotoh formulation), score-exact to the
reference, batched inter-sequence on TPU vector lanes and sharded
data-parallel across chips/hosts.

Layers (mirroring SURVEY.md §1):
  models/   - scoring model, alphabet codec, substitution matrices (L1)
  ops/      - the DP engines: NumPy oracle, XLA paths, Pallas TPU kernel (L2)
  utils/    - FASTA IO, batch packing/bucketing, timing (L0/L3 support)
  parallel/ - device mesh sharding and multi-host search (new capability)
  pipeline  - query-vs-database driver (L3)
  cli       - `smith_waterman`-compatible command line tool (L4)
"""

__version__ = "0.1.0"

from .models import ScoringModel, default_scoring, sw_default_scoring  # noqa: F401
