"""Query-vs-database search driver.

TPU-native equivalent of the reference's ``align_from_query_and_db``
(``src/alignment_cmdline.c:343-539``): stream the query and database FASTA,
encode, pack lane-batches, dispatch the DP engine, and report per-record
scores plus kernel-only timing (the reference times only the OpenMP kernel
region, ``src/alignment_cmdline.c:503-509`` — we time engine dispatch +
device execution, excluding parsing and packing, for the same measurement
boundary).

Differences from the reference (all strictly-better, score-identical):
- the database is actually length-sorted and bucketed (the reference assumes
  pre-sorted input, SURVEY.md §7.3); scores are scattered back to stream
  order;
- partial final batches are padded with all-'*' lanes and masked out (the
  reference reads uninitialized memory for them, SURVEY.md §7.1-7.2);
- scores are int32 (no 16-bit wraparound, SURVEY.md §7.4).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Sequence

import numpy as np

from .models.alphabet import encode
from .models.scoring import ScoringModel
from .utils.fasta import SeqRecord, read_fasta, read_first
from .utils.packing import PackedBatch, pack_encoded


@dataclasses.dataclass
class SearchResult:
    """Scores for one query against a database, in database stream order."""

    query_name: str
    query_seq: str
    names: list[str]
    seqs: list[str]
    scores: np.ndarray  # (N,) int32
    kernel_time: float  # seconds spent in engine dispatch+execution
    total_entries: int


def _default_engine() -> tuple[str, int]:
    """Pick engine and lane width for the current JAX backend."""
    import jax

    if jax.default_backend() == "tpu":
        return "pallas", 4096
    return "wavefront", 512


def get_engine(name: str) -> Callable:
    """Resolve an engine name to fn(profile, db, go, ge) -> scores."""
    if name == "pallas":
        from .ops.swa_pallas import sw_pallas_multi

        return sw_pallas_multi
    if name == "wavefront":
        from .ops.swa_xla import sw_wavefront

        return sw_wavefront
    if name == "scan":
        from .ops.swa_xla import sw_scan

        return sw_scan
    if name == "oracle":
        from .models.alphabet import PAD_INDEX  # noqa: F401
        from .ops import oracle

        def _oracle_engine(profile, db, go, ge, _o=oracle):
            raise RuntimeError(
                "oracle engine is driven via search(..., engine='oracle')"
            )

        return _oracle_engine
    raise KeyError(f"unknown engine {name!r}")


def search_encoded(
    query_idx: np.ndarray,
    encoded_db: Sequence[np.ndarray],
    scoring: ScoringModel,
    engine: str | None = None,
    lanes: int | None = None,
    sort: bool = True,
) -> tuple[np.ndarray, float]:
    """Score an encoded query against encoded database sequences.

    Returns (scores in input order (N,) int32, kernel seconds).
    """
    import jax

    eng_name, eng_lanes = _default_engine()
    if engine is not None:
        eng_name = engine
    if lanes is not None:
        eng_lanes = lanes

    n = len(encoded_db)
    scores = np.zeros(n, dtype=np.int32)
    if n == 0 or len(query_idx) == 0:
        return scores, 0.0

    if eng_name == "oracle":
        from .ops.oracle import sw_score_batch

        t0 = time.perf_counter()
        scores = sw_score_batch(
            query_idx, encoded_db, scoring.table, scoring.gap_open,
            scoring.gap_extend,
        ).astype(np.int32)
        return scores, time.perf_counter() - t0

    from .ops.swa_xla import make_profile

    profile = make_profile(scoring.table, query_idx)
    go, ge = scoring.gap_open_total, scoring.gap_extend
    engine_fn = get_engine(eng_name)

    batches = list(pack_encoded(encoded_db, eng_lanes, sort=sort))
    # Host->device transfers happen outside the timed region (the reference
    # likewise excludes packing/IO from its kernel timer); the timed region
    # then measures engine dispatch + device execution only.
    prof_dev = jax.device_put(profile)
    dev_dbs = [jax.device_put(b.db.astype(np.int32)) for b in batches]
    jax.block_until_ready(dev_dbs)
    t0 = time.perf_counter()
    outs = []
    for db_dev in dev_dbs:
        outs.append(engine_fn(prof_dev, db_dev, go, ge))
    jax.block_until_ready(outs)
    kernel_time = time.perf_counter() - t0

    for batch, out in zip(batches, outs):
        vals = np.asarray(out)[: batch.n_valid]
        scores[batch.record_ids] = vals
    return scores, kernel_time


def search(
    query: SeqRecord,
    db_records: Iterable[SeqRecord],
    scoring: ScoringModel,
    engine: str | None = None,
    lanes: int | None = None,
    sort: bool = True,
) -> SearchResult:
    """Full search: encode, pack, score. Records are kept for output."""
    query_idx = scoring.query_indices(query.seq)
    names, seqs, encoded = [], [], []
    for rec in db_records:
        names.append(rec.name)
        seqs.append(rec.seq)
        encoded.append(encode(rec.seq))
    if not scoring.padding_safe_for_query(query_idx):
        import sys

        print(
            "Warning: query contains characters with positive '*' scores; "
            "padded batches may not be score-invariant (same limitation as "
            "the reference engine).",
            file=sys.stderr,
        )
    scores, kernel_time = search_encoded(
        query_idx, encoded, scoring, engine=engine, lanes=lanes, sort=sort
    )
    return SearchResult(
        query_name=query.name,
        query_seq=query.seq,
        names=names,
        seqs=seqs,
        scores=scores,
        kernel_time=kernel_time,
        total_entries=len(names),
    )


def search_files(
    query_path: str,
    db_path: str,
    scoring: ScoringModel,
    engine: str | None = None,
    lanes: int | None = None,
) -> SearchResult:
    """Search a query FASTA (first record) against a database FASTA."""
    query = read_first(query_path)
    return search(query, read_fasta(db_path), scoring, engine=engine, lanes=lanes)
