"""Multi-host database search orchestration.

The reference is single-process (SURVEY.md §2 "Parallelism strategies");
multi-host scale-out is a new capability: the FASTA database is striped
across hosts (each host reads only its stripe), every host searches its
stripe on its local chips (via :mod:`.sharding`), and the global result is
merged with a cross-host all-gather of top-k candidates over DCN.

This module is orchestration-only — it contains no device code — and its
merge logic is unit-tested host-locally; the collective path reuses
``sharded_topk`` which the CPU-mesh tests and the multi-chip dry-run compile.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op for single-process runs)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_stripe(records: Iterable, process_id: int, num_processes: int) -> Iterator:
    """Round-robin stripe of a record stream for this host.

    Striping by position (record i belongs to host i % P) keeps every host's
    stripe statistically identical in length distribution, which balances
    padded work without a global sort.
    """
    for i, rec in enumerate(records):
        if i % num_processes == process_id:
            yield rec


def merge_topk_candidates(
    local_scores: np.ndarray,
    local_ids: np.ndarray,
    k: int,
    gathered: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-host (scores, global record ids) candidate sets to top-k.

    ``gathered`` holds other hosts' candidate pairs (from a DCN all-gather,
    e.g. ``jax.experimental.multihost_utils.process_allgather``); ``None``
    means single host.
    """
    scores = [np.asarray(local_scores)]
    ids = [np.asarray(local_ids)]
    for s, i in gathered or []:
        scores.append(np.asarray(s))
        ids.append(np.asarray(i))
    all_s = np.concatenate(scores)
    all_i = np.concatenate(ids)
    order = np.argsort(-all_s, kind="stable")[:k]
    return all_s[order], all_i[order]
