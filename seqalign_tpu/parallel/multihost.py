"""Multi-host database search orchestration.

The reference is single-process (SURVEY.md §2 "Parallelism strategies"); its
only coarse parallelism is the OpenMP loop over batches
(``src/alignment_cmdline.c:504-507``). Multi-host scale-out is the TPU-pod
replacement: the FASTA database is striped across hosts (each host reads
only its stripe), every host searches its stripe on its local chips
(:func:`..parallel.multidevice.multi_device_search`, one segmented-stream
dispatch per chip), and the global result is merged over DCN with
``jax.experimental.multihost_utils.process_allgather`` — either the full
score vector (small: 4 B/record) or per-host top-k candidate sets.

:func:`multihost_search` is the runnable driver; the 2-process CPU test
(``tests/test_multihost.py``) launches real coordinator+worker processes
and asserts score equality with the single-process run.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

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


def multihost_search(
    query_idx: np.ndarray,
    db_path: str,
    scoring,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    k: int | None = None,
    engine_fn: Callable | None = None,
    db_cache: str | None = None,
) -> tuple[np.ndarray, float] | tuple[np.ndarray, np.ndarray, float]:
    """Search one query against a FASTA database striped across hosts.

    Every participating process calls this with the same arguments (plus its
    own ``process_id``). Each host reads only its round-robin stripe of the
    database, scores it across its local chips, and the results merge over
    DCN:

    - ``k is None``: all-gather every stripe's scores (4 B/record — cheap up
      to ~10^9 records) and return the FULL global score vector, identical
      on every host, in database stream order. Returns ``(scores, kernel_s)``.
    - ``k`` set: all-gather only per-host top-k candidates (bandwidth
      O(k * hosts)) and return ``(values, record_ids, kernel_s)`` — the
      scalable path for huge scans.

    The TPU replacement for the reference's OpenMP batch loop
    (``src/alignment_cmdline.c:504-507``) at pod scale. ``engine_fn`` is
    forwarded to :func:`..parallel.multidevice.multi_device_search` (tests
    substitute the interpret-mode stream kernel on CPU).
    """
    import jax

    from ..models.alphabet import encode
    from ..ops.swa_xla import make_profile
    from ..utils.fasta import read_fasta
    from .multidevice import multi_device_search

    init_distributed(coordinator_address, num_processes, process_id)
    pid = jax.process_index()
    nproc = jax.process_count()

    # Read only this host's stripe; record global stream positions.
    # With db_cache, the stripe comes as zero-copy views of the mmapped
    # .sqc — a cold multi-host start otherwise re-parses the WHOLE FASTA
    # on every host just to keep 1/nproc of it.
    encoded: list[np.ndarray] = []
    gids: list[int] = []
    n_total = 0
    if db_cache is not None:
        from ..utils.native_io import parse_file_cached

        full = parse_file_cached(db_path, db_cache)
        n_total = full.n
        for i in range(pid, n_total, nproc):
            encoded.append(full.record(i))
            gids.append(i)
    else:
        for i, rec in enumerate(read_fasta(db_path)):
            n_total = i + 1
            if i % nproc == pid:
                encoded.append(encode(rec.seq))
                gids.append(i)

    from ..pipeline import _db_from_encoded

    db = _db_from_encoded(encoded)
    profile = make_profile(scoring.table, query_idx)
    go, ge = scoring.gap_open_total, scoring.gap_extend
    local_scores, kernel_s = multi_device_search(
        profile, db, go, ge, devices=jax.local_devices(),
        engine_fn=engine_fn,
    )
    gid_arr = np.asarray(gids, dtype=np.int64)

    if nproc == 1:
        if k is None:
            return local_scores.astype(np.int32), kernel_s
        vals, ids = merge_topk_candidates(local_scores, gid_arr, k)
        return vals, ids, kernel_s

    from jax.experimental.multihost_utils import process_allgather

    if k is None:
        # Stripes differ by <=1 record: pad to the common width, gather
        # (scores, global ids) from every host, scatter into stream order.
        m = -(-n_total // nproc)
        sc = np.full(m, np.iinfo(np.int32).min, dtype=np.int32)
        ids = np.full(m, -1, dtype=np.int64)
        sc[: db.n] = local_scores
        ids[: db.n] = gid_arr
        all_sc = np.asarray(process_allgather(sc))  # (nproc, m)
        all_ids = np.asarray(process_allgather(ids))
        out = np.zeros(n_total, dtype=np.int32)
        valid = all_ids >= 0
        out[all_ids[valid]] = all_sc[valid]
        return out, kernel_s

    kk = min(k, max(db.n, 1))
    order = np.argsort(-local_scores, kind="stable")[:kk]
    cand_s = np.full(k, np.iinfo(np.int32).min, dtype=np.int32)
    cand_i = np.full(k, -1, dtype=np.int64)
    cand_s[: len(order)] = local_scores[order]
    cand_i[: len(order)] = gid_arr[order]
    all_s = np.asarray(process_allgather(cand_s)).reshape(-1)
    all_i = np.asarray(process_allgather(cand_i)).reshape(-1)
    keep = all_i >= 0
    vals, ids = merge_topk_candidates(all_s[keep], all_i[keep], k)
    return vals, ids, kernel_s
