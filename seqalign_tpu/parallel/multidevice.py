"""Multi-device (single-host) database search: data parallelism over records.

The production scale-out path for throughput workloads. A database scan has
zero cross-record dependencies, so the right multi-chip decomposition is
pure data parallelism: deal record chunks to devices, run the segmented
stream kernel per device (each chip scores its own shard in one dispatch),
and concatenate scores on the host — no collectives in the scoring path at
all. Collectives appear only for top-k reduction (``sharding.sharded_topk``)
or cross-host merges (``multihost``).

This replaces the reference's OpenMP thread pool (``src/alignment_cmdline.c:
504-507``) at chip granularity: OpenMP's dynamic scheduling balances
variable-length batches across cores; here the length-sorted round-robin
deal balances residues across chips ahead of time (within one lane-group).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np


def deal_chunks(order: np.ndarray, lengths: np.ndarray, n_devices: int, win: int = 1024):
    """Deal lane-groups of sorted records to devices, balancing residues.

    ``order`` must be length-sorted descending. Groups of ``win`` records go
    to the device with the least residues so far (greedy — groups arrive in
    descending size, the classic LPT schedule).
    """
    totals = [0] * n_devices
    chunks: list[list[np.ndarray]] = [[] for _ in range(n_devices)]
    for start in range(0, len(order), win):
        ids = order[start : start + win]
        d = min(range(n_devices), key=totals.__getitem__)
        chunks[d].append(ids)
        totals[d] += int(lengths[ids].sum())
    return [
        np.concatenate(c) if c else np.zeros(0, dtype=order.dtype)
        for c in chunks
    ]


def multi_device_search(
    profile: np.ndarray,
    db,
    go: int,
    ge: int,
    devices: Sequence | None = None,
    engine_fn: Callable | None = None,
    win: int = 1024,
) -> tuple[np.ndarray, float]:
    """Score a query (or stacked queries) across all local devices.

    Args:
      profile: (Lq, 32) or (NQ, Lq, 32) int query profile(s).
      db: EncodedDatabase.
      engine_fn: optional override ``fn(profile_dev, streams_dev, fs_dev)``
        per device (tests substitute an interpret-mode kernel); default is
        the AOT-compiled segmented stream kernel.

    Returns (scores in stream order — (N,) or (NQ, N) — and kernel seconds).
    All devices' dispatches are enqueued before any result is fetched, so
    device execution overlaps; the timed region covers dispatch to last
    fetch (packing and host->device transfer excluded, the reference's own
    timing boundary, ``src/alignment_cmdline.c:503-509``).
    """
    import jax

    from ..ops.swa_pallas import choose_config, sw_pallas_stream
    from ..utils.packing import pack_streams

    devices = list(jax.devices() if devices is None else devices)
    if engine_fn is None and jax.default_backend() != "tpu":
        # Off-TPU (CPU meshes, tests, multi-host CPU validation) the
        # compiled Pallas kernel is unavailable: interpret mode keeps the
        # same code path, scores identical.
        import functools

        engine_fn = functools.partial(sw_pallas_stream, interpret=True)
    multi = profile.ndim == 3
    nq = profile.shape[0] if multi else 1
    lq = int(profile.shape[-2])
    n = db.n
    scores = np.zeros((nq, n) if multi else n, dtype=np.int32)
    if n == 0:
        return scores, 0.0

    lengths = db.lengths
    order = np.argsort(-lengths, kind="stable")
    chunks = deal_chunks(order, lengths, len(devices), win=win)
    chunks = [c for c in chunks if len(c)]

    # One compiled kernel serves every device: all shards share one config
    # (worst-case slot count) and pack to one common stream length
    # (pack_streams target_len; '*' tail padding is score-invariant), so
    # the AOT compile below happens once, not once per device.
    nslots = max(-(-len(c) // win) for c in chunks)
    reserve = nslots * nq * 4096 + (1 << 20)
    pmax = float(
        np.max(np.abs(np.asarray(profile, np.float64) - go))
    ) if np.asarray(profile).size else 0.0
    for allow_pack in (True, False):
        cfg = choose_config(
            lq, reserve=reserve, nq=nq, nw_max=max(1, nslots),
            max_abs_bias=pmax if allow_pack else None,
        )
        if cfg is None:
            raise ValueError("query too long for the stream kernel's VMEM")
        packs = [
            pack_streams(db, chunk, cfg.nw, win=win, jb=cfg.jb, grain=16)
            for chunk in chunks
        ]
        target = max(p.streams.shape[1] for p in packs)
        packs = [
            p
            if p.streams.shape[1] == target
            else pack_streams(
                db, chunk, cfg.nw, win=win, jb=cfg.jb, grain=16,
                target_len=target,
            )
            for p, chunk in zip(packs, chunks)
        ]

        work = []
        try:
            for dev, pack in zip(devices, packs):
                # fs slot tables are per-shard but shapes agree; pad every
                # shard's output to the common nslots (extra slots never
                # flush). Identical shapes mean each device's AOT compile is
                # a compilation-cache hit (executables are device-bound).
                s_dev = jax.device_put(pack.streams, dev)
                f_dev = jax.device_put(pack.fs, dev)
                p_dev = jax.device_put(np.asarray(profile), dev)
                jax.block_until_ready([s_dev, f_dev, p_dev])
                kw = dict(
                    nslots=nslots, nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
                    ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack, upk=cfg.upk,
                )
                if engine_fn is None:
                    from ..pipeline import _EXEC_CACHE

                    key = (
                        "mdev", str(dev), p_dev.shape, s_dev.shape,
                        f_dev.shape, int(go), int(ge),
                        tuple(sorted(kw.items())),
                    )
                    run = _EXEC_CACHE.get(key)
                    if run is None:
                        run = sw_pallas_stream.lower(
                            p_dev, s_dev, f_dev, go, ge, **kw
                        ).compile()
                        # Warm untimed: the first execution of a freshly
                        # loaded program pays device-side load/finalize
                        # (see pipeline._stream_search).
                        np.asarray(run(p_dev, s_dev, f_dev))
                        _EXEC_CACHE[key] = run
                    work.append(
                        (pack, lambda r=run, a=(p_dev, s_dev, f_dev): r(*a))
                    )
                else:
                    work.append(
                        (
                            pack,
                            lambda a=(p_dev, s_dev, f_dev), kw=kw: engine_fn(
                                *a, go, ge, **kw
                            ),
                        )
                    )
        except Exception as ex:
            if allow_pack and cfg.pack > 1:
                # Same degrade as the single-chip pipeline: a Mosaic
                # failure on the packed shape retries pack=1 at the same
                # window count before anything dies.
                import sys

                print(
                    f"Warning: packed stream kernel (pack={cfg.pack}) "
                    f"compile failed on multi-device path "
                    f"({type(ex).__name__}: {str(ex)[:160]}); retrying "
                    "without packed production.",
                    file=sys.stderr,
                )
                continue
            raise
        break

    t0 = time.perf_counter()
    outs = [run() for _, run in work]  # enqueue on every device first
    outs = [np.asarray(o) for o in outs]
    kernel_time = time.perf_counter() - t0

    for (pack, _), out in zip(work, outs):
        for slot, ids in enumerate(pack.slot_ids):
            if multi:
                scores[:, ids] = out[slot, :, : len(ids)]
            else:
                scores[ids] = out[slot][: len(ids)]
    return scores, kernel_time
