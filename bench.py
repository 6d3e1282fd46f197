"""Benchmark: one query vs a Swiss-Prot-scale synthetic database.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's headline benchmark (BASELINE.md): a single
protein query scored against a large protein database, kernel-region time
only. The reference's best published configuration sustains 6,978,358
entries/s (565,247 Swiss-Prot entries in 81 ms on a 16-core/64-thread Xeon
Gold 6242; Final Report p.32-33). We report GCUPS and derive vs_baseline
from entries/s against that number on an equivalent workload.

The database is synthetic (the reference's FASTA fixtures are absent from
its snapshot — SURVEY.md §4) but matches Swiss-Prot scale: 565,247 records,
length distribution calibrated to Swiss-Prot (mean ~363, gamma-shaped), and
a 144-residue query.
"""

from __future__ import annotations

import json
import time

import numpy as np

QUERY_LEN = 144
N_ENTRIES = 565_247
BASELINE_ENTRIES_PER_S = 6_978_358.0  # reference best (64 threads, p.32-33)


def synth_db(rng: np.random.Generator, n: int):
    """Swiss-Prot-like length distribution (gamma, mean ~363, min 2)."""
    lengths = np.clip(
        rng.gamma(shape=1.8, scale=202.0, size=n).astype(np.int64), 2, 35_000
    )
    return lengths


def main() -> None:
    import jax

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.ops.swa_xla import make_profile
    from seqalign_tpu.utils.packing import lattice_round_up
    from seqalign_tpu.models.alphabet import PAD_INDEX

    backend = jax.default_backend()
    rng = np.random.default_rng(42)

    sc = load_builtin(
        "PAM250", ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False)
    )
    query = rng.integers(1, 27, QUERY_LEN).astype(np.int32)
    profile = make_profile(sc.table, query)
    go, ge = sc.gap_open_total, sc.gap_extend

    if backend == "tpu":
        from seqalign_tpu.ops.swa_pallas import sw_pallas_multi as engine

        nw, win = 2, 1024
    else:
        from seqalign_tpu.ops.swa_xla import sw_wavefront as engine

        nw, win = 1, 1024
    lanes = nw * win

    n = N_ENTRIES if backend == "tpu" else 20_000
    lengths = np.sort(synth_db(rng, n))[::-1]

    # Build padded lane-batches directly from lengths (content is random;
    # scores are computed over every real residue, padding is '*'). TPU
    # batches are window-stacked (NW, Lb, 1024), the production layout.
    batches = []
    total_residues = int(lengths.sum())
    for start in range(0, n, lanes):
        group = lengths[start : start + lanes]
        lb = lattice_round_up(int(group[0]))
        db = np.full((lb, lanes), PAD_INDEX, dtype=np.int8)
        for lane, L in enumerate(group):
            db[: int(L), lane] = rng.integers(1, 27, int(L), dtype=np.int8)
        if nw > 1:
            db = np.ascontiguousarray(
                db.reshape(lb, nw, win).transpose(1, 0, 2)
            )
        batches.append(db)

    dev_batches = [jax.device_put(b.astype(np.int32)) for b in batches]
    prof_dev = jax.device_put(profile)

    # Warm up compilation for every distinct shape.
    warm = [engine(prof_dev, b, go, ge) for b in dev_batches]
    jax.block_until_ready(warm)
    del warm

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [engine(prof_dev, b, go, ge) for b in dev_batches]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cells = QUERY_LEN * total_residues
    gcups = cells / dt / 1e9
    entries_per_s = n / dt
    # Scale the baseline to this workload size (it is rate-based, so the
    # comparison is entries/s vs entries/s on the same length distribution).
    vs_baseline = entries_per_s / BASELINE_ENTRIES_PER_S

    print(
        json.dumps(
            {
                "metric": "swissprot_scale_search_gcups",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "backend": backend,
                    "entries": n,
                    "entries_per_s": round(entries_per_s),
                    "kernel_time_s": round(dt, 4),
                    "query_len": QUERY_LEN,
                    "db_residues": total_residues,
                    "baseline_entries_per_s": BASELINE_ENTRIES_PER_S,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
