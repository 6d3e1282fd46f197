"""Multi-chip scaling measurement hook for multi_device_search.

Weak-scaling harness: a fixed per-device workload (records drawn from the
same length distribution) is dealt to 1, 2, 4, ... N local devices; for each
device count we measure the dispatch-to-last-fetch time of
``multi_device_search`` and report efficiency = t(1) / t(N) (ideal 1.0 for
weak scaling) plus the per-device residue skew of the LPT deal.

On real multi-chip TPU hardware this measures the >=90%-linear-scaling
north-star claim directly. On a single host with virtual CPU devices
(``--xla_force_host_platform_device_count``) all devices share the same
cores, so the efficiency number reflects orchestration overhead only — the
tool prints a caveat in that case. Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_check.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    import jax

    # Honor JAX_PLATFORMS through the config API: the axon TPU plugin's
    # eager registration can override the env var, and with the tunnel
    # down its backend init HANGS instead of erroring — the env route
    # would stall a CPU-only run indefinitely.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    devices = jax.devices()
    backend = jax.default_backend()
    n_max = len(devices)
    virtual = backend != "tpu" or n_max == 1

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.models.alphabet import encode
    from seqalign_tpu.ops.swa_pallas import sw_pallas_stream
    from seqalign_tpu.ops.swa_xla import make_profile
    from seqalign_tpu.parallel.multidevice import deal_chunks, multi_device_search
    from seqalign_tpu.pipeline import _db_from_encoded

    rng = np.random.default_rng(7)
    aa20 = np.array(encode("ACDEFGHIKLMNPQRSTVWY"), dtype=np.int8)
    per_device = 4096 if backend == "tpu" else 2048
    lq = 64 if backend == "tpu" else 13

    q = aa20[rng.integers(0, 20, lq)].astype(np.int32)
    sc = load_builtin(
        "BLOSUM62",
        ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False),
    )
    profile = make_profile(sc.table, q)
    go, ge = sc.gap_open_total, sc.gap_extend

    engine_fn = None
    if backend != "tpu":
        engine_fn = functools.partial(sw_pallas_stream, interpret=True)

    counts = [c for c in (1, 2, 4, 8, 16) if c <= n_max]
    rows = []
    t1 = None
    for nd in counts:
        n = per_device * nd  # weak scaling: workload grows with devices
        mean = 180.0 if backend == "tpu" else 8.0
        lengths = np.clip(
            rng.gamma(1.8, mean / 1.8, n).astype(np.int64), 1, 2000
        )
        encoded = [aa20[rng.integers(0, 20, int(L))] for L in lengths]
        db = _db_from_encoded(encoded)
        # Deal skew: residue balance of the LPT schedule.
        order = np.argsort(-db.lengths, kind="stable")
        chunks = deal_chunks(order, db.lengths, nd)
        totals = [int(db.lengths[c].sum()) for c in chunks if len(c)]
        skew = max(totals) / max(1, min(totals)) if totals else 1.0

        best = None
        for _ in range(3):
            _, dt = multi_device_search(
                profile, db, go, ge, devices=devices[:nd],
                engine_fn=engine_fn,
            )
            best = dt if best is None else min(best, dt)
        if nd == 1:
            t1 = best
        rows.append(
            {
                "devices": nd,
                "records": n,
                "kernel_time_s": round(best, 4),
                "weak_scaling_efficiency": round(t1 / best, 3),
                "residue_skew": round(skew, 4),
            }
        )
        print(f"devices={nd:2d} records={n} t={best:.3f}s "
              f"eff={t1/best:.3f} skew={skew:.4f}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "multi_device_weak_scaling",
                "backend": backend,
                "virtual_devices": virtual,
                "caveat": (
                    "virtual devices share host cores; efficiency reflects "
                    "orchestration overhead, not chip scaling"
                )
                if virtual
                else None,
                "points": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
