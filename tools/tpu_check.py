"""On-hardware validation: compiled Pallas kernel vs XLA engine vs config grid.

Run on a TPU host: ``python tools/tpu_check.py``. Exercises the production
kernel configurations (choose_config over representative query lengths),
checks score equality against the wavefront engine, and reports sustained
GCUPS per configuration. This is the hardware half of the kernel test
strategy (the logic half is tests/test_pallas.py in interpret mode).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0

    from seqalign_tpu.ops.swa_pallas import choose_config, sw_pallas_windows
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    failures = 0
    for lq in (64, 144, 256, 384, 512, 768):
        nw, ic = choose_config(lq)
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        db = rng.integers(1, 27, (nw, 256, 1024)).astype(np.int32)
        a = np.asarray(sw_pallas_windows(prof, db, -3, -1, nw=nw, ic=ic))
        want = np.concatenate(
            [np.asarray(sw_wavefront(prof, db[w], -3, -1)) for w in range(nw)]
        )
        ok = bool((a == want).all())
        if not ok:
            failures += 1
        dj = jax.device_put(
            rng.integers(1, 27, (nw, 8192, 1024)).astype(np.int32)
        )
        pj = jax.device_put(prof)
        r = sw_pallas_windows(pj, dj, -3, -1, nw=nw, ic=ic)
        r.block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            r = sw_pallas_windows(pj, dj, -3, -1, nw=nw, ic=ic)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        gcups = lq * 8192 * nw * 1024 / dt / 1e9
        print(
            f"lq={lq:4d} nw={nw} ic={ic:4d}: exact={ok}  {gcups:6.0f} GCUPS"
        )
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
