"""Hardware experiment: packed S production (round 3) + dot-height sweep.

The round-2 study (docs/DESIGN.md) pinned the kernel's wall to the MXU
result-vreg stream: ~2.5 cycles per produced S vreg regardless of program
order or dot granularity. ``pack`` attacks the stream directly — 2 or 4
query rows per dot output (exact f32 field packing, see
ops/swa_pallas.py::_run_block) — and taller chunks (``ic``) reduce dot
count (the round-2 closing lead: dot HEIGHT is what matters).

Usage (TPU host):  python tools/exp_pack.py [--lq 17 144 ...] [--lb 4096]

Prints per config: exactness vs the wavefront engine + best-of-3 GCUPS via
the two-point chained-repetition method (tools/tpu_check.py discipline).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lq", type=int, nargs="*")
    parser.add_argument("--lb", type=int, default=4096)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0

    from tpu_check import timed_gcups

    from seqalign_tpu.ops.swa_pallas import (
        KernelConfig,
        choose_config,
        sw_pallas_windows,
    )
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    lb = args.lb

    def run(lq, cfg):
        # |P'| <= 12 + 4 <= 16 here: safe for pack=4's 31-bound.
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        kw = dict(nw=cfg.nw, jb=cfg.jb, ui=cfg.ui, ic=cfg.ic, pipe=cfg.pipe,
                  pack=cfg.pack)
        db = rng.integers(1, 27, (cfg.nw, 128, 1024)).astype(np.int32)
        try:
            a = np.asarray(sw_pallas_windows(prof, db, -3, -1, **kw))
        except Exception as ex:
            print(f"lq={lq:4d} {cfg}: COMPILE FAIL {str(ex)[:90]}")
            return
        want = np.concatenate(
            [np.asarray(sw_wavefront(prof, db[w], -3, -1))
             for w in range(cfg.nw)]
        )
        ok = bool((a == want).all())
        dj = jax.device_put(
            rng.integers(1, 27, (cfg.nw, lb, 1024)).astype(np.int32)
        )
        pj = jax.device_put(prof)
        jax.block_until_ready([dj, pj])

        def fn(i):
            import jax.numpy as jnp

            p = pj.at[0, 0].add((i % 4).astype(jnp.int32))
            return sw_pallas_windows(p, dj, -3, -1, **kw)

        try:
            g = timed_gcups(fn, lq * lb * cfg.nw * 1024)
        except Exception as ex:
            print(f"lq={lq:4d} {cfg}: TIMING FAIL {str(ex)[:90]}")
            return
        print(f"lq={lq:4d} {cfg}: exact={ok}  {g:6.1f} GCUPS", flush=True)
        return g

    for lq in args.lq or (17, 64, 144, 256, 512):
        base = choose_config(lq)
        print(f"--- lq={lq} (production: {base}) ---", flush=True)
        run(lq, base)
        lqp = -(-lq // 16) * 16
        cands = []
        if lq <= 48:
            # short band: full-query fused dot, packed
            lqe2 = -(-lq // 2) * 2
            lqe4 = -(-lq // 4) * 4
            cands += [
                KernelConfig(nw=5, jb=8, ui=2, ic=lqe2, pipe=6, pack=2),
                KernelConfig(nw=5, jb=8, ui=2, ic=lqe4, pipe=6, pack=4),
                KernelConfig(nw=8, jb=8, ui=2, ic=lqe4, pipe=6, pack=4),
                KernelConfig(nw=8, jb=4, ui=4, ic=lqe4, pipe=6, pack=4),
            ]
        else:
            # mid/long: (2,4,16) fused champion + pack x dot-height grid
            for pack in (2, 4):
                for icm in (16, 32, 64, lqp):
                    ic = min(icm, lqp)
                    if ic % pack or ic % 16:
                        continue
                    cands.append(
                        KernelConfig(nw=2, jb=4, ui=16, ic=ic, pipe=6,
                                     pack=pack)
                    )
                cands.append(
                    KernelConfig(nw=4, jb=4, ui=16, ic=min(32, lqp), pipe=6,
                                 pack=pack)
                )
            # taller unpacked chunks alone (dot-height without packing)
            cands.append(KernelConfig(nw=2, jb=4, ui=16, ic=min(64, lqp),
                                      pipe=6, pack=1))
        seen = set()
        for cfg in cands:
            key = (cfg.nw, cfg.jb, cfg.ui, cfg.ic, cfg.pipe, cfg.pack)
            if key in seen:
                continue
            seen.add(key)
            run(lq, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
