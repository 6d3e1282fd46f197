"""Hardware experiment: packed S production (round 3) + dot-height sweep.

The round-2 study (docs/DESIGN.md) pinned the kernel's wall to the MXU
result-vreg stream: ~2.5 cycles per produced S vreg regardless of program
order or dot granularity. ``pack`` attacks the stream directly — 2 or 4
query rows per dot output (exact f32 field packing, see
ops/swa_pallas.py::_run_block) — and taller chunks (``ic``) reduce dot
count (the round-2 closing lead: dot HEIGHT is what matters).

Cost discipline: ONE jitted program per config (dynamic rep count; the
program also returns the final scores, so exactness vs the CPU wavefront
engine needs no second program). Program loads through the axon tunnel
cost minutes each (pipeline.py _EXEC_CACHE notes) — this is what made the
first sweep attempt 4x too slow.

Usage (TPU host):  python tools/exp_pack.py [--lq 17 144 ...] [--lb 2048]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lq", type=int, nargs="*")
    parser.add_argument("--lb", type=int, default=2048)
    parser.add_argument("--skip-verify", action="store_true")
    parser.add_argument("--best-of", type=int, default=3)
    parser.add_argument(
        "--only-production", action="store_true",
        help="measure only choose_config's production shape per band "
        "(cheap repeat confirmation of adopted winners; skips the "
        "candidate grid)",
    )
    parser.add_argument(
        "--repeat", type=int, default=1,
        help="independent timing repetitions per config (program loads "
        "once; each repeat is a fresh two-point measurement). Adoption "
        "decisions need >=3 (run-to-run spread is ~±6%%, docs/DESIGN.md)",
    )
    parser.add_argument(
        "--upk", default="floor", choices=("floor",),
        help="packed-field extraction scheme: floor is the only mode — "
        "the 'round' variant lost the round-4 hardware A/B and was "
        "pruned in round 5 (swa_pallas.PRODUCTION_UPK note)",
    )
    parser.add_argument(
        "--const-s", action="store_true",
        help="roofline isolation: replace S with a register constant "
        "(no production, no s_buf traffic) - the per-band ALU ceiling "
        "for the same DP loop shape; scores are meaningless, verify off",
    )
    parser.add_argument(
        "--mq", type=int, default=0,
        help="row-stacked multi-query: stack N queries per dispatch "
        "(packed fused production amortizes one-hot + dot overheads "
        "across the stack — the short-query lever)",
    )
    args = parser.parse_args()

    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    # SEQALIGN_PLATFORM=cpu must beat the eagerly-registered TPU plugin
    # (env JAX_PLATFORMS loses to it) so dry-runs exit SKIP instead of
    # hanging on a dead tunnel; same config-API route as the CLI.
    plat = os.environ.get("SEQALIGN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # SEQALIGN_TOOLS_INTERPRET=1 (with SEQALIGN_PLATFORM=cpu) runs the
    # exact tool body in Pallas interpret mode: a CPU pre-flight that
    # catches tool bugs before they burn TPU tunnel compile time. Timing
    # output is meaningless there; the exactness checks are the point.
    interp = os.environ.get("SEQALIGN_TOOLS_INTERPRET") == "1"
    if not interp and jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0
    if interp:
        import functools

        import seqalign_tpu.ops.swa_pallas as _sp

        for _n in ("sw_pallas_stream", "sw_pallas_stream_striped",
                   "sw_pallas_windows"):
            setattr(_sp, _n, functools.partial(getattr(_sp, _n),
                                               interpret=True))

    from seqalign_tpu.ops.swa_pallas import (
        KernelConfig,
        choose_config,
        config_fits_vmem,
        sw_pallas_windows,
    )
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    lb = args.lb
    cpu = jax.devices("cpu")[0]

    def run(lq, cfg, nq=1):
        # |P'| <= 12 + 3 + perturb 3 <= 18: safe for pack=4's 31-bound.
        if nq > 1:
            prof = rng.integers(-8, 12, (nq, lq, 32)).astype(np.int32)
        else:
            prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        kw = dict(nw=cfg.nw, jb=cfg.jb, ui=cfg.ui, ic=cfg.ic, pipe=cfg.pipe,
                  pack=cfg.pack, sdt=cfg.sdt)
        if cfg.pack > 1 and args.upk != "floor":
            kw["upk"] = args.upk
        if args.const_s:
            kw["const_s"] = True
        dbh = rng.integers(1, 27, (cfg.nw, lb, 1024)).astype(np.int32)
        dj = jax.device_put(dbh)
        pj = jax.device_put(prof)
        jax.block_until_ready([dj, pj])

        out_shape = (
            (nq, cfg.nw * 8 * 128) if nq > 1 else (cfg.nw * 8 * 128,)
        )

        @jax.jit
        def chain(reps):
            def body(i, carry):
                acc, _ = carry
                bump = (i % 4).astype(jnp.int32)
                p = (
                    pj.at[:, 0, 0].add(bump) if nq > 1
                    else pj.at[0, 0].add(bump)
                )
                out = sw_pallas_windows(p, dj, -3, -1, **kw)
                return acc + out.reshape(-1)[0], out

            out0 = jnp.zeros(out_shape, jnp.int32)
            return jax.lax.fori_loop(
                0, reps, body, (jnp.zeros((), jnp.int32), out0)
            )

        t0 = time.time()
        try:
            _, out1 = chain(1)
            out1 = np.asarray(out1)  # compile + program load + warm
        except Exception as ex:
            print(f"lq={lq:4d} {cfg}: COMPILE FAIL {str(ex)[:90]}",
                  flush=True)
            return
        load_s = time.time() - t0

        ok = "skipped"
        if not args.skip_verify and not args.const_s:
            # chain(1) perturbed prof[0,0] by 0 % 4 == 0 -> plain profile.
            with jax.default_device(cpu):
                if nq > 1:
                    want = np.stack([
                        np.concatenate([
                            np.asarray(sw_wavefront(prof[q], dbh[w], -3, -1))
                            for w in range(cfg.nw)
                        ])
                        for q in range(nq)
                    ])
                else:
                    want = np.concatenate([
                        np.asarray(sw_wavefront(prof, dbh[w], -3, -1))
                        for w in range(cfg.nw)
                    ])
            ok = bool((out1 == want).all())

        def one(reps):
            t0 = time.perf_counter()
            acc, _ = chain(reps)
            np.asarray(acc)
            return time.perf_counter() - t0

        gs = []
        for rep in range(max(1, args.repeat)):
            t1 = min(one(1) for _ in range(args.best_of))
            t5 = min(one(5) for _ in range(args.best_of))
            dt = max((t5 - t1) / 4, 1e-9)
            g = nq * lq * lb * cfg.nw * 1024 / dt / 1e9
            gs.append(g)
            tag = f" rep{rep + 1}" if args.repeat > 1 else ""
            print(
                f"lq={lq:4d} {cfg}: exact={ok}  {g:6.1f} GCUPS"
                f"  (load {load_s:.0f}s){tag}",
                flush=True,
            )
        if args.repeat > 1:
            med = float(np.median(gs))
            spread = (max(gs) - min(gs)) / med * 100 if med else 0.0
            print(
                f"lq={lq:4d} {cfg}: median {med:6.1f} GCUPS over "
                f"{len(gs)} reps (spread {spread:.1f}%)",
                flush=True,
            )
        return float(np.median(gs))

    if args.mq > 1:
        # Row-stacked multi-query: NQ short queries per dispatch. The
        # packed fused dot amortizes one-hot + per-dot overhead across
        # the whole stack — the lever blocks-of-one can't reach.
        nq = args.mq
        for lq in args.lq or (17, 24, 48):
            base = choose_config(lq, nq=nq, max_abs_bias=18.0)
            print(f"--- mq{nq} lq={lq} (production: {base}) ---", flush=True)
            if base is not None:
                run(lq, base, nq=nq)
            lqe2 = -(-lq // max(2, 2)) * 2
            lqe4 = -(-lq // 4) * 4
            stack2 = nq * lqe2
            stack4 = nq * lqe4
            for cfg in (
                KernelConfig(nw=2, jb=4, ui=2, ic=stack4, pipe=6, pack=4),
                KernelConfig(nw=2, jb=4, ui=2, ic=stack2, pipe=6, pack=2),
                KernelConfig(nw=4, jb=4, ui=2, ic=stack4, pipe=6, pack=4),
                KernelConfig(nw=2, jb=4, ui=2, ic=stack2, pipe=6, pack=1),
                # higher chain counts (ILP lever), VMEM-checked at nq=8
                KernelConfig(nw=2, jb=8, ui=2, ic=stack4, pipe=6, pack=4),
            ):
                if not config_fits_vmem(lq, cfg, nq=nq):
                    print(
                        f"mq{nq} lq={lq:4d} {cfg}: SKIP (exceeds VMEM "
                        "budget)",
                        flush=True,
                    )
                    continue
                run(lq, cfg, nq=nq)
        return 0

    for lq in args.lq or (17, 64, 144, 256, 512):
        base = choose_config(lq, max_abs_bias=18.0)
        print(f"--- lq={lq} (production: {base}) ---", flush=True)
        if base is not None:
            run(lq, base)
        if args.only_production:
            continue
        cands = []
        if lq <= 48:
            # short band: full-query fused dot, packed (lqe rounds to
            # lcm(ui, pack) inside the wrapper; ic=whole padded query)
            lqe2 = -(-lq // 2) * 2
            lqe4 = -(-lq // 4) * 4
            cands += [
                KernelConfig(nw=5, jb=8, ui=2, ic=lqe2, pipe=6, pack=2),
                KernelConfig(nw=5, jb=8, ui=2, ic=lqe4, pipe=6, pack=4),
                # packing shrinks s_buf 4x: spend the freed VMEM on more
                # interleaved chains (the const-S ceiling is ILP-bound)
                KernelConfig(nw=8, jb=8, ui=2, ic=lqe4, pipe=6, pack=4),
                KernelConfig(nw=10, jb=4, ui=2, ic=lqe4, pipe=6, pack=4),
                KernelConfig(nw=4, jb=16, ui=2, ic=lqe4, pipe=6, pack=4),
            ]
        else:
            # lq=144 sweep: packing pays ONLY at full dot height
            # (ic=lqp); taller unpacked dots lose; nw=4 at SMALL ic
            # loses. Focused grid for the remaining bands, plus
            # full-height shapes with more (nw*jb) register chains: the
            # const-S ceiling is ILP-bound (469 at 32 chains vs 315 at 8,
            # docs/DESIGN.md), and pack=4 full-height frees the VMEM the
            # extra windows need.
            lqp4 = -(-lq // 16) * 16
            cands += [
                KernelConfig(nw=2, jb=4, ui=16, ic=lqp4, pipe=6, pack=4),
                KernelConfig(nw=2, jb=4, ui=16, ic=lqp4, pipe=6, pack=2),
            ]
            if lq <= 192:  # rows+s_buf stay under VMEM at full height
                cands += [
                    KernelConfig(nw=4, jb=4, ui=16, ic=lqp4, pipe=6, pack=4),
                    KernelConfig(nw=2, jb=8, ui=16, ic=lqp4, pipe=6, pack=4),
                    KernelConfig(nw=3, jb=4, ui=16, ic=lqp4, pipe=6, pack=4),
                    KernelConfig(nw=3, jb=8, ui=16, ic=lqp4, pipe=6,
                                 pack=4),
                    # 32 register chains at full height — feasible since
                    # the nc==1 single-parity s_buf fix (_sbuf_scratch):
                    # the const-S 469-GCUPS ceiling was measured at 32
                    # chains, so these chase it at full dot height
                    KernelConfig(nw=2, jb=16, ui=16, ic=lqp4, pipe=6,
                                 pack=4),
                    KernelConfig(nw=4, jb=8, ui=16, ic=lqp4, pipe=6,
                                 pack=4),
                ]
            else:
                # lq > 192: high-nw full-height pack=4 overruns VMEM at
                # lq=512 (rows dominate); these fit post-parity-fix —
                # full dot height is the lever, chains second
                cands += [
                    KernelConfig(nw=2, jb=4, ui=16, ic=lqp4, pipe=6, pack=4),
                    KernelConfig(nw=1, jb=8, ui=16, ic=lqp4, pipe=6, pack=4),
                    KernelConfig(nw=1, jb=4, ui=16, ic=lqp4, pipe=6, pack=4),
                ]
        seen = set()
        for cfg in cands:
            key = (cfg.nw, cfg.jb, cfg.ui, cfg.ic, cfg.pipe, cfg.pack)
            if key in seen:
                continue
            seen.add(key)
            if not config_fits_vmem(lq, cfg):
                print(f"lq={lq:4d} {cfg}: SKIP (exceeds VMEM budget)",
                      flush=True)
                continue
            run(lq, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
