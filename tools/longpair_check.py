"""Hardware measurement: long-query scoring via the row-striped kernel.

VERDICT round-2 item 6: demonstrate "unbounded query length at full
speed" with a measured number. The reference can only grow its row
buffers with the query (``src/alignment.c:227-230``) and its upstream
one-vs-one oracle allocates the FULL DP matrix for traceback — a
100k x 35k pair needs tens of GB there. Here the striped kernel runs
ceil(Lq/512) full-interleave passes whose (Gg, F) stripe boundaries
stream through HBM, so VMEM stays constant in Lq.

Timing: whole-scan wall time on warmed programs (the per-pass dispatches
enqueue asynchronously; one fetch at the end), sized so device time
dominates the ~28 ms tunnel RTT. Program loads are warmed untimed
(pipeline _EXEC_CACHE discipline).

Usage (TPU host): python tools/longpair_check.py [--lq 35000 100000] [--lb 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lq", type=int, nargs="*", default=[35_000, 100_000])
    # 1024 positions x nw=2 windows x 1024 lanes ~ 2M residues: one scan is
    # ~0.35 s device time at lq=35k, so the single 28 ms fetch RTT is <10%
    # of the measurement (at the old 256 it was ~25%).
    parser.add_argument("--lb", type=int, default=1024)
    parser.add_argument("--nw", type=int, default=2)
    parser.add_argument("--verify-rows", type=int, default=1200,
                        help="also verify a >1-stripe query vs wavefront")
    parser.add_argument("--pipe", type=int, default=0)
    parser.add_argument("--pack", type=int, default=1)
    parser.add_argument("--ic", type=int, default=0,
                        help="S-chunk rows (0 = ui; use 512 with --pipe 6 "
                        "for full-stripe fused dots)")
    parser.add_argument("--stripe-rows", type=int, default=512,
                        help="query rows per stripe pass (small values "
                        "make the CPU interpret pre-flight traceable)")
    parser.add_argument("--ab", action="store_true",
                        help="interleaved stripe-config A/B (drift-immune "
                        "round-robin medians, tools/ab_check.py "
                        "discipline); --scand adds candidates")
    parser.add_argument("--scand", action="append", default=[],
                        help="nw,jb,ui,ic,pipe,pack,stripe_rows "
                        "(repeatable; --ab only)")
    parser.add_argument("--rounds", type=int, default=5)
    args = parser.parse_args()

    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax

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
        sw_pallas_stream_striped,
    )
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(31)
    lb, nw = args.lb, args.nw
    cpu = jax.devices("cpu")[0]

    if args.ab:
        return _ab(args, jax, rng, KernelConfig, choose_config,
                   config_fits_vmem, sw_pallas_stream_striped,
                   sw_wavefront, cpu)
    # striped=True: measure the SAME table the pipeline's striped path
    # selects from (_SHAPES_STRIPE), so adopted packed-stripe shapes show
    # up here without flag juggling; --pipe/--pack still override below.
    cfg = choose_config(args.stripe_rows, nw_max=nw, max_abs_bias=18.0,
                        striped=True)
    kw = dict(nw=cfg.nw, jb=cfg.jb, ui=cfg.ui, ic=args.ic or cfg.ui,
              pipe=args.pipe, pack=args.pack,
              stripe_rows=args.stripe_rows)

    def streams_for(n_positions):
        streams = rng.integers(1, 27, (nw, n_positions, 1024)).astype(np.int32)
        # one segment per window, flushed at the end
        fs = np.zeros((n_positions // cfg.jb, nw, 2), dtype=np.int32)
        for w in range(nw):
            fs[-1, w, 1] = 1 + w
        return streams, fs

    if args.verify_rows:
        # exactness across >1 stripe boundary on hardware
        vq = args.verify_rows
        prof = rng.integers(-8, 12, (vq, 32)).astype(np.int32)
        streams, fs = streams_for(64)
        out = np.asarray(
            sw_pallas_stream_striped(
                prof, streams, fs, -3, -1, nslots=nw, **kw
            )
        )
        with jax.default_device(cpu):
            want = np.stack([
                np.asarray(sw_wavefront(prof, streams[w], -3, -1))
                for w in range(nw)
            ])
        print(f"striped verify lq={vq}: exact={bool((out == want).all())}",
              flush=True)

    for lq in args.lq:
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        streams, fs = streams_for(lb)
        pj = jax.device_put(prof)
        sj = jax.device_put(streams)
        jax.block_until_ready([pj, sj])

        def scan():
            return np.asarray(
                sw_pallas_stream_striped(
                    pj, sj, fs, -3, -1, nslots=nw, **kw
                )
            )

        t0 = time.time()
        scan()  # compile + program loads + warm (untimed)
        warm_s = time.time() - t0

        def one():
            t0 = time.perf_counter()
            scan()
            return time.perf_counter() - t0

        dt = min(one() for _ in range(2))  # run-to-run spread is ±6-10%
        cells = lq * lb * nw * 1024
        print(
            f"longpair lq={lq}: {cells/dt/1e9:6.1f} GCUPS wall "
            f"({dt:.2f}s, {lq * lb * nw * 1024 / 1e9:.1f} Gcell, "
            f"{-(-lq // args.stripe_rows)} stripe passes, "
            f"warm {warm_s:.0f}s)",
            flush=True,
        )
    return 0


def _ab(args, jax, rng, KernelConfig, choose_config, config_fits_vmem,
        sw_pallas_stream_striped, sw_wavefront, cpu):
    """Interleaved stripe-config A/B at lq=args.lq[0].

    Session drift (~±20%, docs/DESIGN.md round-4) makes cross-session
    stripe comparisons invalid; here every variant is compiled + warmed
    up front, exactness-checked across a >1-stripe boundary, then timed
    in round-robin rounds so each samples every time slice. v0 is the
    production striped config (choose_config(striped=True)).
    """
    import time as _t

    lq = args.lq[0] if args.lq else 35_000
    lb = args.lb

    # (nw, jb, ui, ic, pipe, pack, stripe_rows); v0 = production.
    base = choose_config(args.stripe_rows, nw_max=args.nw,
                         max_abs_bias=18.0, striped=True)
    variants = [(base.nw, base.jb, base.ui, base.ic, base.pipe,
                 base.pack, args.stripe_rows)]
    for s in args.scand:
        parts = [int(x) for x in s.split(",")]
        if len(parts) != 7:
            raise ValueError(f"--scand wants nw,jb,ui,ic,pipe,pack,sr: {s}")
        variants.append(tuple(parts))

    streams_cache = {}

    def streams_for(nw_v, jb_v, n_positions):
        if (nw_v, n_positions) not in streams_cache:
            streams_cache[(nw_v, n_positions)] = rng.integers(
                1, 27, (nw_v, n_positions, 1024)).astype(np.int32)
        streams = streams_cache[(nw_v, n_positions)]
        fs = np.zeros((n_positions // jb_v, nw_v, 2), dtype=np.int32)
        for w in range(nw_v):
            fs[-1, w, 1] = 1 + w
        return streams, fs

    vq = args.verify_rows or 1200
    vprof = rng.integers(-8, 12, (vq, 32)).astype(np.int32)
    prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
    pj = jax.device_put(prof)

    built = []
    for v in variants:
        nw_v, jb_v, ui_v, ic_v, pipe_v, pack_v, sr_v = v
        cfg = KernelConfig(nw=nw_v, jb=jb_v, ui=ui_v, ic=ic_v,
                           pipe=pipe_v, pack=pack_v, upk="floor")
        tag = f"{cfg} sr={sr_v}"
        # per-pass VMEM: each stripe is a <=sr-row query (+1 MiB reserve
        # for the boundary-state blocks the striped kernel adds)
        if not config_fits_vmem(sr_v, cfg, reserve=(1 << 20)):
            print(f"{tag}: SKIP (exceeds VMEM budget)", flush=True)
            continue
        kw = dict(nw=nw_v, jb=jb_v, ui=ui_v, ic=ic_v, pipe=pipe_v,
                  pack=pack_v, stripe_rows=sr_v)

        vstreams, vfs = streams_for(nw_v, jb_v, 64)
        t0 = _t.time()
        try:
            out = np.asarray(sw_pallas_stream_striped(
                vprof, vstreams, vfs, -3, -1, nslots=nw_v, **kw))
        except Exception as ex:
            print(f"{tag}: COMPILE FAIL {str(ex)[:90]}", flush=True)
            continue
        load_s = _t.time() - t0
        with jax.default_device(cpu):
            want = np.stack([
                np.asarray(sw_wavefront(vprof, vstreams[w], -3, -1))
                for w in range(nw_v)
            ])
        ok = bool((out == want).all())

        streams, fs = streams_for(nw_v, jb_v, lb)
        sj = jax.device_put(streams)
        jax.block_until_ready([sj, pj])

        def make_scan(sj=sj, fs=fs, kw=kw, nw_v=nw_v):
            def scan():
                return np.asarray(sw_pallas_stream_striped(
                    pj, sj, fs, -3, -1, nslots=nw_v, **kw))
            return scan

        scan = make_scan()
        t0 = _t.time()
        scan()  # big-lq program compile + load + warm (untimed)
        load_s += _t.time() - t0
        print(f"{tag}: exact={ok}  (load {load_s:.0f}s)", flush=True)
        built.append((tag, scan, ok, nw_v))

    if not built:
        print("no runnable variants")
        return 1

    def one(scan):
        t0 = _t.perf_counter()
        scan()
        return _t.perf_counter() - t0

    samples = {i: [] for i in range(len(built))}
    for r in range(args.rounds):
        for i, (tag, scan, _, nw_v) in enumerate(built):
            dt = min(one(scan) for _ in range(2))
            g = lq * lb * nw_v * 1024 / dt / 1e9
            samples[i].append(g)
        print(f"round {r + 1}/{args.rounds}: "
              + "  ".join(f"v{i}={samples[i][-1]:.1f}"
                          for i in range(len(built))), flush=True)

    print(f"\n=== stripe A/B lq={lq} lb={lb} interleaved medians "
          f"({args.rounds} rounds) ===")
    meds = []
    for i, (tag, _, ok, _) in enumerate(built):
        gs = sorted(samples[i])
        med = float(np.median(gs))
        spread = (gs[-1] - gs[0]) / med * 100 if med else 0.0
        meds.append(med)
        print(f"v{i} {tag}: exact={ok}  median {med:6.1f} GCUPS wall "
              f"(spread {spread:.1f}%)", flush=True)
    # Winner selection only considers variants that passed the exactness
    # check — a fast-but-wrong config must never be printed as WINNER
    # (it would invite adopting a config that produces wrong scores).
    eligible = [i for i, (_, _, ok, _) in enumerate(built) if ok]
    if eligible:
        best = max(eligible, key=lambda i: meds[i])
        print(f"WINNER v{best}: {built[best][0]}  {meds[best]:.1f} GCUPS "
              f"({meds[best] / meds[0]:.3f}x vs v0)", flush=True)
    else:
        print("WINNER: none — every variant FAILED the exactness check; "
              "timings above are for diagnosis only", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
