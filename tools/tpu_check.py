"""On-hardware validation: compiled Pallas kernel vs XLA engine vs config grid.

Run on a TPU host: ``python tools/tpu_check.py [--sweep]``. Exercises the
production kernel configurations (choose_config over representative query
lengths), checks score equality against the wavefront engine, and reports
sustained GCUPS per configuration. This is the hardware half of the kernel
test strategy (the logic half is tests/test_pallas.py in interpret mode).

Timing methodology (docs/DESIGN.md "Measurement discipline"): on this
tunneled-TPU environment a dispatch round trip costs ~28 ms and
``block_until_ready`` on enqueued-but-unfetched results can return early, so
honest device time is measured by differencing two fetched runs of R1 and R2
repetitions chained inside jit (the round trip cancels; only device compute
remains).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed_gcups(fn, cells_per_call, r1=1, r2=5):
    """Device-seconds per call via two-point chained-repetition difference.

    ``fn(i)`` must make its computation depend on the iteration index ``i``
    (e.g. perturb one input element), otherwise XLA hoists the call out of
    the repetition loop and the measurement collapses.
    """
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(reps):
        def body(i, acc):
            return acc + fn(i)[0]

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    def run(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chain(reps))  # forces enqueue + completion + fetch
        return time.perf_counter() - t0

    # warm both shapes (compile)
    np.asarray(chain(r1))
    np.asarray(chain(r2))
    # best-of-3: run-to-run spread on this host is +-6-10% and single
    # outliers have misled config decisions (docs/DESIGN.md round 2)
    t1 = min(run(r1) for _ in range(3))
    t2 = min(run(r2) for _ in range(3))
    dt = max((t2 - t1) / (r2 - r1), 1e-9)
    return cells_per_call / dt / 1e9


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sweep", action="store_true", help="grid-sweep (nw, jb, ui) configs"
    )
    parser.add_argument("--lb", type=int, default=4096)
    parser.add_argument(
        "--lq", type=int, nargs="*", help="restrict to these query lengths"
    )
    parser.add_argument("--nw", type=int, nargs="*", help="sweep: window counts")
    parser.add_argument(
        "--paths",
        action="store_true",
        help="regression-check every production kernel path (stream, striped, multi-query)",
    )
    parser.add_argument(
        "--mq64",
        action="store_true",
        help="measure the 64-query blocked batch vs 64 sequential searches",
    )
    args = parser.parse_args()

    # Persistent compile cache: hardware sweeps re-pay 20-120 s kernel
    # compiles per shape per process without it (VERDICT round 2 item 7).
    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax

    # SEQALIGN_PLATFORM=cpu must beat the eagerly-registered TPU plugin
    # (env JAX_PLATFORMS loses to it); same config-API route as the CLI.
    # Without this, a dead tunnel HANGS the backend probe below instead of
    # letting a CPU dry-run exit with SKIP.
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
        sw_pallas_windows,
    )
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    failures = 0
    lb = args.lb

    def check_and_time(lq, cfg, verify=True):
        nonlocal failures
        # |P'| = |P + 3| <= 15 (+3 perturbation margin): inside every
        # pack level's bound, so packed production configs time honestly
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        kw = dict(nw=cfg.nw, jb=cfg.jb, ui=cfg.ui, ic=cfg.ic,
                  pipe=getattr(cfg, 'pipe', 0),
                  pack=getattr(cfg, 'pack', 1))
        ok = True
        if verify:
            db = rng.integers(1, 27, (cfg.nw, 256, 1024)).astype(np.int32)
            try:
                a = np.asarray(sw_pallas_windows(prof, db, -3, -1, **kw))
            except Exception as ex:
                print(
                    f"lq={lq:4d} {cfg}: COMPILE/RUN FAIL {str(ex)[:80]}"
                )
                failures += 1
                return None
            want = np.concatenate(
                [
                    np.asarray(sw_wavefront(prof, db[w], -3, -1))
                    for w in range(cfg.nw)
                ]
            )
            ok = bool((a == want).all())
            if not ok:
                failures += 1
        dj = jax.device_put(
            rng.integers(1, 27, (cfg.nw, lb, 1024)).astype(np.int32)
        )
        pj = jax.device_put(prof)
        jax.block_until_ready([dj, pj])
        def fn(i):
            # Perturb one profile cell by the (bounded) iteration index so
            # each chained call is distinct — see timed_gcups docstring.
            import jax.numpy as jnp

            p = pj.at[0, 0].add((i % 4).astype(jnp.int32))
            return sw_pallas_windows(p, dj, -3, -1, **kw)

        try:
            gcups = timed_gcups(fn, lq * lb * cfg.nw * 1024)
        except Exception as ex:
            print(f"lq={lq:4d} {cfg}: TIMING FAIL {str(ex)[:80]}")
            failures += 1
            return None
        print(f"lq={lq:4d} {cfg}: exact={ok}  {gcups:6.1f} GCUPS")
        return gcups

    if args.mq64:
        failures += check_mq64(rng)
    elif args.sweep:
        for lq in args.lq or (17, 144, 512):
            for nw in args.nw or (4, 6, 8, 10, 12):
                for jb, ui in ((4, 4), (8, 2), (2, 8), (8, 4), (4, 8)):
                    cfg0 = choose_config(lq, nw=nw)
                    lqp = -(-lq // ui) * ui
                    rows = (2 * lqp * nw + (2 * jb + 1) * nw) * 4096
                    ic_budget = (13.0 * 2**20 - rows) / (nw * jb * 4096)
                    ic = min(lqp, max(ui, int(ic_budget // ui) * ui))
                    if rows + nw * jb * ic * 4096 > 15 * 2**20:
                        continue
                    cfg = KernelConfig(nw=nw, jb=jb, ui=ui, ic=ic)
                    check_and_time(lq, cfg, verify=False)
            print()
    elif args.paths:
        failures += check_paths(rng)
    else:
        for lq in args.lq or (17, 64, 144, 256, 384, 512, 768):
            # bias bound matches the ladder's synthetic profile (|P'|<=18)
            cfg = choose_config(lq, max_abs_bias=18.0)
            check_and_time(lq, cfg)

    print("FAILURES:", failures)
    return 1 if failures else 0


def check_mq64(rng) -> int:
    """The 64-query north-star config (BASELINE #4): one query-blocked
    search_database_multi call vs 64 sequential searches, scores equal,
    aggregate speedup reported."""
    import time

    import numpy as np

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.models.alphabet import encode
    from seqalign_tpu.pipeline import (
        _db_from_encoded,
        search_database,
        search_database_multi,
    )

    aa20 = np.array(encode("ACDEFGHIKLMNPQRSTVWY"), dtype=np.int8)
    sc = load_builtin(
        "PAM250",
        ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False),
    )
    nq, lq, n = 64, 144, 65536
    queries = [aa20[rng.integers(0, 20, lq)].astype(np.int32) for _ in range(nq)]
    lengths = np.clip(rng.gamma(1.8, 202.0, n).astype(np.int64), 2, 4000)
    encoded = [aa20[rng.integers(0, 20, int(L))] for L in lengths]
    db = _db_from_encoded(encoded)
    residues = int(db.lengths.sum())

    t0 = time.perf_counter()
    multi, kt_multi = search_database_multi(queries, db, sc)
    wall_multi = time.perf_counter() - t0

    t0 = time.perf_counter()
    kt_seq = 0.0
    seq_scores = np.zeros((nq, n), dtype=np.int32)
    for k, q in enumerate(queries):
        seq_scores[k], dt = search_database(q, db, sc)
        kt_seq += dt
    wall_seq = time.perf_counter() - t0

    ok = bool((multi == seq_scores).all())
    agg_gcups = nq * lq * residues / kt_multi / 1e9
    print(
        f"mq64: exact={ok}  blocked kernel={kt_multi:.3f}s wall={wall_multi:.1f}s"
        f"  sequential kernel={kt_seq:.3f}s wall={wall_seq:.1f}s"
        f"  kernel speedup={kt_seq / kt_multi:.2f}x"
        f"  wall speedup={wall_seq / wall_multi:.2f}x"
        f"  aggregate={agg_gcups:.1f} GCUPS"
    )
    return 0 if ok else 1


def check_paths(rng) -> int:
    """Hardware regression: every production kernel path, exact vs XLA."""
    import numpy as np

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.models.alphabet import encode
    from seqalign_tpu.ops.swa_pallas import (
        choose_config,
        sw_pallas_stream,
        sw_pallas_stream_striped,
    )
    from seqalign_tpu.ops.swa_xla import make_profile, sw_wavefront
    from seqalign_tpu.pipeline import _db_from_encoded
    from seqalign_tpu.utils.packing import pack_streams

    aa20 = np.array(encode("ACDEFGHIKLMNPQRSTVWY"), dtype=np.int8)
    sc = load_builtin(
        "BLOSUM62",
        ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False),
    )
    go, ge = sc.gap_open_total, sc.gap_extend
    # SEQALIGN_PATHS_N shrinks the database for the CPU interpret
    # pre-flight (full-size interpret runs take an hour+).
    n = int(os.environ.get("SEQALIGN_PATHS_N", "6000"))
    encoded = [
        aa20[rng.integers(0, 20, int(L))]
        for L in np.clip(rng.gamma(1.8, 60.0, n).astype(np.int64), 1, 800)
    ]
    db = _db_from_encoded(encoded)
    order = np.argsort(-db.lengths, kind="stable")
    lb = int(db.lengths.max())
    flat = np.full((lb, n), 31, dtype=np.int32)
    for i, e in enumerate(encoded):
        flat[: len(e), i] = e

    fails = 0

    def scatter(out, pack, k=None):
        s = np.zeros(n, dtype=np.int32)
        for slot, ids in enumerate(pack.slot_ids):
            s[ids] = (out[slot] if k is None else out[slot, k])[: len(ids)]
        return s

    # 1) segmented stream — same config selection as production
    # (_stream_search passes the bias bound, unlocking packed shapes)
    q = aa20[rng.integers(0, 20, 144)].astype(np.int32)
    prof = make_profile(sc.table, q)
    pmax = float(np.max(np.abs(prof.astype(np.float64) - go)))
    cfg = choose_config(144, reserve=(1 << 20), max_abs_bias=pmax)
    pack = pack_streams(db, order, cfg.nw, jb=cfg.jb, grain=16)
    out = np.asarray(
        sw_pallas_stream(
            prof, pack.streams, pack.fs, go, ge,
            nslots=len(pack.slot_ids), nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
            ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack, upk=cfg.upk,
            sdt=cfg.sdt,
        )
    )
    want = np.asarray(sw_wavefront(prof, flat, go, ge))
    ok = bool((scatter(out, pack) == want).all())
    print(f"stream lq=144 {cfg}: exact={ok}")
    fails += not ok

    # 2) striped long query — same selection as the pipeline's striped
    # path (striped=True table + bias gate + production kwargs), so an
    # adopted packed-stripe shape is validated here automatically
    ql = aa20[rng.integers(0, 20, 700)].astype(np.int32)
    profl = make_profile(sc.table, ql)
    pmaxl = float(np.max(np.abs(profl.astype(np.float64) - go)))
    cfgs = choose_config(
        192, reserve=(2 << 20), max_abs_bias=pmaxl, striped=True
    )
    packs = pack_streams(db, order, cfgs.nw, jb=cfgs.jb, grain=16)
    out = np.asarray(
        sw_pallas_stream_striped(
            profl, packs.streams, packs.fs, go, ge,
            nslots=len(packs.slot_ids), nw=cfgs.nw, jb=cfgs.jb, ui=cfgs.ui,
            ic=cfgs.ic, stripe_rows=192, pipe=cfgs.pipe, pack=cfgs.pack,
            upk=cfgs.upk, sdt=cfgs.sdt,
        )
    )
    wantl = np.asarray(sw_wavefront(profl, flat, go, ge))
    ok = bool((scatter(out, packs) == wantl).all())
    print(f"striped lq=700 (4 stripes) {cfgs}: exact={ok}")
    fails += not ok

    # 3) multi-query stream
    nq = 4
    qs = [aa20[rng.integers(0, 20, 33)].astype(np.int32) for _ in range(nq)]
    profs = np.stack([make_profile(sc.table, qq) for qq in qs])
    cfgm = choose_config(33, nq=nq, reserve=(1 << 20))
    packm = pack_streams(db, order, cfgm.nw, jb=cfgm.jb, grain=16)
    out = np.asarray(
        sw_pallas_stream(
            profs, packm.streams, packm.fs, go, ge,
            nslots=len(packm.slot_ids), nw=cfgm.nw, jb=cfgm.jb, ui=cfgm.ui,
            ic=cfgm.ic, pipe=cfgm.pipe, pack=cfgm.pack, upk=cfgm.upk,
            sdt=cfgm.sdt,
        )
    )
    for k in range(nq):
        wantk = np.asarray(sw_wavefront(profs[k], flat, go, ge))
        ok = bool((scatter(out, packm, k) == wantk).all())
        print(f"multiquery q{k} lq=33 {cfgm}: exact={ok}")
        fails += not ok

    # 4) scan-of-blocks one-dispatch batch (the production multi-record
    # query path): blocks of one scanned inside ONE compiled program.
    from seqalign_tpu.pipeline import _stream_search

    got, _ = _stream_search(profs, db, go, ge, order, None)
    for k in range(nq):
        wantk = np.asarray(sw_wavefront(profs[k], flat, go, ge))
        ok = bool((got[k] == wantk).all())
        print(f"scan-of-blocks q{k} lq=33: exact={ok}")
        fails += not ok

    # 5) striped kernel with packed fused production (round-3 plumbing)
    pmaxl = float(np.max(np.abs(profl.astype(np.float64) - go)))
    if pmaxl <= 31.0:
        out = np.asarray(
            sw_pallas_stream_striped(
                profl, packs.streams, packs.fs, go, ge,
                nslots=len(packs.slot_ids), nw=cfgs.nw, jb=cfgs.jb,
                ui=cfgs.ui, ic=192, stripe_rows=192, pipe=6, pack=4,
            )
        )
        ok = bool((scatter(out, packs) == wantl).all())
        print(f"striped+packed lq=700 pipe=6 pack=4: exact={ok}")
        fails += not ok

    # (a former step 6 validated upk="round" signed-field unpacking; the
    # mode was pruned in round 5 after losing the hardware A/B —
    # docs/hw_r4/ab_lq144.log, PRODUCTION_UPK note.)
    return fails


if __name__ == "__main__":
    sys.exit(main())
