"""Benchmark: one query vs a Swiss-Prot-scale synthetic database.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's headline benchmark (BASELINE.md): a single
protein query scored against a Swiss-Prot-scale database (565,247 records,
gamma length distribution with the Swiss-Prot mean ~363, residues drawn
from UniProt average amino-acid frequencies), PAM250, timing the DP kernel
region only — the reference's own boundary (src/alignment_cmdline.c:503-509
times only the OpenMP kernel loop, excluding FASTA parsing and packing).

Metric: sustained GCUPS over *real* database residues (padding excluded
from the numerator; query length 144).

Baseline (vs_baseline denominator), derived in BASELINE.md "Derived
baseline GCUPS": the reference reports times, not GCUPS, and never states
its benchmark query length. Its own numbers pin the kernel's cell rate:
1547 ms serial / 81 ms at 64 threads for Swiss-Prot (Final Report p.32) is
a 19.1x parallel speedup on a 16-core Xeon 6242, and the kernel's measured
cell rate (its AVX2 source compiled and run on this host via
tools/refbench: 1.70 GCUPS/core; L-independent) bounds the serial run at
~1.7-2.3 GCUPS, i.e. the published 365,383 entries/s serial is only
consistent with a query of ~15-17 residues. Best-case 64-thread cell rate:
19.1 x 2.25 = 43 GCUPS (taking the generous end of the per-core band).
vs_baseline therefore compares machine cell rates on identical workloads:
ours / 43.0.

Timing method: the axon-tunneled TPU has ~28 ms dispatch RTT and an
early-acking block_until_ready, so naive wall timing is wrong in both
directions. The whole database is scored in ONE segmented-stream kernel
dispatch, and device time is measured by differencing fetched runs of 1 and
3 chained repetitions (one jit fori_loop program with a *dynamic* rep
count and an index-perturbed input so XLA cannot hoist the call); the RTT
cancels exactly.

Cost structure (the round-2 lesson — BENCH_r02 timed out at rc=124):
loading a freshly compiled program onto the TPU through the axon tunnel
costs 68 s-19 min *per program* (pipeline.py _EXEC_CACHE notes), so this
harness (a) enables the persistent XLA compile cache before touching jax,
(b) builds exactly THREE jitted programs — the main dynamic-rep chain
(dynamic rep counts replace the old chain(1)/chain(3) pairs), plus one
small program each for the optional short-query and multi-query points,
each gated separately on the remaining watchdog budget — and (c) runs
under an in-process watchdog that prints the best-available result line
and exits before the driver's timeout can strike.

Never-empty discipline (the round-4 lesson — BENCH_r04 was rc=3 with
NOTHING emitted because a 757 s degraded-tunnel program load burned the
whole budget before the first stash): a parseable provenance line (value
null, detail.last_measured = the best builder-run numbers) is stashed
the moment the backend probe succeeds, BEFORE any packing, compile, or
load, and is re-stashed with the current stage at every milestone; every
stage prints a timestamped progress line so a timeout is diagnosable
from the stderr tail. Once the program is loaded, the headline is the
median of 3 interleaved two-point measurements (drift insurance — ±20%
session drift measured round 4; reps cost ~0.14 s each, the load
dominates).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

QUERY_LEN = 144
N_ENTRIES = 565_247
BASELINE_GCUPS = 43.0  # reference best (64T Xeon 6242), see module docstring
BASELINE_ENTRIES_PER_S = 6_978_358.0  # reference best published entries/s

# Measured single-chip ALU ceiling for the identical DP loop with constant
# substitution scores (docs/DESIGN.md "The S-path wall" isolation study,
# v5e, lq=144): the roofline the full kernel is judged against.
ROOFLINE_GCUPS = 469.0

DB_CAVEAT = (
    "synthetic database at Swiss-Prot scale (gamma lengths fitted to the "
    "Swiss-Prot mean, residues drawn from UniProt average amino-acid "
    "frequencies); the real Swiss-Prot file is unavailable (reference "
    "snapshot ships no fixtures, environment has no egress)"
)

# UniProt/Swiss-Prot average amino-acid composition (%), order
# ACDEFGHIKLMNPQRSTVWY — real-ish residue statistics instead of uniform.
AA_FREQS = np.array([
    8.25, 1.37, 5.45, 6.75, 3.86, 7.07, 2.27, 5.96, 5.84, 9.66,
    2.42, 4.06, 4.70, 3.93, 5.53, 6.56, 5.34, 6.87, 1.08, 2.92,
])
AA_FREQS = AA_FREQS / AA_FREQS.sum()

_T0 = time.time()
_BUDGET_S = float(os.environ.get("SEQALIGN_BENCH_BUDGET_S", "780"))
# --rehearse: full two-program hardware path at tiny scale (<60 s warm).
# The official capture must never be the first hardware execution of a
# changed bench (round-2 lesson): `make bench-rehearse` before each round's
# driver run. Result lines are tagged detail.rehearsal so they cannot be
# mistaken for the official number.
_REHEARSE = "--rehearse" in sys.argv[1:]

# Best builder-measured numbers to date, carried as provenance when an
# outage or slow load nulls the official line (round-3/4 VERDICT item 1):
# the scoreboard then shows where the last real measurement lives instead
# of a bare null.
_LAST_MEASURED = {
    "round": 5,
    "value": 255.8,
    "unit": "GCUPS",
    "tool": "tools/ab_check.py interleaved drift-immune A/B median, "
    "lq=144 (4,8,16) pipe=6 pack=4 (builder-run; docs/hw_r4/ab_lq144.log; "
    "re-confirmed round 5 at 256.4 median, docs/hw_r5/ab_lq144.log)",
    "end_to_end_value": 244.1,
    "end_to_end_tool": "bench.py official-format capture (builder-run, "
    "round 5, 2026-08-19 05:14 UTC, median of 3 two-point measurements; "
    "docs/hw_r5/official1.log)",
}
# RLock: the SIGTERM handler runs _emit_best_and_exit on the MAIN thread;
# a plain Lock would deadlock if the signal lands inside a _stash().
_EMIT_LOCK = threading.RLock()
_BEST_LINE: list[str] = []  # best-available JSON line so far (len<=1)
_DONE = threading.Event()
_HAVE_MEASURED = False  # once True, provenance stashes never clobber


def _stash(line: str) -> None:
    with _EMIT_LOCK:
        if _BEST_LINE:
            _BEST_LINE[0] = line
        else:
            _BEST_LINE.append(line)


def _stash_measured(line: str) -> None:
    """Stash a line carrying a real measurement (non-null value)."""
    global _HAVE_MEASURED
    with _EMIT_LOCK:
        _HAVE_MEASURED = True
        _stash(line)


def _progress(msg: str) -> None:
    """Timestamped stage line on stderr — a watchdog/timeout postmortem
    must be readable from the tail (round-4 lesson: rc=3 with zero
    progress output between the backend probe and the first stash)."""
    print(f"bench[+{time.time() - _T0:.0f}s]: {msg}", file=sys.stderr,
          flush=True)


def _stash_provenance(stage: str) -> None:
    """Parseable null-value line carrying the last real measurements and
    the current stage. Stashed the moment the backend is up and re-stashed
    at every milestone, so the watchdog can NEVER fire with nothing banked
    (round-4 failure mode: a 757 s program load > the whole 780 s budget,
    rc=3, parsed=null)."""
    with _EMIT_LOCK:
        if _HAVE_MEASURED:
            return
        _stash(json.dumps({
            "metric": "swissprot_scale_search_gcups",
            "value": None,
            "unit": "GCUPS",
            "vs_baseline": None,
            "detail": {
                "provisional": (
                    "harness did not reach a measurement before the "
                    f"budget expired; last completed stage: {stage}"
                ),
                "stage": stage,
                "elapsed_s": round(time.time() - _T0, 1),
                "last_measured": _LAST_MEASURED,
            },
        }))
    _progress(f"stage: {stage}")


def _emit_best_and_exit(code_if_empty: int) -> None:
    with _EMIT_LOCK:
        line = _BEST_LINE[0] if _BEST_LINE else None
    if line is not None:
        print(line, flush=True)
        os._exit(0)
    os._exit(code_if_empty)


def _watchdog() -> None:
    remaining = _BUDGET_S - (time.time() - _T0)
    while remaining > 0 and not _DONE.wait(min(remaining, 5.0)):
        remaining = _BUDGET_S - (time.time() - _T0)
    if _DONE.is_set():
        return
    print(
        f"bench watchdog: budget {_BUDGET_S:.0f}s reached, emitting "
        "best-available result",
        file=sys.stderr,
        flush=True,
    )
    _emit_best_and_exit(code_if_empty=3)


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _on_term(signum, frame) -> None:
    # The driver enforces its own budget with `timeout` (SIGTERM, rc=124 —
    # how BENCH_r02 died). Emit the best-available line before dying so the
    # round always records a parsed result.
    print(
        f"bench: signal {signum}, emitting best-available result",
        file=sys.stderr,
        flush=True,
    )
    _emit_best_and_exit(code_if_empty=124)


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    threading.Thread(target=_watchdog, daemon=True).start()

    # Persistent compile cache BEFORE any jax work: kernel compiles cost
    # 20-120 s and the cache dir already holds prior-round entries.
    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    # SEQALIGN_PLATFORM=cpu|tpu forces the backend (hermetic smoke runs);
    # same config-API route as the CLI (env JAX_PLATFORMS can lose to
    # eager TPU plugin registration).
    plat = os.environ.get("SEQALIGN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    else:
        # Dead-tunnel guard: backend init through the axon tunnel HANGS
        # (not errors) when the tunnel is down, which would burn the whole
        # watchdog budget with nothing stashed. Probe init in a subprocess
        # (an in-process hang can't be cancelled) and wait for recovery
        # while budget remains.
        import subprocess

        def _backend_up() -> bool:
            try:
                return (
                    subprocess.run(
                        [sys.executable, "-c", "import jax; jax.devices()"],
                        timeout=150,
                        capture_output=True,
                    ).returncode
                    == 0
                )
            except subprocess.TimeoutExpired:
                return False

        while not _backend_up():
            if _remaining() < 240:
                print(
                    "bench: TPU backend unreachable for the whole budget",
                    file=sys.stderr,
                    flush=True,
                )
                # Record the outage as a PARSEABLE line rather than a bare
                # nonzero exit: the round's scoreboard then shows an
                # explicit hardware outage instead of an opaque null.
                _stash(
                    json.dumps(
                        {
                            "metric": "swissprot_scale_search_gcups",
                            "value": None,
                            "unit": "GCUPS",
                            "vs_baseline": None,
                            "detail": {
                                "error": (
                                    "TPU backend unreachable: axon tunnel "
                                    "init hung/failed for the entire bench "
                                    "budget (subprocess probes, 150 s "
                                    "timeout each)"
                                ),
                                "outage_log": "docs/outage/",
                                "last_measured": _LAST_MEASURED,
                            },
                        }
                    )
                )
                _emit_best_and_exit(code_if_empty=3)
            print(
                "bench: TPU backend probe failed (tunnel down?); "
                f"retrying ({_remaining():.0f}s budget left)",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(45)

    # FIRST stash happens here — before any packing/compile/load work —
    # so from this point on a watchdog fire always emits a parsed line.
    _stash_provenance("backend up; generating synthetic database")

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.models.alphabet import encode
    from seqalign_tpu.ops.swa_xla import make_profile

    backend = jax.default_backend()
    rng = np.random.default_rng(42)
    aa20 = np.array(encode("ACDEFGHIKLMNPQRSTVWY"), dtype=np.int8)

    sc = load_builtin(
        "PAM250", ScoringModel(gap_open=-2, gap_extend=-1, use_match_mismatch=False)
    )
    query = aa20[rng.choice(20, QUERY_LEN, p=AA_FREQS)].astype(np.int32)
    profile = make_profile(sc.table, query)
    go, ge = sc.gap_open_total, sc.gap_extend

    n = N_ENTRIES if backend == "tpu" else 20_000
    if _REHEARSE:
        n = 4096  # tiny shapes, same programs/packing/timing structure
    n = int(os.environ.get("SEQALIGN_BENCH_ENTRIES", n))  # test override
    lengths = np.clip(
        rng.gamma(shape=1.8, scale=202.0, size=n).astype(np.int64), 2, 35_000
    )
    lengths = np.sort(lengths)[::-1].copy()
    # Flat-buffer database, sequences drawn lazily per record.
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    seq = aa20[rng.choice(20, int(offsets[-1]), p=AA_FREQS)]
    from seqalign_tpu.utils.native_io import EncodedDatabase

    db = EncodedDatabase(seq=seq, offsets=offsets, names=[""] * n)
    real_cells = QUERY_LEN * int(offsets[-1])

    if backend != "tpu":
        # CPU fallback: XLA wavefront engine through the pipeline.
        from seqalign_tpu.pipeline import search_database

        order_scores, dt = search_database(query, db, sc, engine="wavefront")
        gcups = real_cells / dt / 1e9
        _stash_measured(
            _result_line(gcups, dt, n, real_cells, backend, real_cells)
        )
        _DONE.set()
        _emit_best_and_exit(code_if_empty=4)

    from seqalign_tpu.ops.swa_pallas import choose_config, sw_pallas_stream
    from seqalign_tpu.utils.packing import pack_streams

    # Output slots are DMA-flushed to HBM, so the whole database fits one
    # dispatch at full window interleave.
    chunk_slots = 1024
    order = np.arange(n)  # already sorted descending
    prof_dev = jax.device_put(profile)

    def build_and_warm(allow_pack: bool):
        """Pack the DB, build the ONE dynamic-rep chain program, warm it.

        Returns (chain, padded_cells, program_load_s). ``allow_pack=False``
        retries with packed production off — the pack=1 sibling shape is
        the measured runner-up, and a Mosaic compile failure of the packed
        stream kernel must degrade there, not kill the harness.
        """
        packs = []
        padded_cells = 0
        _stash_provenance(
            f"packing {n} entries (allow_pack={allow_pack})"
        )
        for start in range(0, n, chunk_slots * 1024):
            chunk = order[start : start + chunk_slots * 1024]
            nslots = -(-len(chunk) // 1024)
            # +3: the chained-rep perturbation below adds up to 3 to one
            # profile entry; the packed-production bound must cover it.
            pmax = (
                float(np.max(np.abs(profile.astype(np.float64) - go))) + 3
                if allow_pack
                else None
            )
            cfg = choose_config(QUERY_LEN, reserve=(1 << 20), max_abs_bias=pmax)
            pack = pack_streams(db, chunk, cfg.nw, win=1024, jb=cfg.jb, grain=16)
            padded_cells += QUERY_LEN * pack.padded_cells_per_query_row
            packs.append(
                (
                    jax.device_put(pack.streams),  # int8; converts on device
                    jax.device_put(pack.fs),
                    dict(
                        nslots=nslots, nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
                        ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack,
                        upk=cfg.upk,
                    ),
                )
            )
        jax.block_until_ready([prof_dev] + [p[0] for p in packs])
        _stash_provenance("database packed + uploaded; building program")

        # ONE program: dynamic rep count (fori_loop with a traced bound
        # lowers to a while loop — same executable serves reps=1 and 3).
        @jax.jit
        def chain(reps):
            def body(i, acc):
                # Index-perturbed profile: keeps every chained call distinct
                # so XLA cannot hoist the loop-invariant kernel call.
                p = prof_dev.at[0, 0].add((i % 4).astype(jnp.int32))
                for streams_dev, fs_dev, kw in packs:
                    out = sw_pallas_stream(p, streams_dev, fs_dev, go, ge, **kw)
                    acc = acc + out[0, 0]
                return acc

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

        _stash_provenance(
            "main program compile/load in progress (loads measured "
            "68 s-19 min through a degraded tunnel)"
        )
        t_load0 = time.time()
        np.asarray(chain(1))  # compile (persistent-cached) + load + warm
        load_s = time.time() - t_load0
        _progress(f"main program loaded + warmed in {load_s:.0f}s")
        return chain, padded_cells, load_s

    try:
        chain, padded_cells, program_load_s = build_and_warm(True)
    except Exception as ex:
        print(
            f"bench: packed-production chain failed ({type(ex).__name__}: "
            f"{str(ex)[:160]}); retrying with pack=1.",
            file=sys.stderr,
        )
        chain, padded_cells, program_load_s = build_and_warm(False)

    def run(reps: int) -> float:
        t0 = time.perf_counter()
        np.asarray(chain(reps))
        return time.perf_counter() - t0

    # Provisional result the watchdog can fall back on: single fetched run,
    # RTT included, so it is an honest lower bound on the kernel rate.
    t_single = run(1)
    _stash_measured(
        _result_line(
            real_cells / t_single / 1e9, t_single, n, real_cells, backend,
            padded_cells, provisional="single-run wall time, tunnel RTT "
            "included (watchdog fallback; not the two-point kernel time)",
        )
    )
    _progress(f"single-run fallback banked ({t_single:.2f}s wall)")

    # Headline: MEDIAN of 3 interleaved two-point measurements. Round 4
    # measured ±20% rate drift within one hardware session, so a single
    # two-point pair is fragile; reps cost ~0.14 s each next to the
    # multi-minute program load, so the insurance is nearly free.
    dts = []
    for _ in range(3):
        t1 = min(run(1) for _ in range(2))
        t3 = min(run(3) for _ in range(2))
        d = (t3 - t1) / 2
        if d > 0:
            dts.append(d)
    provisional_note = None
    if dts:
        dt = float(np.median(dts))
    else:
        # Timer noise swallowed the work (possible at rehearsal shapes):
        # fall back to the single-run wall time — an honest lower bound —
        # and SAY SO instead of passing noise off as a kernel time.
        dt = t_single
        provisional_note = (
            "all two-point diffs non-positive (work inside timer/RTT "
            "noise); value is single-run wall time incl. tunnel RTT — an "
            "honest lower bound, not a kernel rate"
        )

    gcups = real_cells / dt / 1e9
    _stash_measured(
        _result_line(
            gcups, dt, n, real_cells, backend, padded_cells,
            program_load_s=program_load_s, provisional=provisional_note,
            n_two_point=len(dts),
        )
    )
    _progress(
        f"headline banked: {gcups:.1f} GCUPS (median of {len(dts)} "
        "two-point measurements)"
    )

    # Optional points: a 17-residue query (the reference's inferred
    # benchmark regime, BASELINE.md) and 8 batched 17-residue queries (the
    # CLI default for multi-record query files). Each is its OWN jitted
    # program (the mq point runs the adopted row-stacked production path,
    # a different kernel shape), attempted only while the remaining
    # watchdog budget can absorb another small program load (measured
    # 14-30 s vs ~340 s for the main program; floor 90 s). They share one
    # packed-stream upload whenever their configs agree on (nw, jb).
    short = mq = None
    skip_reasons: list[str] = []  # accumulate — a late failure must not
    # overwrite an earlier point's diagnostic
    est_next_load = 90.0
    if _REHEARSE:
        est_next_load = 0.0  # rehearsal must exercise ALL programs
    pack_cache: dict = {}  # (nw, jb) -> uploaded streams, shared by points
    if _remaining() > est_next_load:
        _progress("optional short-query point: packing/compiling")
        try:
            short = _short_point(jax, jnp, db, sc, aa20, rng, pack_cache)
        except Exception as ex:  # never let optional points kill the line
            skip_reasons.append(
                f"short: {type(ex).__name__}: {str(ex)[:160]}"
            )
        # The stacked multi-query point is its own program (row-stacked
        # production, choose_config(nq=8)); gate it on budget separately
        # so a slow short-point load can only cost us the mq point.
        if _remaining() > est_next_load:
            _progress("optional multi-query point: packing/compiling")
            try:
                mq = _mq_point(jax, jnp, db, sc, aa20, rng, pack_cache)
            except Exception as ex:
                skip_reasons.append(
                    f"mq: {type(ex).__name__}: {str(ex)[:160]}"
                )
        else:
            skip_reasons.append(
                f"mq skipped: {_remaining():.0f}s left < "
                f"{est_next_load:.0f}s estimated program-load cost"
            )
    else:
        skip_reasons.append(
            f"skipped: {_remaining():.0f}s left < {est_next_load:.0f}s "
            "estimated program-load cost"
        )
    _stash_measured(
        _result_line(
            gcups, dt, n, real_cells, backend, padded_cells,
            short=short, mq=mq,
            skip_reason="; ".join(skip_reasons) or None,
            program_load_s=program_load_s, provisional=provisional_note,
            n_two_point=len(dts),
        )
    )
    _DONE.set()
    _emit_best_and_exit(code_if_empty=4)


def _mk_profiles(rng, sc, aa20, nq, lq):
    from seqalign_tpu.ops.swa_xla import make_profile

    profs = np.zeros((nq, lq, 32), dtype=np.int32)
    for k in range(nq):
        q = aa20[rng.choice(20, lq, p=AA_FREQS)].astype(np.int32)
        profs[k] = make_profile(sc.table, q)
    pmax = float(np.max(np.abs(profs.astype(np.float64) - sc.gap_open_total)))
    return profs, pmax + 3


def _two_point_dt(run, *args):
    """Two-point kernel time (3-rep minus 1-rep chained runs, min-of-2
    each). Returns None when the difference is non-positive — at rehearsal
    shapes the work can sit inside timer/RTT noise, and a floored dt would
    fabricate an absurd rate (seen: 4e12 entries/s)."""
    t1 = min(run(1, *args) for _ in range(2))
    t3 = min(run(3, *args) for _ in range(2))
    dt = (t3 - t1) / 2
    return dt if dt > 0 else None


def _pack_cached(jax, db, cfg, cache):
    """Pack + upload the database streams for a config's (nw, jb)
    geometry, reusing a previous upload when the geometry matches — the
    short and multi-query points usually agree, and re-packing 565k
    entries doubles CPU + transfer cost inside the watchdog budget."""
    key = (cfg.nw, cfg.jb)
    if key not in cache:
        from seqalign_tpu.utils.packing import pack_streams

        pack = pack_streams(
            db, np.arange(db.n), cfg.nw, win=1024, jb=cfg.jb, grain=16
        )
        sd = jax.device_put(pack.streams)
        fd = jax.device_put(pack.fs)
        jax.block_until_ready([sd, fd])
        cache[key] = (pack, sd, fd)
    return cache[key]


def _short_point(jax, jnp, db, sc, aa20, rng, pack_cache):
    """17-residue single-query point: the reference's inferred benchmark
    regime (BASELINE.md). Production config + pack; the profile is
    perturbed per chained rep so no dispatch is loop-invariant."""
    from seqalign_tpu.ops.swa_pallas import choose_config, sw_pallas_stream

    lq = 17
    profs, pmax = _mk_profiles(rng, sc, aa20, 1, lq)
    go, ge = sc.gap_open_total, sc.gap_extend
    cfg = choose_config(lq, reserve=(1 << 20), max_abs_bias=pmax)
    pack, sd, fd = _pack_cached(jax, db, cfg, pack_cache)
    pd = jax.device_put(profs[0])
    jax.block_until_ready([pd])
    kw = dict(
        nslots=len(pack.slot_ids), nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
        ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack, upk=cfg.upk,
    )

    @jax.jit
    def chain(reps):
        def body(i, acc):
            pp = pd.at[0, 0].add((i % 4).astype(jnp.int32))
            return acc + sw_pallas_stream(pp, sd, fd, go, ge, **kw)[0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    np.asarray(chain(1))  # compile + program load + warm (untimed)

    def run(reps):
        t0 = time.perf_counter()
        np.asarray(chain(reps))
        return time.perf_counter() - t0

    dt = _two_point_dt(run)
    cells = lq * int(db.offsets[-1])
    if dt is None:
        return {"query_len": lq, "gcups": None,
                "note": "two-point diff non-positive (timer noise)"}
    return {
        "query_len": lq,
        "gcups": round(cells / dt / 1e9, 1),
        "entries_per_s": round(db.n / dt),
        "vs_baseline_gcups": round(cells / dt / 1e9 / BASELINE_GCUPS, 2),
        "vs_baseline_published_entries_per_s": round(
            db.n / dt / BASELINE_ENTRIES_PER_S, 2
        ),
    }


def _mq_point(jax, jnp, db, sc, aa20, rng, pack_cache):
    """8x17-residue multi-query aggregate via the ADOPTED row-stacked
    production path (round 4, docs/hw_r4/ab_mq17.log): the whole query
    block is one full-height fused dot per dispatch —
    choose_config(nq=8) + a single stacked sw_pallas_stream call, exactly
    as the pipeline's --all-queries dispatch runs it."""
    from seqalign_tpu.ops.swa_pallas import choose_config, sw_pallas_stream

    nq, lq = 8, 17
    profs, pmax = _mk_profiles(rng, sc, aa20, nq, lq)
    go, ge = sc.gap_open_total, sc.gap_extend
    cfg = choose_config(lq, reserve=(1 << 20), nq=nq, max_abs_bias=pmax)
    pack, sd, fd = _pack_cached(jax, db, cfg, pack_cache)
    pd = jax.device_put(profs)
    jax.block_until_ready([pd])
    kw = dict(
        nslots=len(pack.slot_ids), nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
        ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack, upk=cfg.upk,
    )

    @jax.jit
    def chain(reps):
        def body(i, acc):
            # Perturb EVERY query's profile: each dispatch differs per rep.
            pp = pd.at[:, 0, 0].add((i % 4).astype(jnp.int32))
            return acc + sw_pallas_stream(pp, sd, fd, go, ge, **kw)[0, 0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    np.asarray(chain(1))  # compile + program load + warm (untimed)

    def run(reps):
        t0 = time.perf_counter()
        np.asarray(chain(reps))
        return time.perf_counter() - t0

    mdt = _two_point_dt(run)
    mcells = nq * lq * int(db.offsets[-1])
    if mdt is None:
        return {"n_queries": nq, "query_len": lq, "aggregate_gcups": None,
                "note": "two-point diff non-positive (timer noise)"}
    return {
        "n_queries": nq,
        "query_len": lq,
        "aggregate_gcups": round(mcells / mdt / 1e9, 1),
        "query_entries_per_s": round(nq * db.n / mdt),
        "vs_published_entries_per_s": round(
            nq * db.n / mdt / BASELINE_ENTRIES_PER_S, 2
        ),
        "production_path": "row-stacked multi-query (round-4 adoption; round-5 (4,4,2) pack2 shape)",
    }


def _result_line(
    gcups, dt, n, real_cells, backend, padded_cells,
    short=None, mq=None, provisional=None, skip_reason=None,
    program_load_s=None, n_two_point=None,
) -> str:
    entries_per_s = n / dt
    detail = {
        "backend": backend,
        "entries": n,
        "entries_per_s": round(entries_per_s),
        "kernel_time_s": round(dt, 4),
        "query_len": QUERY_LEN,
        "real_cells": real_cells,
        "padding_overhead": round(padded_cells / real_cells, 3),
        "pct_of_roofline": round(100 * gcups / ROOFLINE_GCUPS, 1),
        "roofline_gcups": ROOFLINE_GCUPS,
        "roofline_derivation": (
            "docs/DESIGN.md 'The S-path wall' constant-S "
            "isolation study (same DP loop, v5e)"
        ),
        "db_caveat": DB_CAVEAT,
        "baseline_gcups": BASELINE_GCUPS,
        "baseline_derivation": "BASELINE.md 'Derived baseline GCUPS'",
        "published_best_entries_per_s_at_inferred_L17": BASELINE_ENTRIES_PER_S,
        "short_query_point": short,
        "multi_query_point": mq,
        "multi_chip_scaling_tool": "tools/scaling_check.py",
    }
    if _REHEARSE:
        detail["rehearsal"] = (
            "tiny-shape hardware rehearsal (--rehearse); NOT the official "
            "Swiss-Prot-scale number"
        )
    if provisional:
        detail["provisional"] = provisional
    if skip_reason:
        detail["optional_points_skipped"] = skip_reason
    if program_load_s is not None:
        detail["program_load_s_untimed"] = round(program_load_s, 1)
    if n_two_point is not None:
        detail["two_point_measurements_in_median"] = n_two_point
    # 1-decimal rounding is right at TPU scale but collapses tiny CPU
    # smoke-run rates to 0.0; keep 4 significant-ish decimals when small.
    prec = 1 if gcups >= 10 else 4
    return json.dumps(
        {
            "metric": "swissprot_scale_search_gcups",
            "value": round(gcups, prec),
            "unit": "GCUPS",
            "vs_baseline": round(gcups / BASELINE_GCUPS, max(2, prec)),
            "detail": detail,
        }
    )


if __name__ == "__main__":
    main()
