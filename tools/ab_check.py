"""Interleaved (drift-immune) A/B of kernel configs on hardware.

Round-4 measurement finding: GCUPS through the axon tunnel drifts by
~±20% on a few-minute timescale (docs/hw_r4/step4_upk.log vs
step3_sweep.log measured the SAME config 20% apart), so comparing
numbers from different tool sessions — or even the start vs end of one
long sweep — is invalid.  This tool removes drift from the comparison:
every variant's chain is compiled up front, then measurements proceed
in round-robin ROUNDS over all variants, so each variant samples every
time-slice of the session equally.  Medians across rounds are then
directly comparable; the reported spread is honest run-to-run noise.

Timing discipline mirrors tools/exp_pack.py (ONE jitted dynamic-rep
program per variant; two-point (1, reps_hi)-rep subtraction cancels
dispatch overhead) — see exp_pack's docstring for why.  Exactness of
every variant is verified against the CPU wavefront engine before
timing.

High-work settings (round-5 lesson): the per-sample two-point diff must
clear the tunnel's ms-scale noise floor or medians are fiction — lq=17
at the default lb=2048 swung 145→236 GCUPS on noise; at --lb 16384
--reps-hi 33 spreads collapse to <2%.  Size --lb/--reps-hi so a single
diff spans >=0.1 s.

Usage (TPU host):
  python tools/ab_check.py --lq 144 --rounds 5 \
      --cand 2,4,16,144,6,4 --cand 3,8,16,144,6,4 \
      --cand 3,8,16,144,6,4,round
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def parse_cand(s):
    parts = s.split(",")
    if len(parts) not in (6, 7, 8):
        raise ValueError(
            f"--cand wants nw,jb,ui,ic,pipe,pack[,upk[,sdt]]: {s}")
    nw, jb, ui, ic, pipe, pack = (int(x) for x in parts[:6])
    upk = parts[6] if len(parts) > 6 else "floor"
    sdt = parts[7] if len(parts) > 7 else "bf16"
    return nw, jb, ui, ic, pipe, pack, upk, sdt


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lq", type=int, required=True)
    parser.add_argument("--nq", type=int, default=1,
                        help="row-stacked multi-query: stack N queries "
                        "per dispatch (the _SHAPES_MQ decision)")
    parser.add_argument("--lb", type=int, default=2048)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--reps-hi", type=int, default=9,
                        help="high point of the two-point measurement")
    parser.add_argument("--cand", action="append", default=[],
                        help="nw,jb,ui,ic,pipe,pack[,upk] (repeatable)")
    parser.add_argument("--include-production", action="store_true",
                        help="prepend choose_config's shape for --lq")
    parser.add_argument("--sl", type=int, default=8,
                        help="sublanes per window (lanes = sl*128; "
                        "production is 8). VMEM feasibility is checked "
                        "via an nw*(sl/8) proxy config — every term in "
                        "_vmem_ic_budget scales linearly in nw*sl")
    parser.add_argument("--const-s", action="store_true",
                        help="roofline isolation: constant S, no "
                        "substitution production — scores are meaningless "
                        "(exactness check skipped), timing measures the "
                        "pure DP-loop ceiling with drift-immune "
                        "interleaving (the per-band denominator exp_pack "
                        "--const-s measures without drift immunity)")
    args = parser.parse_args()

    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    plat = os.environ.get("SEQALIGN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    interp = os.environ.get("SEQALIGN_TOOLS_INTERPRET") == "1"
    if not interp and jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0
    if interp:
        import functools

        import seqalign_tpu.ops.swa_pallas as _sp

        _sp.sw_pallas_windows = functools.partial(
            _sp.sw_pallas_windows, interpret=True)

    from seqalign_tpu.ops.swa_pallas import (
        KernelConfig,
        choose_config,
        config_fits_vmem,
        sw_pallas_windows,
    )
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    lq, lb, nq = args.lq, args.lb, args.nq
    cpu = jax.devices("cpu")[0]

    variants = []
    if args.include_production:
        base = choose_config(lq, nq=nq, max_abs_bias=18.0)
        if base is not None:
            variants.append((base.nw, base.jb, base.ui, base.ic,
                             base.pipe, base.pack, base.upk or "floor",
                             base.sdt))
    for s in args.cand:
        variants.append(parse_cand(s))
    if not variants:
        print("no variants")
        return 1

    # |P'| <= 12 + 3 + perturb 3 <= 18: safe for pack=4's 31-bound.
    if nq > 1:
        prof = rng.integers(-8, 12, (nq, lq, 32)).astype(np.int32)
    else:
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
    pj = jax.device_put(prof)

    built = []
    for v in variants:
        nw, jb, ui, ic, pipe, pack, upk, sdt = v
        cfg = KernelConfig(nw=nw, jb=jb, ui=ui, ic=ic, pipe=pipe,
                           pack=pack, upk=upk, sdt=sdt)
        proxy = (dataclasses.replace(cfg, nw=nw * (args.sl // 8))
                 if args.sl != 8 else cfg)
        if not config_fits_vmem(lq, proxy, nq=nq):
            print(f"{cfg}: SKIP (exceeds VMEM budget)", flush=True)
            continue
        lanes = args.sl * 128
        dbh = rng.integers(1, 27, (nw, lb, lanes)).astype(np.int32)
        dj = jax.device_put(dbh)
        jax.block_until_ready([dj, pj])
        kw = dict(nw=nw, jb=jb, ui=ui, ic=ic, pipe=pipe, pack=pack,
                  sl=args.sl)
        if pack > 1:
            kw["upk"] = upk
        if sdt != "bf16":
            kw["sdt"] = sdt
        if args.const_s:
            kw["const_s"] = True

        out_shape = ((nq, nw * lanes) if nq > 1
                     else (nw * lanes,))

        def make_chain(dj=dj, kw=kw, out_shape=out_shape):
            # db and profile enter as traced ARGUMENTS — a closure capture
            # would embed them as HLO constants and blow up the remote
            # compile request (HTTP 413 at lb=16384: a 256 MB constant).
            @jax.jit
            def chain2(reps, d, pq):
                def body(i, carry):
                    acc, _ = carry
                    bump = (i % 4).astype(jnp.int32)
                    p = (pq.at[:, 0, 0].add(bump) if nq > 1
                         else pq.at[0, 0].add(bump))
                    out = sw_pallas_windows(p, d, -3, -1, **kw)
                    return acc + out.reshape(-1)[0], out

                return jax.lax.fori_loop(
                    0, reps, body,
                    (jnp.zeros((), jnp.int32),
                     jnp.zeros(out_shape, jnp.int32)))

            return lambda reps: chain2(reps, dj, pj)

        chain = make_chain()
        t0 = time.time()
        try:
            _, out1 = chain(1)
            out1 = np.asarray(out1)
        except Exception as ex:
            print(f"{cfg}: COMPILE FAIL {str(ex)[:90]}", flush=True)
            continue
        load_s = time.time() - t0
        if args.const_s:
            print(f"{cfg}: exact=skipped (const-S roofline)  "
                  f"(load {load_s:.0f}s)", flush=True)
            built.append((cfg, chain, True))
            continue
        with jax.default_device(cpu):
            if nq > 1:
                want = np.stack([
                    np.concatenate([
                        np.asarray(sw_wavefront(prof[q], dbh[w], -3, -1))
                        for w in range(nw)
                    ])
                    for q in range(nq)
                ])
            else:
                want = np.concatenate([
                    np.asarray(sw_wavefront(prof, dbh[w], -3, -1))
                    for w in range(nw)
                ])
        ok = bool((out1 == want).all())
        print(f"{cfg}: exact={ok}  (load {load_s:.0f}s)", flush=True)
        built.append((cfg, chain, ok))

    if not built:
        print("no runnable variants")
        return 1

    hi = args.reps_hi
    cells = nq * lq * lb * args.sl * 128  # per window per rep

    def one(chain, reps):
        t0 = time.perf_counter()
        acc, _ = chain(reps)
        np.asarray(acc)
        return time.perf_counter() - t0

    # warm every chain's dispatch path once before the timed rounds
    for cfg, chain, _ in built:
        one(chain, 1)

    samples = {i: [] for i in range(len(built))}
    for r in range(args.rounds):
        for i, (cfg, chain, _) in enumerate(built):
            t1 = min(one(chain, 1) for _ in range(2))
            t9 = min(one(chain, hi) for _ in range(2))
            dt = max((t9 - t1) / (hi - 1), 1e-9)
            g = cells * cfg.nw / dt / 1e9
            samples[i].append(g)
        print(f"round {r + 1}/{args.rounds}: "
              + "  ".join(f"v{i}={samples[i][-1]:.1f}"
                          for i in range(len(built))), flush=True)

    tag = f" nq={nq}" if nq > 1 else ""
    print(f"\n=== lq={lq}{tag} lb={lb} interleaved medians "
          f"({args.rounds} rounds) ===")
    # Physical-sanity filter: a degraded tunnel occasionally collapses the
    # two-point diff to ~0, yielding absurd per-round values (measured:
    # 1.2e9 GCUPS in docs/hw_r5/ab_lq144.log round 1) that poison the
    # printed spread. Anything past 1.5x the self-measured 469-GCUPS
    # const-S ALU ceiling (docs/DESIGN.md "The S-path wall") is a timer
    # artifact, not a kernel speed; drop it from the median and say so.
    # (const-S chains legitimately exceed the full-kernel ceiling — the
    # 469 anchor IS a const-S number at one shape — so give them 3x.)
    cap = 469.0 * (3.0 if args.const_s else 1.5)
    meds = []
    for i, (cfg, _, ok) in enumerate(built):
        gs = sorted(g for g in samples[i] if g <= cap)
        dropped = args.rounds - len(gs)
        med = float(np.median(gs)) if gs else 0.0
        spread = (gs[-1] - gs[0]) / med * 100 if med else 0.0
        note = f", {dropped} non-physical sample(s) dropped" if dropped else ""
        ex = "skipped(const-S)" if args.const_s else ok
        print(f"v{i} {cfg}: exact={ex}  median {med:6.1f} GCUPS "
              f"(spread {spread:.1f}%{note})", flush=True)
        meds.append(med)
    # Winner selection only over variants that passed the exactness check
    # AND kept at least one physical sample — a fast-but-wrong or
    # unmeasurable config must never print as WINNER.
    eligible = [i for i, (_, _, ok) in enumerate(built) if ok and meds[i] > 0]
    if not eligible:
        print("WINNER: none — no exact variant produced a physical "
              "measurement; values above are for diagnosis only", flush=True)
        return 1
    best = max(eligible, key=lambda i: meds[i])
    print(f"WINNER v{best}: {built[best][0]}  {meds[best]:.1f} GCUPS "
          f"({meds[best] / meds[0]:.3f}x vs v0)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
