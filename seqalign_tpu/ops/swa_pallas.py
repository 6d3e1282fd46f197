"""Pallas TPU kernel for batched Smith-Waterman affine-gap scoring.

The TPU re-design of the reference's AVX2 inner kernel
(``alignment_fill_matrices``, ``src/alignment.c:47-187``). Same decomposition
insight — vectorize *across database sequences*, march the DP sequentially —
but sized and laid out for the TPU vector unit and memory system:

- **Lane batching**: each "window" holds ``SL x 128`` database sequences
  (1024 at SL=8), shaped so every elementwise op is a whole number of native
  vector registers (the reference uses 16 int16 AVX2 lanes).
- **Window interleaving (NW) x body wavefront**: the VPU pipeline needs ~8
  independent dependency chains to saturate (measured: 1 chain ~0.8 Tops/s,
  8 chains ~4.2). Two sources provide them: NW independent windows advanced
  in lockstep, and — inside each window's unrolled (jb x ui) body — an
  anti-diagonal wavefront of ~min(jb, ui) independent cells (cell (t, u)
  depends on (t-1, u) and (t, u-1)). Short queries lean on windows (rows
  are cheap), long queries on deep row unrolls (rows are the VMEM cost);
  ``choose_config`` encodes the measured ranking per query-length band.
- **Rolling rows in VMEM**: linear-space DP like the reference's single-row
  buffers (``src/alignment.c:227-230``), persisted across the sequential
  grid dimension (database-position blocks).
- **j-blocking (JB)**: consecutive database positions are chained through
  vector registers per sweep over the query, dividing VMEM row traffic by
  ``JB`` — the TPU analog of the reference's register-carried ``*_left`` /
  ``*_up_left`` values.
- **MXU substitution lookup**: the reference's scalar L1-table gather
  (``scoring_lookup``, ``src/alignment.c:31-44``) becomes a query-profile x
  one-hot(db chars) matmul on the MXU, exact in bf16xbf16->f32 because every
  output is one product of a 0/1 weight with a small-integer score.
- **f32 arithmetic**: the VPU's int32 and float32 element rates are equal
  (measured), all DP values are integers far below 2**24 (|score| <=
  (127+|go|) * len), so f32 is exact and skips the per-cell f32->int32
  convert the MXU path would otherwise need. Scores convert to int32 once,
  at emit. This subsumes the reference's int16 wraparound (SURVEY.md §7.4)
  and the overflow-rescan its north star asks for: no overflow is possible
  for any sequence either engine can hold in memory.

**The G-form recurrence.** The reference's formulation
(``src/alignment.c:122-161``, floors included) is:

    H = max(0, H_d+s, E_d+s, F_d+s)         (d = diagonal)
    E = max(0, H_u+go, E_u+ge, F_u+go)      (u = previous db position)
    F = max(0, H_l+go, E_l+go, F_l+ge)      (l = previous query position)

Define G = max(H, E, F). Because H >= 0 pointwise, G = max(H', E, F, 0) with
H' = G_d + s unfloored. Given ge >= go (gap_open <= 0, which the reference's
scoring always satisfies — penalties are negative, ``scoring_init``), the
E/F updates collapse onto G:

    max(H_u, F_u) + go  ==  max(H_u+go, E_u+go, F_u+go)   [E_u+go <= E_u+ge]
                        ==  G_u + go
    E = max(G_u + go, E_u + ge)
    F = max(G_l + go, F_l + ge)
    H' = G_d + s
    G = max(max(H', E), max(F, 0))

and the running maximum can be tracked on G instead of H: every E/F value
is some earlier H plus negative gap penalties, so max over cells of G equals
max over cells of floored H (both >= 0). The E/F zero-floors are dropped as
before (H's 0 inside G dominates them everywhere they could be observed).
This is 4 adds + 6 maxes per cell (vs 12 ops for the direct form), and the
cell state shrinks to (Gg = G+go, E) per row and (Gg, F) per column chain —
two row buffers instead of three, which buys more interleaved windows under
the same VMEM budget. The ``-go`` bias on stored G is folded into the
substitution profile (``P'[i,c] = table[q_i,c] - go``) so the diagonal term
is a single add: H' = Gg_d + P'[i, char]. Bit-exactness against the
reference recurrences is pinned by the oracle differential tests.

Implementation notes forced by this jax/libtpu version's Mosaic:
- ``fori_loop`` carries whose yield is not derived from their own carry slot
  trip an "Invalid relayout ... replicated" layout-solver bug; the
  left/diagonal chain state is therefore routed through a small VMEM scratch
  buffer between unrolled row groups (UI rows per group), and the only loop
  carries are self-derived running maxima.
- int16/int8 vector arithmetic does not compile at all (the reference's
  16-bit-lane trick has no TPU analog on this toolchain), and kernels whose
  unrolled inner body is too large crash the compiler — window count x
  j-block x row-unroll is capped (see ``choose_config``).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ALPHA = 32  # alphabet slots

# Defaults tuned on TPU v5e (see docs/DESIGN.md for the measurement log).
DEFAULT_SL = 8  # sublanes per window (8 -> 1024 seqs/window)
DEFAULT_NW = 8  # interleaved windows
DEFAULT_JB = 4  # db positions chained through registers per row sweep
DEFAULT_UI = 4  # unrolled query rows per loop iteration

# Largest |P'| = |table - go| exactly representable in bfloat16.
_BF16_EXACT = 256


def _run_block(
    prof_ref,
    d,  # (NW, JB, SL, LANES) int32 db chars for this j-block
    row_gg,
    row_e,
    s_buf,
    best_ref,  # (NW, NQ, SL, LANES) f32 running best per query
    state_ref,
    *,
    lqp: int,
    sl: int,
    nw: int,
    jb: int,
    ic: int,
    ui: int,
    nc: int,
    go: int,
    ge: int,
    nq: int = 1,
    lqe: int | None = None,
    bnd=None,
    pipe: int = 0,
    pack: int = 1,
    upk: str | None = None,  # None = PRODUCTION_UPK (resolved by wrappers)
    sdt: str = "bf16",  # S-dot operand dtype ("bf16" | "int8", pipe=6 pack=1)
    const_s: bool = False,
):
    """Advance the DP over one j-block (JB db positions x all query rows).

    Shared by the fixed-batch and segmented-stream kernels. Reads/writes the
    rolling row buffers and the running bests in scratch.

    Multi-query batching: the row dimension holds ``nq`` queries of ``lqe``
    padded rows each (``lqp = nq * lqe``; ``lqe % ui == 0`` so query
    boundaries always land on unrolled-group starts). Each query's DP is
    fully independent: at a boundary group the left/diagonal chain resets to
    the column boundary, and each group folds its max into that query's
    ``best_ref`` slot. This amortizes the per-db-position one-hot build and
    the S-matmul across queries — the big win for short queries — and is
    the capability the reference lacks entirely (one query per run,
    ``src/alignment_cmdline.c:355-360``).

    S-production variants (``pipe``, round-2 study in docs/DESIGN.md):
    because the chunk loop is Python-unrolled, the double-buffer parity is
    *static* (no dynamic indices, the round-1 blocker); ``pipe`` requires
    ``ic`` a multiple of ``ui`` (row groups emitted straight-line, no
    fori_loop boundary).
      pipe=0: per-(w,t) dots, fori_loop row groups (deep-unroll bands);
      pipe=5: fuse each window's JB dots into one taller dot;
      pipe=6: fuse EVERYTHING into ONE (IC,32)@(32,NW*JB*SL,LANES) dot per
              chunk — the merged-sublane s_buf layout makes the dot's
              natural output order the DP's read order, so fusion costs no
              relayout.
    Only 0/5/6 exist: the round-2 study also built modes 1-4 (dot
    reordering, source-level spreading, register-valued S, bf16 s_buf)
    and round 3 a bf16-dot-output mode 7 — ALL measured no-ops or losers
    (the wall is dot COUNT, not scheduling, store slots, or VMEM
    bandwidth; fused 5/6 win 2x at lq=17, +10-15%% at lq~96-190). They
    were pruned in round 5; the negative results and their measurement
    logs are preserved in docs/DESIGN.md ("S-production pipelining" and
    the round-2/3 tables) and the committed exp_spipe logs.

    Packed production (``pack`` in {2, 4}, pipe=6 only — the round-3
    attack on the result-stream wall): ``pack`` query rows' biased scores
    are packed into ONE f32 dot output via power-of-2 field scaling. The
    packed profile holds ``pack`` copies of the alphabet along K (so
    K = pack*32, still <= the MXU's native 128) with row 4k's scores
    scaled by 2^18, row 4k+1's by 2^12 (biased +32), etc.; the duplicated
    one-hot selects the same db char in every copy, so each output is
    exactly ``sum_s scale_s * (P'[pack*k+s, c] + bias_s)`` — exact in f32
    because every field is an integer < 2^6 (pack=4, requires max|P'| <=
    31) or < 2^9 (pack=2, scale 512/bias 128, requires max|P'| <= 128)
    and the packed total stays under 2^24. The DP unpacks fields
    sequentially (one floor + mul + sub per row) as the row loop
    advances, carrying the remainder in a register per (w, t) chain.
    Result volume, s_buf stores/loads, and s_buf VMEM all shrink by
    ``pack``; the MXU pass count is unchanged (K grows toward its native
    128). Gate: the CALLER must guarantee the |P'| bound (see
    choose_config(max_abs_bias=...)); exactness is oracle-pinned in
    tests.
    """
    if pipe not in (0, 5, 6):
        raise ValueError(
            f"pipe={pipe} was pruned (round 5): only 0/5/6 exist; the "
            "removed modes' negative results live in docs/DESIGN.md"
        )
    if sdt not in ("bf16", "int8"):
        raise ValueError(f"sdt={sdt!r}: only 'bf16' and 'int8' exist")
    if sdt == "int8" and (pipe != 6 or pack != 1):
        # int8 S-dot (round 5): the MXU's int8 path streams the K axis at
        # 2x the bf16 rate (tools/dot_probe.py: 0.55x dot time at the
        # short band's (18,32)@(32,N) shape), but int8 fields cannot carry
        # packed scales, and only the pipe=6 fused dot was integrated —
        # the pack>1 bands already cut the dot cost 4x by packing.
        raise ValueError("sdt='int8' requires pipe=6 and pack=1")
    if lqe is None:
        lqe = lqp
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    zero = jnp.float32(0)

    # Left boundary (query position -1) for every j-block: G = 0 -> Gg = go,
    # F = 0, diagonal Gg = go (local alignment zero boundary,
    # src/alignment.c:77-85, 91-97).
    gg0 = jnp.full((sl, LANES), go_f, jnp.float32)
    f0 = jnp.zeros((sl, LANES), jnp.float32)

    def reset_chain():
        for w in range(nw):
            for t in range(jb):
                state_ref[w, 2 * t] = gg0
                state_ref[w, 2 * t + 1] = f0
            state_ref[w, 2 * jb] = gg0

    if bnd is None:
        reset_chain()
    else:
        # Query striping: the row above this stripe is a real DP row; its
        # (Gg, F) per db position seed the left chain, and the previous
        # block's last-t Gg seeds the diagonal (t0 passed by the caller).
        bnd_vals, t0_vals = bnd
        for w in range(nw):
            for t in range(jb):
                state_ref[w, 2 * t] = bnd_vals[w][t][0]
                state_ref[w, 2 * t + 1] = bnd_vals[w][t][1]
            state_ref[w, 2 * jb] = t0_vals[w]

    if pipe == 5:
        # Fused production: one (IC,32)@(32, JB*SL, LANES) dot per window
        # covers all JB db positions (4x fewer dots, same result volume).
        c_iota5 = jax.lax.broadcasted_iota(
            jnp.int32, (ALPHA, jb * sl, LANES), 0
        )
        onehots_w = [
            (
                c_iota5 == d[w].reshape(jb * sl, LANES)[None]
            ).astype(jnp.bfloat16)
            for w in range(nw)
        ]
    elif pipe == 6:
        # Maximal fusion: ONE (IC,32)@(32, NW*JB*SL, LANES) dot per chunk
        # covers every window and db position; the merged-sublane layout
        # means the DP reads it back with static slices, no relayout.
        # pack>1: the one-hot repeats along K (iota mod ALPHA) so each of
        # the pack per-row alphabet copies selects the same db char.
        c_iota6 = jax.lax.broadcasted_iota(
            jnp.int32, (pack * ALPHA, nw * jb * sl, LANES), 0
        )
        if pack > 1:
            c_iota6 = jnp.bitwise_and(c_iota6, ALPHA - 1)
        # sdt="int8": the one-hot and profile feed the MXU's int8 path
        # (half the bf16 K-stream cost; int8->int32 dots compile in
        # Mosaic even though int8 ELEMENTWISE vector ops do not — the
        # bool->int8 cast here is the one exception that lowers).
        onehot_all = (
            c_iota6 == d.reshape(nw * jb * sl, LANES)[None]
        ).astype(jnp.int8 if sdt == "int8" else jnp.bfloat16)
    else:
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, sl, LANES), 0)
        # One-hot encodings are chunk-invariant: build once per grid step.
        onehots = [
            [(c_iota == d[w, t][None]).astype(jnp.bfloat16) for t in range(jb)]
            for w in range(nw)
        ]

    def dot_one(c, w, t):
        # Substitution scores for query rows [c*IC, c*IC+IC) x db position
        # (w, t): one-hot matmul on the MXU (exact; see module docstring).
        p_chunk = prof_ref[pl.ds(c * ic, ic), :]  # (IC, 32) bf16
        return jax.lax.dot_general(
            p_chunk,
            onehots[w][t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (IC, SL, LANES) f32

    def produce_one(c, w, t, sbase):
        s_buf[sbase + w, t] = dot_one(c, w, t)

    def produce_w(c, w, sbase):
        # pipe=5: all JB positions of window w in one dot; the output
        # (IC, JB*SL, LANES) layout matches s_buf directly.
        p_chunk = prof_ref[pl.ds(c * ic, ic), :]
        s_buf[sbase + w] = jax.lax.dot_general(
            p_chunk,
            onehots_w[w],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def produce(c, sbase):
        if const_s:
            return  # roofline isolation: no S production at all
        if pipe == 6:
            icp = ic // pack  # packed rows per chunk (pack=1: just ic)
            p_chunk = prof_ref[pl.ds(c * icp, icp), :]
            if sdt == "int8":
                # int8 x int8 -> int32 on the MXU (preferred f32 from int8
                # inputs crashes the remote compiler, HTTP 500); the
                # int32->f32 store cast is one VPU op per result vreg,
                # small next to the halved K-stream at pack=1 shapes.
                s_buf[sbase] = jax.lax.dot_general(
                    p_chunk,
                    onehot_all,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(s_buf.dtype)
                return
            s_buf[sbase] = jax.lax.dot_general(
                p_chunk,
                onehot_all,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=s_buf.dtype,
            )
            return
        for w in range(nw):
            if pipe == 5:
                produce_w(c, w, sbase)
            else:
                for t in range(jb):
                    produce_one(c, w, t, sbase)

    # Packed-production remainder carries: one register chain per (w, t),
    # holding the not-yet-unpacked low fields of the current row group.
    # Only mutated in straight-line (static) emission: pipe=6 is always a
    # pipe mode, so rows are emitted as Python iterations in order.
    scarry = [[None] * jb for _ in range(nw)]
    if pack > 1:
        if pipe != 6:
            raise ValueError("pack > 1 requires the fused-dot mode (pipe=6)")
        if ic % pack:
            raise ValueError(f"pack={pack} requires ic % pack == 0 ({ic=})")
    _pk_scale = {2: (512.0,), 4: (262144.0, 4096.0, 64.0)}.get(pack, ())
    _pk_bias = 128.0 if pack == 2 else 32.0

    def unpack_s(w, t, x, phase):
        """Field ``phase`` of the packed S value; x is the packed load at
        phase 0 (None afterwards — the remainder carries in scarry).

        Biased non-negative lower fields, floor extraction (upk="floor",
        the only mode — see the PRODUCTION_UPK note for the removed
        "round" variant's negative result).
        """
        if phase == 0:
            hi = jnp.floor(x * (1.0 / _pk_scale[0]))
            scarry[w][t] = x - hi * _pk_scale[0]
            return hi
        rem = scarry[w][t]
        if phase == pack - 1:
            return rem - _pk_bias
        f = jnp.floor(rem * (1.0 / _pk_scale[phase]))
        scarry[w][t] = rem - f * _pk_scale[phase]
        return f - _pk_bias

    # const_s: roofline isolation (docs/DESIGN.md "The S-path wall") — S
    # becomes a register constant, production and s_buf traffic vanish,
    # only the DP loop remains. Timing-only: scores are meaningless.
    sconst = jnp.full((sl, LANES), jnp.float32(7.0)) if const_s else None

    def emit_group(c, g, sbase):
        """DP over rows [c*ic + g*ui, +ui). ``g`` may be a Python int
        (straight-line emission, pipe mode) or traced (fori_loop body)."""
        base = c * ic + g * ui
        static = isinstance(base, int)
        if nq > 1:
            qidx = base // lqe
            if static:
                if base % lqe == 0 and base > 0:
                    reset_chain()
            else:
                # A new query starts here: cut the left/diagonal chain.
                @pl.when(jnp.logical_and(base % lqe == 0, base > 0))
                def _cut():
                    reset_chain()
        else:
            qidx = 0
        lgg = [[state_ref[w, 2 * t] for t in range(jb)] for w in range(nw)]
        lf = [
            [state_ref[w, 2 * t + 1] for t in range(jb)] for w in range(nw)
        ]
        dt = [state_ref[w, 2 * jb] for w in range(nw)]
        gmax = [zero for _ in range(nw)]
        for u in range(ui):
            i = base + u
            gg_prev = [row_gg[w, i] for w in range(nw)]
            e_prev = [row_e[w, i] for w in range(nw)]
            # Diagonal chain: row i's t=0 diagonal is Gg at (previous
            # block's last t, i-1); row i+1's is this row's pre-update
            # row_gg[i] — captured here before the sweep overwrites it.
            t0n = gg_prev
            for t in range(jb):
                if const_s:
                    s = [sconst for _ in range(nw)]
                elif pipe == 6:
                    if pack == 1:
                        s = [
                            s_buf[
                                sbase,
                                i - c * ic,
                                (w * jb + t) * sl : (w * jb + t + 1) * sl,
                            ].astype(jnp.float32)
                            for w in range(nw)
                        ]
                    else:
                        # Packed: load one vreg row per pack rows, unpack
                        # fields as the (static) row index advances.
                        phase = i % pack
                        s = [
                            unpack_s(
                                w,
                                t,
                                s_buf[
                                    sbase,
                                    (i - c * ic) // pack,
                                    (w * jb + t) * sl
                                    : (w * jb + t + 1) * sl,
                                ]
                                if phase == 0
                                else None,
                                phase,
                            )
                            for w in range(nw)
                        ]
                elif pipe == 5:
                    s = [
                        s_buf[sbase + w, i - c * ic, t * sl : (t + 1) * sl]
                        for w in range(nw)
                    ]
                else:
                    s = [
                        s_buf[sbase + w, t, i - c * ic].astype(jnp.float32)
                        for w in range(nw)
                    ]
                hp = [dt[w] + s[w] for w in range(nw)]  # H' = G_d + s
                e = [
                    jnp.maximum(gg_prev[w], e_prev[w] + ge_f)
                    for w in range(nw)
                ]
                f = [
                    jnp.maximum(lgg[w][t], lf[w][t] + ge_f)
                    for w in range(nw)
                ]
                t1 = [jnp.maximum(hp[w], e[w]) for w in range(nw)]
                t2 = [jnp.maximum(f[w], zero) for w in range(nw)]
                gv = [jnp.maximum(t1[w], t2[w]) for w in range(nw)]
                gmax = [jnp.maximum(gmax[w], gv[w]) for w in range(nw)]
                gg = [gv[w] + go_f for w in range(nw)]
                for w in range(nw):
                    dt[w] = lgg[w][t]  # diagonal for t+1: Gg(t, i-1)
                    lgg[w][t] = gg[w]
                    lf[w][t] = f[w]
                gg_prev = gg
                e_prev = e
            dt = t0n
            for w in range(nw):
                row_gg[w, i] = gg_prev[w]
                row_e[w, i] = e_prev[w]
        for w in range(nw):
            for t in range(jb):
                state_ref[w, 2 * t] = lgg[w][t]
                state_ref[w, 2 * t + 1] = lf[w][t]
            state_ref[w, 2 * jb] = dt[w]
            best_ref[w, qidx] = jnp.maximum(best_ref[w, qidx], gmax[w])

    if pipe:
        # Static-parity software pipelining: ic a multiple of ui (groups
        # emitted straight-line as static Python iterations), chunk c's DP
        # reads parity c%2 while chunk c+1's dots fill parity (c+1)%2.
        if ic % ui:
            raise ValueError(
                f"pipe mode requires ic % ui == 0 (got {ic=}, {ui=})"
            )

        def emit_chunk(c, sbase):
            for g in range(min(ic, lqp - c * ic) // ui):
                emit_group(c, g, sbase)

        produce(0, 0)
        par = 1 if pipe == 6 else nw  # parity stride in s_buf leading dim
        for c in range(nc):
            sb_cur = (c % 2) * par
            sb_nxt = ((c + 1) % 2) * par
            if c + 1 < nc:
                # Fused dots for chunk c+1 issue before chunk c's DP rows
                # drain parity sb_cur (static double buffering).
                produce(c + 1, sb_nxt)
            emit_chunk(c, sb_cur)
    else:
        for c in range(nc):
            produce(c, 0)
            groups = min(ic, lqp - c * ic) // ui
            jax.lax.fori_loop(
                0,
                groups,
                lambda g, carry, c=c: (emit_group(c, g, 0), carry)[1],
                jnp.zeros((), jnp.int32),
            )


def _sbuf_scratch(pipe, nc, nw, jb, ic, sl, pack):
    """The S-block scratch spec shared by all three kernel wrappers.

    Pipe modes double-buffer s_buf so chunk c+1's dots can fill one
    parity while chunk c's DP drains the other — but a full-height chunk
    (``nc == 1``) has no second chunk: _run_block's loop only ever
    touches parity 0, so the second parity would be dead VMEM. It WAS:
    the round-4 audit's "32 chains need 15.5 MiB" bound counted a never-
    referenced 4.7 MiB parity for the lq=144 full-height pack=4 shapes.
    Single chunk -> single parity (and _vmem_ic_budget mirrors this).
    """
    par = 2 if (pipe and nc > 1) else 1
    if pipe == 6:
        shape = (par, ic // pack, nw * jb * sl, LANES)
    elif pipe == 5:
        shape = (par * nw, ic, jb * sl, LANES)
    else:  # pipe == 0: single-parity per-(w,t) blocks
        shape = (nw, jb, ic, sl, LANES)
    return pltpu.VMEM(shape, jnp.float32)


def _kernel(
    prof_ref,  # (NC*IC, ALPHA) bf16 biased query profile (padded rows zero)
    db_ref,  # (NW, 1, JB, SL, LANES) int32 db chars for this grid step
    out_ref,  # (NW, NQ, SL, LANES) int32 best scores
    row_gg,  # scratch (NW, LQP, SL, LANES) f32: Gg = G+go at (prev t, i)
    row_e,  # scratch (NW, LQP, SL, LANES) f32: E at (prev t, i)
    s_buf,  # scratch (NW, JB, IC, SL, LANES) f32 biased substitution scores
    best_ref,  # scratch (NW, NQ, SL, LANES) f32
    state_ref,  # scratch (NW, 2*JB+1, SL, LANES) f32 left/diag chain
    **params,
):
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    go_f = jnp.float32(params["go"])

    @pl.when(j == 0)
    def _init():
        # Boundary G = 0 for the column left of the database start ->
        # stored biased value is go.
        row_gg[...] = jnp.full_like(row_gg, go_f)
        row_e[...] = jnp.zeros_like(row_e)
        best_ref[...] = jnp.zeros_like(best_ref)

    _run_block(
        prof_ref, db_ref[:, 0], row_gg, row_e, s_buf, best_ref, state_ref,
        **params,
    )

    @pl.when(j == nj - 1)
    def _emit():
        out_ref[...] = best_ref[...].astype(jnp.int32)


def _kernel_stream(
    fs_ref,  # (1, NW, 2) int32 SMEM: [w,0] flush-slot+1 at block start;
    #          [w,1] final flush-slot+1 (only nonzero on the last block)
    prof_ref,  # (NC*IC, ALPHA) bf16 biased query profile
    db_ref,  # (NW, 1, JB, SL, LANES) int32 stream chars for this grid step
    out_ref,  # (NSLOTS, NQ, SL, LANES) int32 per-segment bests, in HBM (ANY)
    row_gg,
    row_e,
    s_buf,
    best_ref,  # (NW, NQ, SL, LANES) f32
    state_ref,
    stage_ref,  # (NQ, SL, LANES) int32 DMA staging for flushes
    sem,  # DMA semaphore
    *,
    lqp: int,
    sl: int,
    nw: int,
    nq: int = 1,
    **params,
):
    """Segmented-stream variant: each window carries its own concatenation of
    database lane-groups (segments). A nonzero ``fs[w,0]`` on a block means a
    new segment starts here: the finished previous segment's best is flushed
    to its output slot and that window's DP state resets. This scores an
    arbitrarily long database in ONE dispatch — the TPU replacement for the
    reference's stream of OpenMP batch dispatches (src/alignment_cmdline.c:
    501-527), with no per-batch launch cost or shape recompilation.
    """
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    go_f = jnp.float32(params["go"])

    @pl.when(j == 0)
    def _init():
        row_gg[...] = jnp.full_like(row_gg, go_f)
        row_e[...] = jnp.zeros_like(row_e)
        best_ref[...] = jnp.zeros_like(best_ref)

    def flush(w, slot):
        # The output lives in HBM (frees the VMEM the slot buffer would
        # otherwise pin, buying more interleaved windows): stage the int32
        # scores in VMEM and DMA them to the slot. ~1 DMA per 1024 records.
        stage_ref[...] = best_ref[w].astype(jnp.int32)
        copy = pltpu.make_async_copy(stage_ref, out_ref.at[slot - 1], sem)
        copy.start()
        copy.wait()

    for w in range(nw):
        slot = fs_ref[0, w, 0]

        @pl.when(slot > 0)
        def _flush(w=w, slot=slot):
            flush(w, slot)
            best_ref[w] = jnp.zeros((nq, sl, LANES), jnp.float32)
            row_gg[w] = jnp.full((lqp, sl, LANES), go_f, jnp.float32)
            row_e[w] = jnp.zeros((lqp, sl, LANES), jnp.float32)

    _run_block(
        prof_ref, db_ref[:, 0], row_gg, row_e, s_buf, best_ref, state_ref,
        lqp=lqp, sl=sl, nw=nw, nq=nq, **params,
    )

    @pl.when(j == nj - 1)
    def _final():
        for w in range(nw):
            slot = fs_ref[0, w, 1]

            @pl.when(slot > 0)
            def _flush_end(w=w, slot=slot):
                flush(w, slot)


def _kernel_stream_striped(
    fs_ref,  # (1, NW, 2) int32 SMEM segment table (see _kernel_stream)
    prof_ref,  # (NC*IC, ALPHA) bf16 biased profile rows of THIS stripe
    db_ref,  # (NW, 1, JB, SL, LANES) int32 stream chars
    *refs,
    lqp: int,
    sl: int,
    nw: int,
    jb: int,
    has_in: bool,
    has_out: bool,
    **params,
):
    """Query-striped segmented-stream kernel (one pass = one row stripe).

    Long queries exceed the VMEM rolling-row budget (MAX_QUERY_ROWS); the
    DP is then run in row stripes. Between stripes the only coupling is the
    left/diagonal chain at the stripe's last row, per database position:
    pass p streams that (Gg, F) boundary out through HBM and pass p+1
    streams it back in, seeding each block's chain instead of the zero
    boundary. Per-pass outputs merge by max on the caller (the running
    best of G is a max over disjoint row sets). The reference handles long
    queries only by RAM growth (src/alignment.c:227-230); this keeps the
    TPU kernel at full window interleave for arbitrary query lengths.

    Ref layout after db_ref: [bnd_in] out [bnd_out] row_gg row_e s_buf
    best_ref state_ref prevb_ref, where bnd arrays are (NW, 1, 2*JB, SL,
    LANES) f32 blocks (slot 2t = Gg, 2t+1 = F at row stripe_end) and
    prevb_ref carries the previous block's last-t boundary Gg (the
    diagonal seed).
    """
    i = 0
    bin_ref = refs[i] if has_in else None
    i += 1 if has_in else 0
    out_ref = refs[i]
    i += 1
    bout_ref = refs[i] if has_out else None
    i += 1 if has_out else 0
    (
        row_gg, row_e, s_buf, best_ref, state_ref, prevb_ref, stage_ref, sem,
    ) = refs[i : i + 8]

    j = pl.program_id(0)
    nj = pl.num_programs(0)
    go_f = jnp.float32(params["go"])

    @pl.when(j == 0)
    def _init():
        row_gg[...] = jnp.full_like(row_gg, go_f)
        row_e[...] = jnp.zeros_like(row_e)
        best_ref[...] = jnp.zeros_like(best_ref)
        prevb_ref[...] = jnp.full_like(prevb_ref, go_f)

    def flush(w, slot):
        stage_ref[...] = best_ref[w].astype(jnp.int32)
        copy = pltpu.make_async_copy(stage_ref, out_ref.at[slot - 1], sem)
        copy.start()
        copy.wait()

    for w in range(nw):
        slot = fs_ref[0, w, 0]

        @pl.when(slot > 0)
        def _flush(w=w, slot=slot):
            flush(w, slot)
            best_ref[w] = jnp.zeros((1, sl, LANES), jnp.float32)
            row_gg[w] = jnp.full((lqp, sl, LANES), go_f, jnp.float32)
            row_e[w] = jnp.zeros((lqp, sl, LANES), jnp.float32)
            # New sequence: the diagonal seed is the db-start boundary.
            prevb_ref[w] = jnp.full((sl, LANES), go_f, jnp.float32)

    if has_in:
        bvals = [
            [
                (bin_ref[w, 0, 2 * t], bin_ref[w, 0, 2 * t + 1])
                for t in range(jb)
            ]
            for w in range(nw)
        ]
        t0_vals = [prevb_ref[w] for w in range(nw)]
        for w in range(nw):
            prevb_ref[w] = bin_ref[w, 0, 2 * (jb - 1)]
        bnd = (bvals, t0_vals)
    else:
        bnd = None

    _run_block(
        prof_ref, db_ref[:, 0], row_gg, row_e, s_buf, best_ref, state_ref,
        lqp=lqp, sl=sl, nw=nw, jb=jb, bnd=bnd, **params,
    )

    if has_out:
        for w in range(nw):
            for t in range(jb):
                bout_ref[w, 0, 2 * t] = state_ref[w, 2 * t]
                bout_ref[w, 0, 2 * t + 1] = state_ref[w, 2 * t + 1]

    @pl.when(j == nj - 1)
    def _final():
        for w in range(nw):
            slot = fs_ref[0, w, 1]

            @pl.when(slot > 0)
            def _flush_end(w=w, slot=slot):
                flush(w, slot)


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Tile configuration for one query length (see choose_config)."""

    nw: int  # interleaved windows
    jb: int  # db positions per register chain
    ui: int  # unrolled query rows per loop iteration
    ic: int  # query rows per substitution chunk
    pipe: int = 0  # S-production mode (0, 5, or 6); 5/6 = fused dots,
    # the production winners — mode table in _run_block / docs/DESIGN.md
    pack: int = 1  # query rows packed per dot output (1, 2, 4; pipe=6
    # only) — see _run_block's packed-production docstring for the
    # |P'| bounds each pack level requires
    upk: str = "floor"  # packed-field extraction mode; "floor" is the
    # only mode (see the PRODUCTION_UPK note for the pruned "round")
    sdt: str = "bf16"  # S-dot operand dtype: "bf16", or "int8" (pipe=6
    # pack=1 only; the MXU's int8 path halves the K-stream cost —
    # tools/dot_probe.py — and is exact for |P'| <= 127, gated by
    # choose_config(max_abs_bias=...))


def _pack_profile(
    prof32: jax.Array, pack: int, upk: str = "floor"
) -> jax.Array:
    """Pack ``pack`` consecutive biased profile rows into one row of
    ``pack`` scaled alphabet copies (K = pack*32), bf16.

    Every field is exact in bf16 (integer magnitude <= 256 after bias, and
    the scales are powers of two), and the dot's per-output sum of the
    selected fields is exact in f32 (< 2^24). See _run_block's packed-
    production docstring for the bounds the caller must guarantee.
    """
    if upk != "floor":
        raise ValueError(
            f"upk={upk!r} was pruned (round 5): floor extraction is the "
            "only mode — the 'round' variant lost the round-4 hardware "
            "A/B decisively (docs/DESIGN.md, docs/hw_r4/ab_lq144.log)"
        )
    rows = prof32.shape[0]
    pr = prof32.reshape(rows // pack, pack, ALPHA)
    if pack == 2:
        fields = [pr[:, 0] * 512.0, pr[:, 1] + 128.0]
    else:
        fields = [
            pr[:, 0] * 262144.0,
            (pr[:, 1] + 32.0) * 4096.0,
            (pr[:, 2] + 32.0) * 64.0,
            pr[:, 3] + 32.0,
        ]
    return jnp.concatenate(fields, axis=1).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "go", "ge", "sl", "nw", "jb", "ic", "ui", "pipe", "pack", "upk",
        "sdt", "const_s", "interpret",
    ),
)
def sw_pallas_windows(
    profile: jax.Array,
    db_windows: jax.Array,
    go: int,
    ge: int,
    *,
    sl: int = DEFAULT_SL,
    nw: int = DEFAULT_NW,
    jb: int = DEFAULT_JB,
    ic: int | None = None,
    ui: int = DEFAULT_UI,
    pipe: int = 0,
    pack: int = 1,
    upk: str | None = None,  # None = PRODUCTION_UPK (resolved by wrappers)
    sdt: str = "bf16",  # S-dot dtype; "int8" needs pipe=6 pack=1, |P'|<=127
    const_s: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Score one or more queries against NW stacked lane-batch windows.

    Args:
      profile: (Lq, 32) int query profile ``P[i, c] = table[q_i, c]``, or
        (NQ, Lq, 32) for a batch of NQ equal-padded queries (multi-query
        batching; pad shorter queries' profile rows with zeros — padding
        rows never change scores).
      db_windows: (NW, Lb, SL*128) int database batch, window-major,
        position-major within a window, '*'-padded; ``Lb % jb == 0``.
      go: total gap-open penalty (gap_open + gap_extend), negative.
      ge: gap-extend penalty, negative. Requires ge >= go (gap_open <= 0),
        the reference's invariant; the G-form recurrence depends on it.

    Returns:
      (NW * SL * 128,) int32 best scores, window-major lane order — or
      (NQ, NW * SL * 128) for a 3-D profile.

    Queries are internally padded to a multiple of ``ui`` with zero-bias
    rows (H' = Gg_d <= G_d <= best there), so scores are unchanged.
    """
    if ge < go:
        raise ValueError(f"G-form kernel requires ge >= go (got {go=}, {ge=})")
    if upk is None:
        upk = PRODUCTION_UPK  # the production extraction-mode constant
    multi = profile.ndim == 3
    nq = profile.shape[0] if multi else 1
    lq = profile.shape[-2]
    nw_in, lb, b = db_windows.shape
    if nw_in != nw or b != sl * LANES:
        raise ValueError(
            f"db_windows shape {db_windows.shape} != (nw={nw}, Lb, {sl*LANES})"
        )
    if lb % jb != 0:
        raise ValueError(f"db length {lb} not a multiple of jb={jb}")
    # Rows pad to ui; with packed production also to pack, so every packed
    # group sits inside one query and every chunk base is pack-aligned.
    lat = ui * pack // math.gcd(ui, pack)
    lqe = -(-lq // lat) * lat
    lqp = nq * lqe
    if ic is None:
        ic = lqp
    ic = min(-(-ic // lat) * lat, lqp)
    nc = -(-lqp // ic)
    nj = lb // jb

    # Biased profile P' = P - go, exact in bf16 (|P'| <= 256 asserted by the
    # dispatcher; see supported_scoring). Each query pads to lqe rows of
    # zeros, then the whole stack pads to the chunk lattice.
    prof = profile.astype(jnp.float32) - go
    if multi:
        prof = jnp.pad(prof, ((0, 0), (0, lqe - lq), (0, 0)))
        prof = prof.reshape(nq * lqe, ALPHA)
    else:
        prof = jnp.pad(prof, ((0, lqe - lq), (0, 0)))
    prof = jnp.pad(prof, ((0, nc * ic - lqp), (0, 0)))
    prof = (
        _pack_profile(prof, pack, upk)
        if pack > 1
        # int8 S-dot operands (sdt gate: caller guarantees |P'| <= 127 --
        # exact, since every biased score is an integer; see choose_config)
        else prof.astype(jnp.int8 if sdt == "int8" else jnp.bfloat16)
    )
    dbb = db_windows.astype(jnp.int32).reshape(nw, nj, jb, sl, LANES)

    kernel = functools.partial(
        _kernel, lqp=lqp, sl=sl, nw=nw, jb=jb, ic=ic, ui=ui, nc=nc,
        go=int(go), ge=int(ge), nq=nq, lqe=lqe, pipe=pipe, pack=pack,
        upk=upk, sdt=sdt, const_s=const_s,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec(
                (nc * ic // pack, pack * ALPHA),
                lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nw, 1, jb, sl, LANES),
                lambda j: (0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nw, nq, sl, LANES),
            lambda j: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nw, nq, sl, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            _sbuf_scratch(pipe, nc, nw, jb, ic, sl, pack),
            pltpu.VMEM((nw, nq, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, 2 * jb + 1, sl, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * lq * lb * nw * sl * LANES * nq,
            bytes_accessed=lb * nw * sl * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prof, dbb)
    if multi:
        return out.transpose(1, 0, 2, 3).reshape(nq, nw * sl * LANES)
    return out.reshape(nw * sl * LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "go", "ge", "nslots", "sl", "nw", "jb", "ic", "ui", "pipe", "pack",
        "upk", "sdt", "interpret",
    ),
)
def sw_pallas_stream(
    profile: jax.Array,
    streams: jax.Array,
    fs: jax.Array,
    go: int,
    ge: int,
    *,
    nslots: int,
    sl: int = DEFAULT_SL,
    nw: int = DEFAULT_NW,
    jb: int = DEFAULT_JB,
    ic: int | None = None,
    ui: int = DEFAULT_UI,
    pipe: int = 0,
    pack: int = 1,
    upk: str | None = None,
    sdt: str = "bf16",  # S-dot dtype; "int8" needs pipe=6 pack=1, |P'|<=127
    interpret: bool = False,
) -> jax.Array:
    """Score one or more queries against a segmented database in one dispatch.

    Args:
      profile: (Lq, 32) int query profile, or (NQ, Lq, 32) for NQ
        equal-padded queries (multi-query batching).
      streams: (NW, L, SL*128) int database streams: each window is a
        concatenation of '*'-padded lane-group segments (pack_streams).
      fs: (L//jb, NW, 2) int32 segment table: ``fs[j,w,0]`` = 1+output-slot
        of the segment *ending* at block j (i.e. a new segment starts
        there), 0 otherwise; ``fs[L//jb-1,w,1]`` = 1+slot of the final
        segment.
      nslots: number of output slots (segments across all windows).

    Returns:
      (nslots, SL*128) int32 best scores, one row per segment, lane-major —
      or (nslots, NQ, SL*128) for a 3-D profile.
    """
    if ge < go:
        raise ValueError(f"G-form kernel requires ge >= go (got {go=}, {ge=})")
    if upk is None:
        upk = PRODUCTION_UPK  # the production extraction-mode constant
    multi = profile.ndim == 3
    nq = profile.shape[0] if multi else 1
    lq = profile.shape[-2]
    nw_in, lb, b = streams.shape
    if nw_in != nw or b != sl * LANES:
        raise ValueError(
            f"streams shape {streams.shape} != (nw={nw}, L, {sl*LANES})"
        )
    if lb % jb != 0:
        raise ValueError(f"stream length {lb} not a multiple of jb={jb}")
    nj = lb // jb
    if fs.shape != (nj, nw, 2):
        raise ValueError(f"fs shape {fs.shape} != {(nj, nw, 2)}")
    lat = ui * pack // math.gcd(ui, pack)
    lqe = -(-lq // lat) * lat
    lqp = nq * lqe
    if ic is None:
        ic = lqp
    ic = min(-(-ic // lat) * lat, lqp)
    nc = -(-lqp // ic)

    prof = profile.astype(jnp.float32) - go
    if multi:
        prof = jnp.pad(prof, ((0, 0), (0, lqe - lq), (0, 0)))
        prof = prof.reshape(nq * lqe, ALPHA)
    else:
        prof = jnp.pad(prof, ((0, lqe - lq), (0, 0)))
    prof = jnp.pad(prof, ((0, nc * ic - lqp), (0, 0)))
    prof = (
        _pack_profile(prof, pack, upk)
        if pack > 1
        # int8 S-dot operands (sdt gate: caller guarantees |P'| <= 127 --
        # exact, since every biased score is an integer; see choose_config)
        else prof.astype(jnp.int8 if sdt == "int8" else jnp.bfloat16)
    )
    dbb = streams.astype(jnp.int32).reshape(nw, nj, jb, sl, LANES)

    kernel = functools.partial(
        _kernel_stream, lqp=lqp, sl=sl, nw=nw, jb=jb, ic=ic, ui=ui, nc=nc,
        go=int(go), ge=int(ge), nq=nq, lqe=lqe, pipe=pipe, pack=pack,
        upk=upk, sdt=sdt,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec(
                (1, nw, 2), lambda j: (j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (nc * ic // pack, pack * ALPHA),
                lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nw, 1, jb, sl, LANES),
                lambda j: (0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nslots, nq, sl, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            _sbuf_scratch(pipe, nc, nw, jb, ic, sl, pack),
            pltpu.VMEM((nw, nq, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, 2 * jb + 1, sl, LANES), jnp.float32),
            pltpu.VMEM((nq, sl, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * lq * lb * nw * sl * LANES,
            bytes_accessed=lb * nw * sl * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fs.astype(jnp.int32), prof, dbb)
    if multi:
        return out.reshape(nslots, nq, sl * LANES)
    return out.reshape(nslots, sl * LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "go", "ge", "nslots", "sl", "nw", "jb", "ic", "ui",
        "has_in", "has_out", "pipe", "pack", "upk", "sdt", "interpret",
    ),
)
def _stream_striped_pass(
    profile, streams, fs, bnd_in, go, ge, *,
    nslots, sl, nw, jb, ic, ui, has_in, has_out,
    pipe=0, pack=1, upk="floor", sdt="bf16", interpret=False,
):
    """One stripe pass of the striped stream kernel. Internal."""
    lq = profile.shape[0]
    nw_in, lb, b = streams.shape
    nj = lb // jb
    lat = ui * pack // math.gcd(ui, pack)
    lqp = -(-lq // lat) * lat
    ic = min(-(-ic // lat) * lat, lqp)
    nc = -(-lqp // ic)

    prof = profile.astype(jnp.float32) - go
    prof = jnp.pad(prof, ((0, nc * ic - lq), (0, 0)))
    prof = (
        _pack_profile(prof, pack, upk)
        if pack > 1
        # int8 S-dot operands (sdt gate: caller guarantees |P'| <= 127 --
        # exact, since every biased score is an integer; see choose_config)
        else prof.astype(jnp.int8 if sdt == "int8" else jnp.bfloat16)
    )
    dbb = streams.astype(jnp.int32).reshape(nw, nj, jb, sl, LANES)

    kernel = functools.partial(
        _kernel_stream_striped, lqp=lqp, sl=sl, nw=nw, jb=jb, ic=ic, ui=ui,
        nc=nc, go=int(go), ge=int(ge), has_in=has_in, has_out=has_out,
        pipe=pipe, pack=pack, upk=upk, sdt=sdt,
    )
    in_specs = [
        pl.BlockSpec((1, nw, 2), lambda j: (j, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (nc * ic // pack, pack * ALPHA),
            lambda j: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nw, 1, jb, sl, LANES),
            lambda j: (0, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [fs.astype(jnp.int32), prof, dbb]
    if has_in:
        in_specs.append(
            pl.BlockSpec(
                (nw, 1, 2 * jb, sl, LANES),
                lambda j: (0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bnd_in)
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((nslots, 1, sl, LANES), jnp.int32)]
    if has_out:
        out_specs.append(
            pl.BlockSpec(
                (nw, 1, 2 * jb, sl, LANES),
                lambda j: (0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nw, nj, 2 * jb, sl, LANES), jnp.float32)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.float32),
            _sbuf_scratch(pipe, nc, nw, jb, ic, sl, pack),
            pltpu.VMEM((nw, 1, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, 2 * jb + 1, sl, LANES), jnp.float32),
            pltpu.VMEM((nw, sl, LANES), jnp.float32),
            pltpu.VMEM((1, sl, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)
    if has_out:
        return outs[0].reshape(nslots, sl * LANES), outs[1]
    return outs[0].reshape(nslots, sl * LANES), None


# Row stripe size for long queries; chosen so 2 row buffers x nw windows
# fit VMEM with margin (see choose_config usage in callers).
STRIPE_ROWS = 512


def sw_pallas_stream_striped(
    profile: jax.Array,
    streams: jax.Array,
    fs: jax.Array,
    go: int,
    ge: int,
    *,
    nslots: int,
    sl: int = DEFAULT_SL,
    nw: int = DEFAULT_NW,
    jb: int = DEFAULT_JB,
    ic: int | None = None,
    ui: int = DEFAULT_UI,
    stripe_rows: int = STRIPE_ROWS,
    pipe: int = 0,
    pack: int = 1,
    upk: str | None = None,
    sdt: str = "bf16",  # S-dot dtype; "int8" needs pipe=6 pack=1, |P'|<=127
    interpret: bool = False,
) -> jax.Array:
    """Segmented-stream scoring for queries of ANY length via row striping.

    Runs ceil(Lq / stripe_rows) passes over the database streams; stripe
    boundaries (the chain state at each stripe's last row, per database
    position) stream through HBM between passes and never touch the host.
    Returns (nslots, SL*128) int32 scores — the max over stripes of each
    pass's per-segment bests (exact: G's running max over disjoint row
    sets).

    ``pipe``/``pack``/``upk`` select the same S-production variants as
    the flat kernels (each stripe is a <=stripe_rows-row query; packing
    gates on the same |P'| bounds — the caller guarantees them).
    """
    if ge < go:
        raise ValueError(f"G-form kernel requires ge >= go (got {go=}, {ge=})")
    if upk is None:
        upk = PRODUCTION_UPK  # the production extraction-mode constant
    lq = int(profile.shape[0])
    if ic is None:
        ic = ui
    lat = ui * pack // math.gcd(ui, pack)
    sq = -(-stripe_rows // lat) * lat
    n_stripes = -(-lq // sq)
    best = None
    bnd = None
    for pth in range(n_stripes):
        pstr = profile[pth * sq : (pth + 1) * sq]
        out, bnd = _stream_striped_pass(
            pstr, streams, fs, bnd, go, ge,
            nslots=nslots, sl=sl, nw=nw, jb=jb, ic=ic, ui=ui,
            has_in=pth > 0, has_out=pth < n_stripes - 1,
            pipe=pipe, pack=pack, upk=upk, sdt=sdt,
            interpret=interpret,
        )
        best = out if best is None else jnp.maximum(best, out)
    return best


# Per-window lane width of the production configuration.
WINDOW_LANES = DEFAULT_SL * LANES  # 1024
LANE_BATCH = DEFAULT_NW * WINDOW_LANES  # total lanes per dispatch


def supported_scoring(profile: np.ndarray | jax.Array, go: int, ge: int) -> bool:
    """True if this (profile, gaps) pair is exactly representable here.

    Requires ge >= go (gap_open <= 0, always true for the reference's
    scoring conventions), the biased profile within bf16's exact-integer
    range, and every attainable DP value within f32's exact-integer range:
    scores only grow along aligned pairs, so ``max G <= Lq * max(P)+``; the
    striped kernel removes the Lq cap MAX_QUERY_ROWS once enforced, so a
    multi-megaresidue query with large positive scores could otherwise
    exceed 2**24 and silently round. Callers route unsupported systems to
    the int32 XLA engine.
    """
    if ge < go:
        return False
    prof = np.asarray(profile, dtype=np.float64)
    pmax = float(np.max(np.abs(prof - go))) if prof.size else 0.0
    if pmax > _BF16_EXACT:
        return False
    lq = prof.shape[-2] if prof.ndim >= 2 else 0
    smax = float(np.max(prof, initial=0.0))
    return lq * smax < 2**24


def sw_pallas_multi(
    profile: jax.Array, db, go: int, ge: int, *, interpret: bool = False
) -> jax.Array:
    """Engine-interface adapter over :func:`sw_pallas_windows`.

    Accepts ``db`` either as a window-stacked (NW, Lb, 1024) array (the fast
    path the pipeline packer produces — no device-side transpose) or as a
    plain (Lb, B) array with B a multiple of 1024 (windows split on host).
    Queries longer than ``MAX_QUERY_ROWS`` should use the XLA engine (VMEM).
    """
    if profile.ndim != 2:
        raise ValueError(
            "sw_pallas_multi is the single-query adapter; call "
            "sw_pallas_windows directly for multi-query profiles"
        )
    if db.ndim == 2:
        lb, b = db.shape
        if b % WINDOW_LANES != 0:
            raise ValueError(f"lane count {b} not a multiple of {WINDOW_LANES}")
        nw = b // WINDOW_LANES
        if isinstance(db, np.ndarray):
            # Host-side window split avoids a device transpose.
            dbw = np.ascontiguousarray(
                db.reshape(lb, nw, WINDOW_LANES).transpose(1, 0, 2)
            )
        else:  # traced/device arrays: transpose on device (slower fallback)
            dbw = jnp.transpose(
                jnp.reshape(db, (lb, nw, WINDOW_LANES)), (1, 0, 2)
            )
    else:
        dbw = db
        nw = db.shape[0]
    cfg = choose_config(int(profile.shape[0]), nw=nw)
    if cfg is None:
        raise ValueError(
            f"no kernel config fits VMEM for query length {profile.shape[0]}"
            f" at nw={nw}; use the XLA engine"
        )
    lb = dbw.shape[1]
    if lb % cfg.jb != 0:
        dbw = jnp.pad(
            dbw,
            ((0, 0), (0, cfg.jb - lb % cfg.jb), (0, 0)),
            constant_values=31,  # '*' padding
        )
    return sw_pallas_windows(
        profile,
        dbw,
        go,
        ge,
        nw=cfg.nw,
        jb=cfg.jb,
        ui=cfg.ui,
        ic=cfg.ic,
        pipe=cfg.pipe,
        pack=cfg.pack,
        upk=cfg.upk,
        sdt=cfg.sdt,
        interpret=interpret,
    )


# VMEM budget model: 2 row buffers (NW * LQP * 4 KB each) + S buffer
# (NW * JB * IC * 4 KB) + state/db/pipeline overhead must stay under ~16 MB.
_VMEM_BUDGET = 15.2 * 2**20
MAX_QUERY_ROWS = 1536  # beyond this, row-striped passes

# (nw, jb, ui, pipe, full_ic[, pack]) shapes validated + ranked on v5e
# hardware (tools/exp_spipe.py, tools/exp_pack.py, tools/tpu_check
# --sweep; docs/DESIGN.md round-2/3 measurement logs). pipe=6 = fused
# single-dot S production (the round-2 discovery: dot COUNT, not volume,
# sets the S cost); full_ic entries produce the whole padded query's S in
# one dot per grid step (short queries only - the buffer is
# 2*lqp*nw*jb*4KB). pipe entries double the S buffer (static-parity
# double buffering). pack>1 entries (round 3) field-pack that many query
# rows per f32 dot output — eligible only when the caller's biased
# profile fits the per-pack bound (choose_config(max_abs_bias=...));
# measured +10% at lq=144 with full-height dots (exp_pack: 232.4 vs
# 212.0 GCUPS, pack=4 ic=lqp). Combos outside these lists have hit
# Mosaic compiler crashes on this jax/libtpu version -- stick to
# validated shapes; pipe=0 fallbacks remain for every band.
_SHAPES_SHORT = [
    (5, 8, 2, 6, True), (6, 8, 2, 6, True), (4, 8, 2, 6, True),
    (8, 8, 2, 6, True),
    (8, 8, 2, 0, False), (8, 4, 4, 0, False), (4, 8, 2, 0, False),
    (2, 8, 2, 0, False), (2, 4, 4, 0, False), (1, 8, 2, 0, False),
    (1, 4, 2, 0, False), (1, 2, 1, 0, False),
]
_SHAPES_LONG = [
    (2, 4, 16, 6, False), (4, 4, 16, 6, False),
    (10, 4, 8, 0, False), (8, 4, 8, 0, False), (6, 4, 8, 0, False),
    (4, 8, 2, 0, False), (4, 4, 8, 0, False), (2, 4, 8, 0, False),
    (2, 8, 2, 0, False), (1, 4, 8, 0, False), (1, 4, 4, 0, False),
    (1, 2, 1, 0, False),
]
# 96 <= lq < 256: fused full-height packed production wins (round-4
# hardware A/B, interleaved/drift-immune — docs/hw_r4/ab_lq144.log:
# (4,8,16) pack=4 255.8 GCUPS and (3,8,16) 255.1 vs (2,4,16) pack=4
# 227.2 and pipe=0 ~204; the freed s_buf VMEM spent on 24-32 register
# chains is the VPU/MXU-overlap lever DESIGN.md's cost model predicted).
_SHAPES_XLONG = [
    (4, 8, 16, 6, True, 4), (3, 8, 16, 6, True, 4),
    (2, 4, 16, 6, True, 4),
    (2, 4, 16, 6, False), (4, 4, 16, 6, False),
    (4, 4, 16, 0, False), (2, 4, 16, 0, False), (2, 8, 16, 0, False),
    (1, 4, 32, 0, False), (1, 4, 16, 0, False), (1, 4, 8, 0, False),
    (1, 2, 1, 0, False),
]
# lq >= 256: round-2's "fused stops helping past 192" verdict was an
# artifact of CHUNKED dots — FULL-HEIGHT pack=4 (feasible since the
# nc==1 single-parity s_buf fix) wins clearly once the whole padded
# query is one dot: round-4 interleaved A/B at lq=256 gives (1,8,16)
# pack=4 266.0 / (2,4,16) 254.4 vs pipe=0 production 222.6
# (docs/hw_r4/ab_lq256.log); same-session 3-rep medians at lq=512 give
# 279.1/278.9 vs 232.4 (step3_sweep.log, spreads <9%). Entries are
# VMEM-gated per lq by choose_config, so huge queries where full height
# no longer fits fall through to the pipe=0 unroll shapes unchanged.
_SHAPES_XXLONG = [
    # Round-5 adoption: 16 chains at full height win the lower XXLONG
    # band — (2,8,16) pack=4 measured 277.9 GCUPS vs (1,8,16)'s 259.8
    # at lq=256 (+7.0%, spreads 1.2-2.5%, interleaved high-work A/B,
    # docs/hw_r5/ab_lq256.log). Fits full-height through lq=384; at
    # 448+ it exceeds VMEM and selection falls through to (1,8,16),
    # the measured lq=512 production (276.2, ab_lq512.log).
    (2, 8, 16, 6, True, 4),
    (1, 8, 16, 6, True, 4), (2, 4, 16, 6, True, 4),
    (4, 4, 16, 0, False), (2, 4, 16, 0, False), (2, 8, 16, 0, False),
    (1, 4, 32, 0, False), (1, 4, 16, 0, False), (1, 4, 8, 0, False),
    (1, 2, 1, 0, False),
]
# Striped (unbounded-query) passes select from their OWN table so the
# striped adoption decision is decoupled from the flat >=256 band.
# PACKED STRIPE ADOPTED (round 5, from round 4's measurement): the
# interleaved drift-immune A/B at lq=35,000 / sr=512
# (docs/hw_r4/stripe_ab.log, tools/longpair_check.py --ab) measured
# (2,4,16, ic=512 full-height, pipe=6, pack=4) at 247.2 GCUPS median
# (2.1% spread, 5 rounds) vs the pipe=0 production's 215.6 — a 1.147x
# win meeting the >=3-reps / win>spread adoption rule (tools/adopt.py).
# The (1,8,16) sibling lost (203.3 median, 11.9% spread) and stays off
# the table. The pipeline's striped path gates this entry on the same
# max_abs_bias bound as the flat kernels; unknown-bias callers fall
# through to the pipe=0 unroll list unchanged.
_SHAPES_STRIPE = [
    (2, 4, 16, 6, True, 4),
    (4, 4, 16, 0, False), (2, 4, 16, 0, False), (2, 8, 16, 0, False),
    (1, 4, 32, 0, False), (1, 4, 16, 0, False), (1, 4, 8, 0, False),
    (1, 2, 1, 0, False),
]

# Multi-query batching adds a predicated chain reset + dynamic best
# indexing to the loop body; jb=8 variants of that body crash Mosaic.
# ROW STACKING ADOPTED (round-4 interleaved A/B, docs/hw_r4/ab_mq17.log):
# stacking the whole query block into one full-height fused dot beats
# blocks-of-one production 2.3-2.5x at nq=8 lq=17 (228.4 / 220.8 / 212.8
# GCUPS for pack 2/4/1 stacked vs 93.1 for the old (6,4,4) chunked
# production; single-session step5_mq.log agrees at lq=24/48). The
# stacked pack=1 entry keeps unknown-bias callers on the stacked path;
# chunked entries remain as VMEM fallbacks for huge nq*lq stacks.
_SHAPES_MQ = [
    # Round-5 adoption: at nq=8/lq=17 (the reference's benchmark regime,
    # row-stacked) the 16-chain full-height (4,4,2) pack=2 measured
    # 246.2-246.3 GCUPS aggregate vs the prior (2,4,2) pack=2 head's
    # 232.4-232.8 — +5.8% at 0.5-2.5% spread over two independent
    # interleaved A/Bs (docs/hw_r5/abmq2.log, abmq3.log). More chains
    # exceed VMEM at this stack height ((8,4)/(4,8)/(6,4) all SKIP);
    # pack=4 loses (209.7 — the +11% per-query padding to the (ui=2,
    # pack=4) lattice outweighs the taller dot).
    (4, 4, 2, 6, True, 2),
    # Round-5 adoption #2 — tall stacks prefer pack=4: when the 16-chain
    # pack=2 head no longer fits (stacked rows >~200), the pack=4 sibling
    # wins decisively: 266.0 vs 237.4 at nq=2/lq=144 (288 rows, 0.8-1.7%
    # spread) and 276.9 vs 259.3 at nq=8/lq=48 (384 rows, 1.1-1.5%) —
    # docs/hw_r5/abmq144.log, abmq48.log. The short-stack pack=4 loss
    # (209.7 at nq=8/lq=17) is unreachable here: the pack=2 head fits
    # and wins that regime. Bias >31 falls through to pack=2 unchanged.
    (2, 4, 2, 6, True, 4),
    (2, 4, 2, 6, True, 2), (4, 4, 2, 6, True, 4),
    (2, 4, 2, 6, True),
    # Round-5 adoption #3 — deep stacks (full height beyond VMEM, e.g.
    # nq=64/lq=17 = 1152 rows) run fused pack=2 with the largest fitting
    # chunk: 256.4 GCUPS aggregate (2.3% spread) vs 243.3 for the pack=4
    # sibling — and the former pipe0 production (1,4,4,304,0,1) now
    # CRASHES the remote compiler (HTTP 500, docs/hw_r5/abmq64.log), so
    # this entry also removes a broken pick from the table's hot path
    # (the pipeline's compile-retry ladder would have caught it at
    # dispatch, but production should not lean on the fallback).
    (1, 4, 2, 6, "max", 2),
    (8, 4, 8, 6, False), (6, 4, 4, 6, False),
    (8, 4, 8, 0, False), (8, 4, 4, 0, False), (6, 4, 4, 0, False),
    (4, 4, 4, 0, False), (2, 4, 4, 0, False), (1, 4, 4, 0, False),
    (1, 2, 2, 0, False), (1, 2, 1, 0, False),
]


#: max |P'| (biased profile magnitude) each pack level represents exactly
#: in its f32 field — see _run_block's packed-production docstring.
#: upk="floor" biases fields non-negative (the lower field must stay
#: below the next field's unit).
PACK_BOUNDS = {1: float(_BF16_EXACT), 2: 128.0, 4: 31.0}

#: max |P'| exactly representable by int8 S-dot operands (sdt="int8").
INT8_SDT_BOUND = 127.0

#: Packed-field extraction mode: "floor" is the ONLY mode. A "round"
#: variant (signed fields, round-to-nearest extraction: fewer VPU ops
#: per group, 12 vs 15, and a wider pack=2 bound of 255) existed through
#: round 4 but LOST the interleaved hardware A/B decisively — 211.0 vs
#: 255.1 GCUPS at the same (3,8,16,144,pipe6,pack4) shape
#: (docs/hw_r4/ab_lq144.log): the f32 round-to-nearest extraction sits
#: on the VPU critical path, the saved bias-subtract does not. Pruned in
#: round 5; _pack_profile rejects upk != "floor".
PRODUCTION_UPK = "floor"


def _vmem_ic_budget(lq, nw_c, jb, ui, pipe, pk, nq=1, reserve=0,
                    nc1=False):
    """VMEM accounting shared by choose_config and config_fits_vmem.

    Returns (ic_budget, lat, lqp): the largest S-chunk row count (in
    LOGICAL query rows; the packed s_buf holds ic/pk physical rows) that
    fits the empirical _VMEM_BUDGET after the rolling rows, chain state,
    per-query bests, and the resident one-hot encodings.

    ``nc1``: the caller intends a single full-height chunk (ic = lqp,
    nc == 1) — the kernel then allocates only ONE s_buf parity
    (_sbuf_scratch: no second chunk to double-buffer), so the budget a
    full-height chunk must fit is the single-parity one.
    """
    budget = _VMEM_BUDGET - reserve
    # per-query rows pad to the (ui, pack) lattice so packed groups
    # never straddle a query boundary (mirrors sw_pallas_windows)
    lat = ui * pk // math.gcd(ui, pk)
    lqp = nq * (-(-lq // lat) * lat)
    rows = 2 * lqp * nw_c * WINDOW_LANES * 4
    state = (2 * jb + 1) * nw_c * WINDOW_LANES * 4
    best = nq * nw_c * WINDOW_LANES * 4
    # bf16 one-hot encodings live on the VMEM stack for the whole step;
    # weighted at half size (measured: configs at the full-size model
    # limit compile fine -- Mosaic appears to stream them into the dots)
    # pack>1 widens the one-hot along K by the pack factor.
    onehot = nw_c * jb * pk * ALPHA * WINDOW_LANES
    # pipe modes double-buffer the S block — except the nc==1 case
    parity = 2 if (pipe and not nc1) else 1
    # packed s_buf holds ic/pack physical rows per chunk
    ic_budget = pk * (budget - rows - state - best - onehot) / (
        parity * nw_c * jb * WINDOW_LANES * 4
    )
    return ic_budget, lat, lqp


def config_fits_vmem(
    lq: int, cfg: "KernelConfig", nq: int = 1, reserve: int = 0
) -> bool:
    """Whether an EXPLICIT config's S chunk fits the VMEM budget.

    choose_config solves for ic and can only emit fitting configs; this
    validates hand-built candidates (experiment grids, tool overrides)
    with the same accounting, so a sweep never spends a hardware compile
    on a shape that cannot allocate.
    """
    lat = cfg.ui * cfg.pack // math.gcd(cfg.ui, cfg.pack)
    lqp = nq * (-(-lq // lat) * lat)
    ic_budget, _, _ = _vmem_ic_budget(
        lq, cfg.nw, cfg.jb, cfg.ui, cfg.pipe, cfg.pack, nq, reserve,
        nc1=cfg.ic >= lqp,
    )
    return cfg.ic <= min(ic_budget, lqp)


def choose_config(
    lq: int,
    nw: int | None = None,
    reserve: int = 0,
    nq: int = 1,
    nw_max: int | None = None,
    max_abs_bias: float | None = None,
    upk: str | None = None,
    striped: bool = False,
) -> KernelConfig | None:
    """Pick (windows, j-block, row-unroll, S-chunk rows) for a query length.

    More interleaved windows = more independent DP chains = higher VPU
    utilization (the DP is a serial max/add chain; measured VPU chain
    scaling on v5e saturates around 8-10 interleaved chains). ``reserve``
    subtracts caller VMEM (e.g. the stream kernel's output slots) from the
    budget. The S chunk is sized to whatever budget remains (measured:
    chunk size matters little; window count dominates).

    ``max_abs_bias`` is the caller's bound on |P - go| (the biased
    profile). Packed-production shapes (pack>1) are eligible only when it
    fits the pack level's exact-field range (PACK_BOUNDS); with the
    default ``None`` only pack=1 shapes are considered, so callers that
    haven't inspected their profile can never select a lossy config.

    ``upk`` must be "floor" (or None = PRODUCTION_UPK): the "round"
    extraction mode was pruned in round 5 (see the PRODUCTION_UPK note).

    ``striped`` selects the striped-pass table (``_SHAPES_STRIPE``) —
    ``lq`` is then the stripe row count, and packed/fused stripe shapes
    are adopted there independently of the flat bands.
    """
    if upk is None:
        upk = PRODUCTION_UPK
    if upk != "floor":
        raise ValueError(
            f"upk={upk!r} was pruned (round 5): only 'floor' exists"
        )
    bounds = PACK_BOUNDS
    if nq > 1:
        shapes = _SHAPES_MQ
    elif striped:
        # per-stripe shape (lq = stripe rows); own table so packed-stripe
        # adoption is independent of the flat >=256 band
        shapes = _SHAPES_STRIPE
    elif lq <= 48:
        shapes = _SHAPES_SHORT
    elif lq < 96:
        shapes = _SHAPES_LONG
    elif lq < 256:
        shapes = _SHAPES_XLONG
    else:
        shapes = _SHAPES_XXLONG
    for shape in shapes:
        nw_c, jb, ui, pipe, full_ic = shape[:5]
        pk = shape[5] if len(shape) > 5 else 1
        sdtv = shape[6] if len(shape) > 6 else "bf16"
        if nw is not None and nw_c != nw:
            continue
        if nw_max is not None and nw_c > nw_max:
            continue
        if pk > 1 and (
            max_abs_bias is None or max_abs_bias > bounds[pk]
        ):
            continue
        if sdtv == "int8" and (
            max_abs_bias is None or max_abs_bias > INT8_SDT_BOUND
        ):
            # int8 S-dot operands represent |P'| <= 127 exactly; callers
            # that have not inspected their profile fall through to the
            # bf16 sibling, same rule as the pack gate above.
            continue
        ic_budget, lat, lqp = _vmem_ic_budget(
            lq, nw_c, jb, ui, pipe, pk, nq, reserve
        )
        # a full-height chunk (nc == 1) allocates a single s_buf parity
        # (_sbuf_scratch), so it gets the larger single-parity budget
        ic_budget1, _, _ = _vmem_ic_budget(
            lq, nw_c, jb, ui, pipe, pk, nq, reserve, nc1=True
        )
        if full_ic == "max":
            # largest fitting EVEN chunking (full height if it fits, else
            # the fewest equal double-buffered chunks) — the deep-stack mq
            # regime's winner: at nq=64/lq=17 the fused (1,4,2) pack=2
            # with 4 even 288-row chunks measured 255.0-256.4 GCUPS
            # aggregate; the biggest-possible-chunk variant (ic=362,
            # ragged 66-row tail) lost by 5.0% and tiny lat-row chunks
            # waste dots (docs/hw_r5/abmq64.log, abmq64b.log)
            cap = int(ic_budget // lat) * lat
            if ic_budget1 >= lqp:
                ic = lqp
            elif cap >= lat:
                ncks = -(-lqp // cap)
                ic = -(-lqp // (ncks * lat)) * lat
            else:
                ic = 0
        elif full_ic:
            # the whole padded query's S in one dot per grid step
            ic = lqp if ic_budget1 >= lqp else 0
        elif pipe:
            ic = lat if ic_budget >= lat else 0
        elif lq <= 48:
            # short queries: one chunk covering the whole (padded) query
            ic = (lqp if ic_budget1 >= lqp
                  else min(lqp, int(ic_budget // lat) * lat))
        else:
            # long queries: the smallest legal S chunk measured fastest
            # (small production granules interleave better with the DP loop)
            ic = lat if ic_budget >= lat else 0
        if ic >= ui:
            return KernelConfig(
                nw=nw_c, jb=jb, ui=ui, ic=ic, pipe=pipe, pack=pk, upk=upk,
                sdt=sdtv,
            )
    return None  # no validated shape fits VMEM: route to the XLA engine


def choose_windows(lq: int) -> int:
    cfg = choose_config(lq)
    return cfg.nw if cfg is not None else 1


def sw_pallas(profile, db, go, ge, *, interpret: bool = False):
    """Single-window (1024-lane) convenience wrapper."""
    db = jnp.asarray(db)
    cfg = choose_config(int(profile.shape[0]), nw=1)
    if cfg is None:
        raise ValueError("query too long for the Pallas kernel's VMEM rows")
    return sw_pallas_windows(
        profile,
        db[None],
        go,
        ge,
        nw=1,
        jb=cfg.jb,
        ui=cfg.ui,
        ic=cfg.ic,
        pipe=cfg.pipe,
        pack=cfg.pack,
        upk=cfg.upk,
        sdt=cfg.sdt,
        interpret=interpret,
    )
