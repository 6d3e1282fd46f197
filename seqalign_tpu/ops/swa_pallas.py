"""Pallas TPU kernel for batched Smith-Waterman affine-gap scoring.

The TPU re-design of the reference's AVX2 inner kernel
(``alignment_fill_matrices``, ``src/alignment.c:47-187``). Same decomposition
insight — vectorize *across database sequences*, march the DP sequentially —
but sized and laid out for the TPU vector unit and memory system:

- **Lane batching**: each "window" holds ``SL x 128`` database sequences
  (1024 at SL=8), shaped so every elementwise op is a whole number of native
  int32 vector registers (the reference uses 16 int16 AVX2 lanes).
- **Window interleaving (NW)**: several independent windows are advanced in
  lockstep inside the inner loop. The DP recurrence is a serial dependency
  chain (~3-cycle ALU latency per link); interleaving independent chains is
  what fills the VPU pipeline. Measured on v5e: NW=2 doubles throughput over
  NW=1.
- **Rolling rows in VMEM**: one row each of H/E/F over the query dimension
  (linear space, like the reference's single-row buffers,
  ``src/alignment.c:227-230``) lives in VMEM scratch and persists across the
  sequential grid dimension (database position blocks).
- **j-blocking (JB)**: consecutive database positions are chained through
  vector registers per sweep over the query, dividing VMEM row traffic by
  ``JB`` — the TPU analog of the reference's register-carried ``*_left`` /
  ``*_up_left`` values.
- **MXU substitution lookup**: the reference's scalar L1-table gather
  (``scoring_lookup``, ``src/alignment.c:31-44``) becomes a query-profile x
  one-hot(db chars) matmul on the MXU, exact in bf16xbf16->f32 because every
  output is one product of a 0/1 weight with an int8-range score.
- **int32 scores**: as wide as the TPU vector lanes, subsuming the
  reference's int16 wraparound (SURVEY.md §7.4) and the overflow-rescan the
  BASELINE north star asks for: int32 cannot overflow for real sequences
  (|score| <= 127 * len).
- **No E/F zero-floors**: the reference clamps all three matrices at zero
  (``src/alignment.c:129,147,161``); because H >= 0 always dominates the
  folded max3, the E/F clamps are provably unobservable in H and in the
  final score, so the kernel drops them (2 fewer ops/cell). The oracle and
  differential tests pin the score equivalence.

Implementation notes forced by this jax/libtpu version's Mosaic:
- ``fori_loop`` carries whose yield is not derived from their own carry slot
  trip an "Invalid relayout ... replicated" layout-solver bug; the
  left/diagonal chain state is therefore routed through a small VMEM scratch
  buffer between unrolled row groups (UI rows per group), and the only loop
  carries are self-derived running maxima.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ALPHA = 32  # alphabet slots

# Defaults tuned on TPU v5e (see docs/DESIGN.md for the measurement log).
DEFAULT_SL = 8  # sublanes per window (8 -> 1024 seqs/window)
DEFAULT_NW = 2  # interleaved windows
DEFAULT_JB = 8  # db positions chained through registers per row sweep
DEFAULT_IC = 64  # query rows per substitution-score chunk
DEFAULT_UI = 8  # unrolled query rows per loop iteration


def _kernel(
    prof_ref,  # (NC*IC, ALPHA) bf16 query profile (padded rows zero)
    db_ref,  # (NW, 1, JB, SL, LANES) int32 db chars for this grid step
    out_ref,  # (NW, SL, LANES) int32 best scores
    row_h,  # scratch (NW, LQP, SL, LANES) int32 rolling rows
    row_e,
    row_f,
    s_buf,  # scratch (NW, JB, IC, SL, LANES) int32 substitution scores
    best_ref,  # scratch (NW, SL, LANES) int32
    state_ref,  # scratch (NW, 3*JB+1, SL, LANES) int32 left/diag chain
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
):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        row_h[...] = jnp.zeros_like(row_h)
        row_e[...] = jnp.zeros_like(row_e)
        row_f[...] = jnp.zeros_like(row_f)
        best_ref[...] = jnp.zeros_like(best_ref)

    d = db_ref[:, 0]  # (NW, JB, SL, LANES)
    # Left boundary column (i = -1) is zero for every j-block.
    state_ref[...] = jnp.zeros_like(state_ref)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, sl, LANES), 0)
    # One-hot encodings are chunk-invariant: build once per grid step.
    onehots = [
        [(c_iota == d[w, t][None]).astype(jnp.bfloat16) for t in range(jb)]
        for w in range(nw)
    ]

    def make_body(c):
        def body(g, best):
            best = list(best)
            base = c * ic + g * ui
            lh = [[state_ref[w, 3 * t + 0] for t in range(jb)] for w in range(nw)]
            le = [[state_ref[w, 3 * t + 1] for t in range(jb)] for w in range(nw)]
            lf = [[state_ref[w, 3 * t + 2] for t in range(jb)] for w in range(nw)]
            t0 = [state_ref[w, 3 * jb] for w in range(nw)]
            for u in range(ui):
                i = base + u
                up_h = [row_h[w, i] for w in range(nw)]
                up_e = [row_e[w, i] for w in range(nw)]
                up_f = [row_f[w, i] for w in range(nw)]
                m_up = [jnp.maximum(up_h[w], up_f[w]) for w in range(nw)]
                t0n = [jnp.maximum(m_up[w], up_e[w]) for w in range(nw)]
                cur_e = list(up_e)
                dt = list(t0)
                for t in range(jb):
                    s = [s_buf[w, t, i - c * ic] for w in range(nw)]
                    h = [jnp.maximum(dt[w] + s[w], 0) for w in range(nw)]
                    e = [
                        jnp.maximum(m_up[w] + go, cur_e[w] + ge)
                        for w in range(nw)
                    ]
                    mhe = [jnp.maximum(lh[w][t], le[w][t]) for w in range(nw)]
                    f = [
                        jnp.maximum(mhe[w] + go, lf[w][t] + ge)
                        for w in range(nw)
                    ]
                    best = [jnp.maximum(best[w], h[w]) for w in range(nw)]
                    if t + 1 < jb:
                        # Diagonal for (j0+t+1, i) is (j0+t, i-1): max3 of
                        # this t's left state, still unmodified here.
                        dt = [jnp.maximum(mhe[w], lf[w][t]) for w in range(nw)]
                    m_up = [jnp.maximum(h[w], f[w]) for w in range(nw)]
                    cur_e = e
                    for w in range(nw):
                        lh[w][t], le[w][t], lf[w][t] = h[w], e[w], f[w]
                t0 = t0n
                for w in range(nw):
                    row_h[w, i] = lh[w][jb - 1]
                    row_e[w, i] = le[w][jb - 1]
                    row_f[w, i] = lf[w][jb - 1]
            for w in range(nw):
                for t in range(jb):
                    state_ref[w, 3 * t + 0] = lh[w][t]
                    state_ref[w, 3 * t + 1] = le[w][t]
                    state_ref[w, 3 * t + 2] = lf[w][t]
                state_ref[w, 3 * jb] = t0[w]
            return best

        return body

    best = [best_ref[w] for w in range(nw)]
    for c in range(nc):
        # Substitution scores for query rows [c*IC, c*IC+IC) x this j-block:
        # one-hot matmul on the MXU (exact; see module docstring).
        p_chunk = prof_ref[pl.ds(c * ic, ic), :]  # (IC, 32) bf16
        for w in range(nw):
            for t in range(jb):
                s_t = jax.lax.dot_general(
                    p_chunk,
                    onehots[w][t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (IC, SL, LANES) f32
                s_buf[w, t] = s_t.astype(jnp.int32)
        groups = min(ic, lqp - c * ic) // ui
        best = jax.lax.fori_loop(0, groups, make_body(c), best)
    for w in range(nw):
        best_ref[w] = best[w]

    @pl.when(j == nj - 1)
    def _emit():
        out_ref[...] = best_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "sl", "nw", "jb", "ic", "ui", "interpret"),
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
    ic: int = DEFAULT_IC,
    ui: int = DEFAULT_UI,
    interpret: bool = False,
) -> jax.Array:
    """Score one query against NW stacked lane-batch windows.

    Args:
      profile: (Lq, 32) int query profile ``P[i, c] = table[q_i, c]``.
      db_windows: (NW, Lb, SL*128) int database batch, window-major,
        position-major within a window, '*'-padded; ``Lb % jb == 0``.
      go: total gap-open penalty (gap_open + gap_extend), negative.
      ge: gap-extend penalty, negative.

    Returns:
      (NW * SL * 128,) int32 best scores, window-major lane order.

    The query is internally padded to a multiple of ``ui`` with zero-score
    rows; padded-row H values are bounded by existing maxima and feed no
    real rows, so scores are unchanged.
    """
    lq = profile.shape[0]
    nw_in, lb, b = db_windows.shape
    if nw_in != nw or b != sl * LANES:
        raise ValueError(
            f"db_windows shape {db_windows.shape} != (nw={nw}, Lb, {sl*LANES})"
        )
    if lb % jb != 0:
        raise ValueError(f"db length {lb} not a multiple of jb={jb}")
    if ic % ui != 0:
        raise ValueError(f"ic={ic} must be a multiple of ui={ui}")
    lqp = -(-lq // ui) * ui
    ic = min(ic, lqp)  # never build an S chunk larger than the query
    nc = -(-lqp // ic)
    nj = lb // jb

    prof = profile.astype(jnp.bfloat16)
    prof = jnp.pad(prof, ((0, nc * ic - lq), (0, 0)))
    dbb = db_windows.astype(jnp.int32).reshape(nw, nj, jb, sl, LANES)

    kernel = functools.partial(
        _kernel, lqp=lqp, sl=sl, nw=nw, jb=jb, ic=ic, ui=ui, nc=nc,
        go=int(go), ge=int(ge),
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec(
                (nc * ic, ALPHA), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nw, 1, jb, sl, LANES),
                lambda j: (0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nw, sl, LANES), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nw, sl, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.int32),
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.int32),
            pltpu.VMEM((nw, lqp, sl, LANES), jnp.int32),
            pltpu.VMEM((nw, jb, ic, sl, LANES), jnp.int32),
            pltpu.VMEM((nw, sl, LANES), jnp.int32),
            pltpu.VMEM((nw, 3 * jb + 1, sl, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=13 * lq * lb * nw * sl * LANES,
            bytes_accessed=lb * nw * sl * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prof, dbb)
    return out.reshape(nw * sl * LANES)


# Per-window lane width of the production configuration.
WINDOW_LANES = DEFAULT_SL * LANES  # 1024
LANE_BATCH = DEFAULT_NW * WINDOW_LANES  # total lanes per dispatch (4096 max)


def sw_pallas_multi(
    profile: jax.Array, db, go: int, ge: int, *, interpret: bool = False
) -> jax.Array:
    """Engine-interface adapter over :func:`sw_pallas_windows`.

    Accepts ``db`` either as a window-stacked (NW, Lb, 1024) array (the fast
    path the pipeline packer produces — no device-side transpose) or as a
    plain (Lb, B) array with B a multiple of 1024 (windows split on host).
    Queries longer than ``MAX_QUERY_ROWS`` should use the XLA engine (VMEM).
    """
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
    _, ic = choose_config(int(profile.shape[0]), nw=nw)
    return sw_pallas_windows(
        profile, dbw, go, ge, nw=nw, ic=ic, interpret=interpret
    )


# VMEM budget model: 3 H/E/F rows (NW * LQP * 4 KB each) + S buffer
# (NW * JB * IC * 4 KB) + state/db/pipeline overhead must stay under ~16 MB.
_VMEM_BUDGET = 13.5 * 2**20
MAX_QUERY_ROWS = 1024  # beyond this, route to the XLA engine


def choose_config(
    lq: int,
    jb: int = DEFAULT_JB,
    ui: int = DEFAULT_UI,
    nw: int | None = None,
) -> tuple[int, int]:
    """Pick (windows, S-chunk rows) for a query length.

    More interleaved windows = more independent DP chains = higher VPU
    utilization (the kernel is latency-bound); a larger S chunk amortizes
    the per-chunk MXU section (measured +65% at lq=144 for ic=lqp vs 48).
    Constraints: VMEM footprint (rows + S buffer <= ~13.5 MB) and the Mosaic
    unrolled-body limit (nw * jb * ui <= 128 cell-blocks; larger bodies
    crash the compiler on this jax/libtpu version).
    """
    lqp = -(-lq // ui) * ui
    max_nw = max(1, 128 // (jb * ui))
    candidates = [nw] if nw is not None else list(range(max_nw, 0, -1))
    for nw_c in candidates:
        for ic in (lqp, 256, 128, 64, 32):
            if ic > lqp or ic % ui:
                continue
            rows = 3 * lqp * nw_c * WINDOW_LANES * 4
            sbuf = nw_c * jb * ic * WINDOW_LANES * 4
            if rows + sbuf <= _VMEM_BUDGET:
                return nw_c, ic
    return candidates[-1], min(32, lqp)


def choose_windows(lq: int, jb: int = DEFAULT_JB, ui: int = DEFAULT_UI) -> int:
    return choose_config(lq, jb, ui)[0]


def sw_pallas(profile, db, go, ge, *, interpret: bool = False):
    """Single-window (1024-lane) convenience wrapper."""
    db = jnp.asarray(db)
    return sw_pallas_windows(
        profile, db[None], go, ge, nw=1, interpret=interpret
    )
