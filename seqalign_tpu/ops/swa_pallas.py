"""Pallas TPU kernel for batched Smith-Waterman affine-gap scoring.

The TPU re-design of the reference's AVX2 inner kernel
(``alignment_fill_matrices``, ``src/alignment.c:47-187``). Same decomposition
insight — vectorize *across database sequences*, march the DP sequentially —
but sized and laid out for the TPU vector unit and memory system:

- **Lane batch = 1024** database sequences per kernel instance, shaped
  ``(8 sublanes, 128 lanes)`` so every elementwise op is one native int32
  vector register op (the reference uses 16 int16 AVX2 lanes).
- **Rolling rows in VMEM**: one row each of H/E/F over the query dimension
  (linear space, like the reference's single-row buffers,
  ``src/alignment.c:227-230``) lives in VMEM scratch and persists across the
  sequential grid dimension (database position blocks).
- **j-blocking**: ``JB`` consecutive database positions are processed per
  sweep over the query, chaining their dependencies through vector
  registers. This divides the VMEM row traffic by ``JB`` — the TPU analog of
  the reference's register-carried ``*_left``/``*_up_left`` values.
- **MXU substitution lookup**: the reference's scalar L1-table gather
  (``scoring_lookup``, ``src/alignment.c:31-44``) has no TPU equivalent;
  instead the query profile ``P[i, c] = table[q_i, c]`` is multiplied with a
  one-hot encoding of the database characters on the MXU —
  ``S = P_chunk @ onehot(d)`` — which is exact in bf16xbf16->f32 because
  every output is a single product of a 0/1 weight with an int8-range score.
- **int32 scores**: natively as wide as the TPU vector lanes, so the
  reference's int16 overflow wraparound (SURVEY.md §7.4) and the
  overflow-rescan machinery the BASELINE north star asks for are subsumed:
  int32 cannot overflow for any realistic sequence (|score| <= 127 * len).

Implementation note: the query loop is a ``fori_loop`` over *groups* of
``UI`` unrolled rows, with the per-j-block left/diagonal state routed through
a small VMEM scratch buffer between groups rather than loop carries. Mosaic's
layout solver (jax 0.9/libtpu in this image) rejects loop carries whose
yielded value is not derived from the same carry slot ("Invalid relayout:
... replicated in destination but not in source"), which rules out the
natural shift-chain carries; the scratch round-trip costs <1 VMEM op per
1024-cell step at UI=8.

Recurrences and score results are exactly those of the reference (see
:mod:`seqalign_tpu.ops.oracle`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
LANE_BATCH = SUBLANES * LANES  # 1024 database sequences per kernel instance
ALPHA = 32  # alphabet slots

DEFAULT_JB = 4  # database positions chained through registers per row sweep
DEFAULT_IC = 128  # query rows per substitution-score chunk
DEFAULT_UI = 8  # unrolled query rows per loop iteration


def _kernel(
    prof_ref,  # (NC*IC, ALPHA) bf16 query profile (padded rows are zero)
    db_ref,  # (1, JB, 8, 128) int32 database characters for this grid step
    out_ref,  # (8, 128) int32 best scores
    row_h,  # scratch (LQP, 8, 128) int32 rolling rows
    row_e,
    row_f,
    s_buf,  # scratch (JB, IC, 8, 128) int32 substitution scores
    best_ref,  # scratch (8, 128) int32
    state_ref,  # scratch (3*JB+1, 8, 128) int32: per-t left H/E/F + t0
    *,
    lqp: int,
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
        # Zero boundary row (local alignment) and running max.
        row_h[...] = jnp.zeros_like(row_h)
        row_e[...] = jnp.zeros_like(row_e)
        row_f[...] = jnp.zeros_like(row_f)
        best_ref[...] = jnp.zeros_like(best_ref)

    d = db_ref[0]  # (JB, 8, 128) int32
    # Left boundary column (i = -1) is zero for every j: H/E/F left state
    # and the folded diagonal t0 all start the row sweep at zero.
    state_ref[...] = jnp.zeros_like(state_ref)

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, SUBLANES, LANES), 0)

    def make_group_body(c):
        def group_body(g, best):
            base = c * ic + g * ui
            # Restore per-t state (left H/E/F per j-block lane, plus the
            # folded diagonal of the stored row) from scratch.
            lh = [state_ref[3 * t + 0] for t in range(jb)]
            le = [state_ref[3 * t + 1] for t in range(jb)]
            lf = [state_ref[3 * t + 2] for t in range(jb)]
            t0 = state_ref[3 * jb]
            for u in range(ui):
                i = base + u
                up_h = row_h[i]
                up_e = row_e[i]
                up_f = row_f[i]
                m_up = jnp.maximum(up_h, up_f)
                t0_next = jnp.maximum(m_up, up_e)
                cur_up_e = up_e
                dt = t0
                for t in range(jb):
                    s = s_buf[t, i - c * ic]
                    h_new = jnp.maximum(dt + s, 0)
                    e_new = jnp.maximum(
                        jnp.maximum(m_up + go, cur_up_e + ge), 0
                    )
                    f_new = jnp.maximum(
                        jnp.maximum(
                            jnp.maximum(lh[t], le[t]) + go, lf[t] + ge
                        ),
                        0,
                    )
                    best = jnp.maximum(best, h_new)
                    # Diagonal for cell (j0+t+1, i) is (j0+t, i-1): max3 of
                    # this t's left state, still unmodified at this point.
                    if t + 1 < jb:
                        dt = jnp.maximum(
                            jnp.maximum(lh[t], le[t]), lf[t]
                        )
                    m_up = jnp.maximum(h_new, f_new)
                    cur_up_e = e_new
                    lh[t], le[t], lf[t] = h_new, e_new, f_new
                t0 = t0_next
                # Persist the last row of this j-block for the next grid step.
                row_h[i] = lh[jb - 1]
                row_e[i] = le[jb - 1]
                row_f[i] = lf[jb - 1]
            for t in range(jb):
                state_ref[3 * t + 0] = lh[t]
                state_ref[3 * t + 1] = le[t]
                state_ref[3 * t + 2] = lf[t]
            state_ref[3 * jb] = t0
            return best

        return group_body

    best = best_ref[...]
    for c in range(nc):
        # Substitution scores for query rows [c*IC, c*IC+IC) x this j-block,
        # via one-hot matmul on the MXU (exact; see module docstring).
        p_chunk = prof_ref[pl.ds(c * ic, ic), :]  # (IC, 32) bf16
        for t in range(jb):
            onehot = (c_iota == d[t][None, :, :]).astype(jnp.bfloat16)
            s_t = jax.lax.dot_general(
                p_chunk,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (IC, 8, 128) f32
            s_buf[t] = s_t.astype(jnp.int32)
        groups = min(ic, lqp - c * ic) // ui
        best = jax.lax.fori_loop(0, groups, make_group_body(c), best)

    best_ref[...] = best

    @pl.when(j == nj - 1)
    def _emit():
        out_ref[...] = best_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "jb", "ic", "ui", "interpret"),
)
def sw_pallas(
    profile: jax.Array,
    db: jax.Array,
    go: int,
    ge: int,
    *,
    jb: int = DEFAULT_JB,
    ic: int = DEFAULT_IC,
    ui: int = DEFAULT_UI,
    interpret: bool = False,
) -> jax.Array:
    """Score one query against a 1024-lane database batch on TPU.

    Args:
      profile: (Lq, 32) int query profile ``P[i, c] = table[q_i, c]``.
      db: (Lb, 1024) int database batch, position-major, '*'-padded;
        ``Lb`` must be a multiple of ``jb``.
      go: total gap-open penalty (gap_open + gap_extend), negative.
      ge: gap-extend penalty, negative.
      jb: database positions chained through registers per row sweep.
      ic: query-chunk size for substitution-score precomputation.
      ui: query rows unrolled per inner loop iteration.

    Returns:
      (1024,) int32 best local-alignment score per lane.

    The query is internally padded to a multiple of ``ui`` with zero-score
    rows; this cannot change any score (padded-row H values are bounded by
    existing maxima and no real row consumes their outputs).
    """
    lq = profile.shape[0]
    lb, b = db.shape
    if b != LANE_BATCH:
        raise ValueError(f"db lane batch must be {LANE_BATCH}, got {b}")
    if lb % jb != 0:
        raise ValueError(f"db length {lb} not a multiple of jb={jb}")
    if ic % ui != 0:
        raise ValueError(f"ic={ic} must be a multiple of ui={ui}")
    lqp = -(-lq // ui) * ui  # padded query rows actually computed
    nc = -(-lqp // ic)
    nj = lb // jb

    prof = profile.astype(jnp.bfloat16)
    prof = jnp.pad(prof, ((0, nc * ic - lq), (0, 0)))
    db_blocks = db.astype(jnp.int32).reshape(nj, jb, SUBLANES, LANES)

    kernel = functools.partial(
        _kernel,
        lqp=lqp,
        jb=jb,
        ic=ic,
        ui=ui,
        nc=nc,
        go=int(go),
        ge=int(ge),
    )
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec(
                (nc * ic, ALPHA), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, jb, SUBLANES, LANES),
                lambda j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES), lambda j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((lqp, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((lqp, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((lqp, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((jb, ic, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((3 * jb + 1, SUBLANES, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=15 * lq * lb * LANE_BATCH,
            bytes_accessed=lb * LANE_BATCH * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prof, db_blocks)
    return out.reshape(LANE_BATCH)
