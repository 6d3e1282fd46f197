# Scratch: kernel v3 — sublane-scaled lane batches (SL=8/16/32), batched
# group loads for rows/state/S. Promoted into ops/swa_pallas.py if it wins.
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN = 128


def make_kernel(lqp, sl, jb, ic, ui, nc, go, ge):
    ns = 3 * jb + 1  # state slots

    def kernel(prof_ref, db_ref, out_ref, row_h, row_e, row_f, s_buf,
               best_ref, state_ref):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _init():
            row_h[...] = jnp.zeros_like(row_h)
            row_e[...] = jnp.zeros_like(row_e)
            row_f[...] = jnp.zeros_like(row_f)
            best_ref[...] = jnp.zeros_like(best_ref)

        d = db_ref[0]  # (JB, SL, LN)
        state_ref[...] = jnp.zeros_like(state_ref)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (32, sl, LN), 0)

        def make_body(c):
            def body(g, best):
                base = c * ic + g * ui
                st = state_ref[...]  # (NS, SL, LN) one load
                lh = [st[3 * t + 0] for t in range(jb)]
                le = [st[3 * t + 1] for t in range(jb)]
                lf = [st[3 * t + 2] for t in range(jb)]
                t0 = st[3 * jb]
                # Batched group loads: one dynamic-index load per ref.
                uh = row_h[pl.ds(base, ui)]  # (UI, SL, LN)
                ue = row_e[pl.ds(base, ui)]
                uf = row_f[pl.ds(base, ui)]
                sg = s_buf[:, pl.ds(g * ui, ui)]  # (JB, UI, SL, LN)
                oh_list = [None] * ui
                oe_list = [None] * ui
                of_list = [None] * ui
                for u in range(ui):
                    up_h, up_e, up_f = uh[u], ue[u], uf[u]
                    m_up = jnp.maximum(up_h, up_f)
                    t0n = jnp.maximum(m_up, up_e)
                    cur_e = up_e
                    dt = t0
                    for t in range(jb):
                        s = sg[t, u]
                        h = jnp.maximum(dt + s, 0)
                        e = jnp.maximum(m_up + go, cur_e + ge)
                        mhe = jnp.maximum(lh[t], le[t])
                        f = jnp.maximum(mhe + go, lf[t] + ge)
                        best = jnp.maximum(best, h)
                        if t + 1 < jb:
                            dt = jnp.maximum(mhe, lf[t])
                        m_up = jnp.maximum(h, f)
                        cur_e = e
                        lh[t], le[t], lf[t] = h, e, f
                    t0 = t0n
                    oh_list[u], oe_list[u], of_list[u] = lh[jb-1], le[jb-1], lf[jb-1]
                row_h[pl.ds(base, ui)] = jnp.stack(oh_list)
                row_e[pl.ds(base, ui)] = jnp.stack(oe_list)
                row_f[pl.ds(base, ui)] = jnp.stack(of_list)
                state_ref[...] = jnp.stack(
                    [v for t in range(jb) for v in (lh[t], le[t], lf[t])] + [t0]
                )
                return best

            return body

        best = best_ref[...]
        for c in range(nc):
            p_chunk = prof_ref[pl.ds(c * ic, ic), :]  # (IC, 32) bf16
            for t in range(jb):
                oh = (c_iota == d[t][None]).astype(jnp.bfloat16)
                s_t = jax.lax.dot_general(
                    p_chunk, oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_buf[t] = s_t.astype(jnp.int32)
            groups = min(ic, lqp - c * ic) // ui
            best = jax.lax.fori_loop(0, groups, make_body(c), best)
        best_ref[...] = best

        @pl.when(j == nj - 1)
        def _emit():
            out_ref[...] = best_ref[...]

    return kernel


def sw3(profile, db, go, ge, sl=16, jb=8, ic=32, ui=8):
    lq = profile.shape[0]
    lb, b = db.shape
    assert b == sl * LN, (b, sl * LN)
    lqp = -(-lq // ui) * ui
    nc = -(-lqp // ic)
    nj = lb // jb
    prof = jnp.pad(profile.astype(jnp.bfloat16), ((0, nc * ic - lq), (0, 0)))
    dbb = db.astype(jnp.int32).reshape(nj, jb, sl, LN)
    kernel = make_kernel(lqp, sl, jb, ic, ui, nc, go, ge)
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((nc * ic, 32), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, sl, LN), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sl, LN), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sl, LN), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lqp, sl, LN), jnp.int32)] * 3 +
                       [pltpu.VMEM((jb, ic, sl, LN), jnp.int32),
                        pltpu.VMEM((sl, LN), jnp.int32),
                        pltpu.VMEM((3 * jb + 1, sl, LN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(prof, dbb)
    return out.reshape(sl * LN)


if __name__ == "__main__":
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(3)
    lq = 256
    prof_i = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
    f = jax.jit(sw3, static_argnames=("go", "ge", "sl", "jb", "ic", "ui"))

    for sl, jb, ic, ui in [(8, 8, 32, 8), (16, 8, 32, 8), (32, 8, 16, 8),
                           (16, 8, 64, 8), (16, 16, 32, 8), (16, 8, 32, 16),
                           (32, 8, 32, 8)]:
        db = rng.integers(1, 27, (256, sl * 128)).astype(np.int32)
        try:
            a = np.asarray(f(prof_i, db, -3, -1, sl=sl, jb=jb, ic=ic, ui=ui))
            want = np.asarray(sw_wavefront(prof_i, db, -3, -1))
            ok = (a == want).all()
            print(f"CHECK sl={sl} jb={jb} ic={ic} ui={ui}: {ok}", flush=True)
            if not ok:
                continue
        except Exception as e:
            print(f"CHECK sl={sl} jb={jb} ic={ic} ui={ui} FAIL:",
                  str(e).split(chr(10))[0][:90], flush=True)
            continue
        lbw = 8192
        dj = jax.device_put(rng.integers(1, 27, (lbw, sl * 128)).astype(np.int32))
        pj = jax.device_put(prof_i)
        r = f(pj, dj, -3, -1, sl=sl, jb=jb, ic=ic, ui=ui)
        r.block_until_ready()
        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(pj, dj, -3, -1, sl=sl, jb=jb, ic=ic, ui=ui)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        cells = lq * lbw * sl * 128
        print(f"RES sl={sl} jb={jb} ic={ic} ui={ui}: {dt*1e3:.2f} ms  "
              f"{cells/dt/1e9:.0f} GCUPS", flush=True)
