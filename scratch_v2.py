# Scratch benchmark: kernel v2 prototype (nw interleaved windows, no E/F
# floors). Not part of the package; promoted into ops/swa_pallas.py when
# validated.
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SL, LN = 8, 128


def make_kernel(lqp, nw, jb, ic, ui, nc, go, ge):
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

        d = db_ref[:, 0]  # (NW, JB, 8, 128)
        state_ref[...] = jnp.zeros_like(state_ref)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (32, SL, LN), 0)

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
                        e = [jnp.maximum(m_up[w] + go, cur_e[w] + ge) for w in range(nw)]
                        mhe = [jnp.maximum(lh[w][t], le[w][t]) for w in range(nw)]
                        f = [jnp.maximum(mhe[w] + go, lf[w][t] + ge) for w in range(nw)]
                        best = [jnp.maximum(best[w], h[w]) for w in range(nw)]
                        if t + 1 < jb:
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
            p_chunk = prof_ref[pl.ds(c * ic, ic), :]
            for w in range(nw):
                for t in range(jb):
                    oh = (c_iota == d[w, t][None]).astype(jnp.bfloat16)
                    s_t = jax.lax.dot_general(
                        p_chunk, oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s_buf[w, t] = s_t.astype(jnp.int32)
            groups = min(ic, lqp - c * ic) // ui
            best = jax.lax.fori_loop(0, groups, make_body(c), best)
        for w in range(nw):
            best_ref[w] = best[w]

        @pl.when(j == nj - 1)
        def _emit():
            out_ref[...] = best_ref[...]

    return kernel


def sw2(profile, db, go, ge, nw=2, jb=4, ic=64, ui=8):
    lq = profile.shape[0]
    lbw, b = db.shape
    assert b == nw * SL * LN
    lqp = -(-lq // ui) * ui
    nc = -(-lqp // ic)
    nj = lbw // jb
    prof = jnp.pad(profile.astype(jnp.bfloat16), ((0, nc * ic - lq), (0, 0)))
    dbb = (db.astype(jnp.int32)
           .reshape(lbw, nw, SL, LN).transpose(1, 0, 2, 3)
           .reshape(nw, nj, jb, SL, LN))
    kernel = make_kernel(lqp, nw, jb, ic, ui, nc, go, ge)
    out = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((nc * ic, 32), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, 1, jb, SL, LN), lambda j: (0, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nw, SL, LN), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, SL, LN), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nw, lqp, SL, LN), jnp.int32)] * 3 +
                       [pltpu.VMEM((nw, jb, ic, SL, LN), jnp.int32),
                        pltpu.VMEM((nw, SL, LN), jnp.int32),
                        pltpu.VMEM((nw, 3 * jb + 1, SL, LN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(prof, dbb)
    return out.reshape(nw * SL * LN)


if __name__ == "__main__":
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(3)
    lq = 256
    prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
    f = jax.jit(sw2, static_argnames=("go", "ge", "nw", "jb", "ic", "ui"))

    for nw, jb, ui in [(1, 4, 8), (2, 4, 8), (4, 4, 8), (2, 8, 8), (4, 8, 4), (8, 4, 4)]:
        db = rng.integers(1, 27, (256, nw * 1024)).astype(np.int32)
        try:
            a = np.asarray(f(prof, db, -3, -1, nw=nw, jb=jb, ui=ui))
            dbw = db.reshape(256, nw, 1024)
            want = np.concatenate([
                np.asarray(sw_wavefront(prof, dbw[:, w], -3, -1))
                for w in range(nw)])
            print(f"CHECK nw={nw} jb={jb} ui={ui}:", (a == want).all(), flush=True)
        except Exception as e:
            print(f"CHECK nw={nw} jb={jb} ui={ui} FAIL:",
                  str(e).split(chr(10))[0][:110], flush=True)
            continue
        dbL = rng.integers(1, 27, (8192, nw * 1024)).astype(np.int32)
        dj = jax.device_put(dbL)
        pj = jax.device_put(prof)
        r = f(pj, dj, -3, -1, nw=nw, jb=jb, ui=ui)
        r.block_until_ready()
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            r = f(pj, dj, -3, -1, nw=nw, jb=jb, ui=ui)
            r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        cells = lq * 8192 * nw * 1024
        print(f"RES nw={nw} jb={jb} ui={ui}: {dt*1e3:.1f} ms, "
              f"{cells/dt/1e9:.1f} GCUPS", flush=True)
