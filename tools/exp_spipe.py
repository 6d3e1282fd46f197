"""Round-2 experiment: S-production pipelining (static-parity double buffer).

Measures surviving pipe modes (0/5/6) at the shapes that matter (lq=144
headline, lq=17 short-query point, lq=512 deep-unroll), with exactness
checks vs the wavefront engine. See docs/DESIGN.md "The S-path wall" for
why: the serialized produce-then-consume phases leave the MXU result
stream nothing to co-issue against; static parity (chunk index is a
Python int) sidesteps the round-1 dynamic-index Mosaic crashes.

History: this tool's round-2 runs measured modes 1-4 as no-ops/losers
(logs committed; tables in docs/DESIGN.md); those modes were pruned from
the kernel in round 5 and the kernel now rejects them.

Usage: python tools/exp_spipe.py [--lq 144] [--lb 4096]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from tpu_check import timed_gcups


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lq", type=int, nargs="*", default=[144, 17, 512])
    p.add_argument("--lb", type=int, default=4096)
    p.add_argument("--pipe", type=int, nargs="*", default=[0, 5, 6],
                   choices=[0, 5, 6])
    p.add_argument("--shapes", type=str, nargs="*", default=None,
                   help="nw,jb,ui[,icmul] tuples, e.g. 8,4,8 or 2,4,16,3")
    args = p.parse_args()

    import jax

    from seqalign_tpu.pipeline import _enable_compile_cache
    _enable_compile_cache()
    from seqalign_tpu.ops.swa_pallas import sw_pallas_windows
    from seqalign_tpu.ops.swa_xla import sw_wavefront

    rng = np.random.default_rng(11)
    lb = args.lb

    # pipe needs ic == ui; sweep the known-good shapes per length band.
    shapes_by_lq = {
        17: [(8, 8, 2), (8, 4, 4), (8, 4, 8), (6, 4, 8)],
        144: [(8, 4, 8), (10, 4, 8), (4, 4, 16), (6, 4, 8)],
        512: [(2, 4, 16), (4, 4, 16), (2, 4, 32)],
    }
    if args.shapes:
        triples = [tuple(map(int, s.split(","))) for s in args.shapes]
        shapes_by_lq = {lq: triples for lq in args.lq}

    for lq in args.lq:
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        for shape in shapes_by_lq.get(lq, [(8, 4, 8)]):
            nw, jb, ui = shape[:3]
            icm = shape[3] if len(shape) > 3 else 1
            ic = ui * icm
            # VMEM check: rows 2*lqp*nw*4KB + s 2*nw*jb*ic*4KB
            lqp = -(-lq // ui) * ui
            vm = (2 * lqp * nw + 2 * nw * jb * ic + (2 * jb + 1) * nw) * 4096
            if vm > 14.5 * 2**20:
                print(f"lq={lq} ({nw},{jb},{ui},ic={ic}): skip, "
                      f"VMEM {vm/2**20:.1f}M")
                continue
            db_small = rng.integers(1, 27, (nw, 64, 1024)).astype(np.int32)
            want = np.concatenate(
                [np.asarray(sw_wavefront(prof, db_small[w], -3, -1))
                 for w in range(nw)]
            )
            dj = jax.device_put(
                rng.integers(1, 27, (nw, lb, 1024)).astype(np.int32)
            )
            pj = jax.device_put(prof)
            jax.block_until_ready([dj, pj])
            for pipe in args.pipe:
                kw = dict(nw=nw, jb=jb, ui=ui, ic=ic, pipe=pipe)
                try:
                    got = np.asarray(
                        sw_pallas_windows(prof, db_small, -3, -1, **kw)
                    )
                except Exception as ex:
                    print(f"lq={lq} ({nw},{jb},{ui}) pipe={pipe}: "
                          f"COMPILE FAIL {str(ex)[:100]}")
                    continue
                ok = bool((got == want).all())

                def fn(i, kw=kw):
                    import jax.numpy as jnp
                    p2 = pj.at[0, 0].add((i % 4).astype(jnp.int32))
                    return sw_pallas_windows(p2, dj, -3, -1, **kw)

                try:
                    g = timed_gcups(fn, lq * lb * nw * 1024)
                except Exception as ex:
                    print(f"lq={lq} ({nw},{jb},{ui}) pipe={pipe}: "
                          f"TIME FAIL {str(ex)[:100]}")
                    continue
                print(f"lq={lq:4d} ({nw},{jb},{ui}) pipe={pipe}: "
                      f"exact={ok}  {g:6.1f} GCUPS", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
