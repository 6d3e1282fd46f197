"""Direct MXU probe: bf16 vs int8 S-dot cost at the kernel's dot shapes.

Round-5 follow-up to the S-dot cost model (docs/DESIGN.md "The short band
is S-dot-bound"): dot time was measured M-free (M<=128) and linear in K for
the bf16 one-hot matmul. v5e's MXU runs int8 at 2x bf16 macs/s, and an int8
*dot* is a different Mosaic path from the int8 *elementwise* ops that crash
the compiler — it was never probed. If an int8x int8->int32 dot at
(M=18, K=32)@(32, N) costs ~half the bf16 one, the short band's structural
wall moves.

Methodology matches tools/tpu_check.timed_gcups: two-point chained-rep
difference inside one jit (fori_loop body perturbs an input by the loop
index so XLA cannot hoist), np.asarray fetch as the completion barrier,
and the dtype variants are timed in INTERLEAVED rounds (session drift on
the tunneled device measured +-20%, docs/DESIGN.md round 4).

Usage: python tools/dot_probe.py [--n 524288] [--rounds 5]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def build_variant(name, m, k, n, dtype, out_dtype):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype == "int8":
        lhs = jnp.asarray(rng.integers(-30, 30, size=(m, k)), jnp.int8)
        rhs = jnp.asarray(rng.integers(0, 2, size=(k, n)), jnp.int8)
    else:
        lhs = jnp.asarray(rng.integers(-30, 30, size=(m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.integers(0, 2, size=(k, n)), jnp.bfloat16)

    def fn(i, lhs=lhs, rhs=rhs):
        # perturb one lhs element by the loop index: defeats hoisting
        l = lhs.at[0, 0].add(i.astype(lhs.dtype) % 3)
        out = jax.lax.dot_general(
            l, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )
        # consume: cheap reduction so the result stream is produced but the
        # fetch is one scalar
        return jnp.sum(out[:, :: max(1, n // 128)].astype(jnp.int32)).reshape(1)

    return fn


def two_point(chain, r1, r2):
    def run(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chain(reps))
        return time.perf_counter() - t0

    t1 = min(run(r1) for _ in range(2))
    t2 = min(run(r2) for _ in range(2))
    return max((t2 - t1) / (r2 - r1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--r1", type=int, default=8)
    ap.add_argument("--r2", type=int, default=136)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import functools

    n = args.n
    variants = [
        ("bf16 K=32  M=18", 18, 32, n, "bf16", jnp.float32),
        ("int8 K=32  M=18", 18, 32, n, "int8", jnp.int32),
        ("bf16 K=128 M=18", 18, 128, n, "bf16", jnp.float32),
        ("int8 K=128 M=18", 18, 128, n, "int8", jnp.int32),
        ("bf16 K=32  M=128", 128, 32, n, "bf16", jnp.float32),
        ("int8 K=32  M=128", 128, 32, n, "int8", jnp.int32),
    ]

    chains = []
    for name, m, k, nn, dt, odt in variants:
        fn = build_variant(name, m, k, nn, dt, odt)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chain(reps, fn=fn):
            def body(i, acc):
                return acc + fn(i)[0]

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

        # compile/warm both points now; a compile failure surfaces here
        try:
            t0 = time.perf_counter()
            print(f"compiling {name} ...", flush=True)
            np.asarray(chain(args.r1))
            np.asarray(chain(args.r2))
            print(f"  compiled in {time.perf_counter()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE/RUN FAILED: {type(e).__name__}: {e}")
            chains.append((name, None))
            continue
        chains.append((name, chain))

    results = {name: [] for name, c in chains if c is not None}
    for r in range(args.rounds):
        for name, chain in chains:
            if chain is None:
                continue
            dt = two_point(chain, args.r1, args.r2)
            results[name].append(dt)
            print(f"round {r} {name}: {dt*1e6:.1f} us/dot", flush=True)

    print()
    print(f"N={n}, medians of {args.rounds} interleaved rounds:")
    base = None
    for name, _m, _k, _nn, _dt, _odt in variants:
        if name not in results or not results[name]:
            continue
        med = statistics.median(results[name])
        spread = (max(results[name]) - min(results[name])) / med * 100
        if base is None:
            base = med
        print(
            f"  {name}: {med*1e6:8.1f} us/dot  spread {spread:4.1f}%  "
            f"vs first {med/base:5.2f}x"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
