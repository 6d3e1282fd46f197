"""At-scale differential: TPU production path vs the reference's own kernel.

Scores an N-record synthetic Swiss-Prot-like workload (tools/refbench/
gen_workload.py) twice — once with the reference's AVX2 kernel compiled
from its unmodified sources (src/alignment.c via tools/refbench/driver.c)
and once with THIS framework's production Pallas stream path on the TPU —
and diffs every score bit-for-bit.

This is the scale extension of tests/test_reference_binary.py (64-record
bit-exact differential): same ground truth, 48,000 records by default.
Round-5 run: 48,000 records, PAM250, qlen=144 — 0 mismatches, identical
checksums (docs/ROUND5.md).

Queries longer than the flat kernel's VMEM rows route to the striped
(unbounded-query) production automatically, mirroring the pipeline; the
round-5 striped run (lq=35,000 x 256 records) was also 0 mismatches.

Usage (TPU host; builds the reference binary if missing):
  python tools/scale_diff.py [n_records] [--matrix PAM250] [--go -2 --ge -1]
  python tools/scale_diff.py 256 --qlen 35000     # striped path
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")


def build_refbench(binary: Path) -> None:
    subprocess.run(
        [
            "gcc", "-O3", "-march=native", "-mavx2", "-fopenmp",
            f"-I{REF}/src", "-o", str(binary),
            str(REPO / "tools/refbench/driver.c"),
            str(REF / "src/alignment.c"),
            str(REF / "src/alignment_scoring.c"),
        ],
        check=True,
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("n", type=int, nargs="?", default=48_000)
    p.add_argument("--matrix", default="PAM250")
    p.add_argument("--go", type=int, default=-2,
                   help="gap open, excluding the first extend (reference "
                   "convention)")
    p.add_argument("--ge", type=int, default=-1)
    p.add_argument("--qlen", type=int, default=144)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--random-matrix", type=int, default=None,
                   metavar="SEED",
                   help="use a random asymmetric substitution table "
                   "(gen_workload.write_random_matrix) instead of a "
                   "builtin — the at-scale extension of the randomized "
                   "differential in tests/test_reference_binary.py")
    args = p.parse_args()

    from seqalign_tpu.pipeline import _enable_compile_cache

    _enable_compile_cache()

    sys.path.insert(0, str(REPO / "tools/refbench"))
    import gen_workload

    binary = Path("/tmp/refbench_scale")
    if not binary.exists():
        build_refbench(binary)
    db_bin, mat = "/tmp/scale_db.bin", "/tmp/scale_matrix.txt"
    gen_workload.write_workload(db_bin, n=args.n, query_len=args.qlen,
                                seed=args.seed)
    if args.random_matrix is not None:
        rnd_table = gen_workload.write_random_matrix(
            mat, seed=args.random_matrix)
    else:
        rnd_table = None
        gen_workload.write_matrix(mat, name=args.matrix)

    out = subprocess.run(
        [str(binary), db_bin, mat, "1", str(args.go), str(args.ge)],
        check=True, capture_output=True, text=True,
        env={**os.environ, "OMP_NUM_THREADS": str(os.cpu_count() or 1)},
    ).stdout
    ref = np.array(
        [int(x.split("=")[1]) for x in out.splitlines()
         if x.startswith("score[")], np.int32)
    assert len(ref) == args.n, (len(ref), args.n)
    print(out.splitlines()[0])

    from seqalign_tpu.models import ScoringModel, load_builtin
    from seqalign_tpu.ops.swa_pallas import (
        STRIPE_ROWS,
        choose_config,
        sw_pallas_stream,
        sw_pallas_stream_striped,
    )
    from seqalign_tpu.ops.swa_xla import make_profile
    from seqalign_tpu.pipeline import _db_from_encoded
    from seqalign_tpu.utils.packing import pack_streams

    if rnd_table is not None:
        sc = ScoringModel(gap_open=args.go, gap_extend=args.ge,
                          use_match_mismatch=False)
        sc.table[...] = rnd_table
    else:
        sc = load_builtin(
            args.matrix,
            ScoringModel(gap_open=args.go, gap_extend=args.ge,
                         use_match_mismatch=False),
        )
    with open(db_bin, "rb") as f:
        n = int(np.frombuffer(f.read(8), np.int64)[0])
        qlen = int(np.frombuffer(f.read(8), np.int64)[0])
        q = np.frombuffer(f.read(qlen), np.int8).astype(np.int32)
        lens = np.frombuffer(f.read(8 * n), np.int64)
        seqs = [np.frombuffer(f.read(int(L)), np.int8) for L in lens]

    prof = make_profile(sc.table, q)
    go, ge = sc.gap_open_total, sc.gap_extend
    pmax = float(np.max(np.abs(prof.astype(np.float64) - go)))
    cfg = choose_config(qlen, reserve=(1 << 20), max_abs_bias=pmax)
    striped = cfg is None  # query too tall for the flat kernel: the
    # pipeline routes it to the striped production — mirror that here
    if striped:
        cfg = choose_config(STRIPE_ROWS, reserve=(1 << 20),
                            max_abs_bias=pmax, striped=True)
    print("production cfg:", cfg, "(striped)" if striped else "")
    db = _db_from_encoded(seqs)
    order = np.argsort(-db.lengths, kind="stable")
    pack = pack_streams(db, order, cfg.nw, win=1024, jb=cfg.jb, grain=16)
    kw = dict(nslots=len(pack.slot_ids), nw=cfg.nw, jb=cfg.jb, ui=cfg.ui,
              ic=cfg.ic, pipe=cfg.pipe, pack=cfg.pack, upk=cfg.upk,
              sdt=cfg.sdt)
    if striped:
        res = np.asarray(sw_pallas_stream_striped(
            prof, pack.streams, pack.fs, go, ge,
            stripe_rows=STRIPE_ROWS, **kw))
    else:
        res = np.asarray(sw_pallas_stream(
            prof, pack.streams, pack.fs, go, ge, **kw))
    scores = np.zeros(n, np.int32)
    for slot, ids in enumerate(pack.slot_ids):
        scores[ids] = res[slot][: len(ids)]

    bad = np.flatnonzero(scores != ref)
    print(f"checksum ours={int(scores.sum())} ref={int(ref.sum())}")
    mname = (f"random-matrix seed={args.random_matrix}"
             if rnd_table is not None else args.matrix)
    print(f"AT-SCALE DIFFERENTIAL ({n} records, {mname}, "
          f"qlen={qlen}): mismatches={len(bad)}")
    if len(bad):
        for i in bad[:10]:
            print(f"  idx={i} len={int(lens[i])} ours={int(scores[i])} "
                  f"ref={int(ref[i])}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
