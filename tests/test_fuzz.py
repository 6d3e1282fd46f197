"""Randomized differential fuzzing: Pallas kernels vs the scalar oracle.

Random scoring systems (within the G-form envelope: gap_open <= 0), random
alphabets (including B/Z/X/'*' and characters absent from the matrix),
random length mixes (empty-ish, single-residue, long), random kernel tile
configs — all must agree with the NumPy oracle bit-for-bit in interpret
mode. This is the sweep the reference's single-oracle harness never had.
"""

import numpy as np
import pytest

from seqalign_tpu.models.alphabet import PAD_INDEX
from seqalign_tpu.ops.oracle import sw_score_single
from seqalign_tpu.ops.swa_pallas import sw_pallas_stream, sw_pallas_windows
from seqalign_tpu.ops.swa_xla import sw_scan, sw_wavefront


def random_system(rng):
    table = rng.integers(-12, 13, (32, 32)).astype(np.int32)
    # '*' (the pad character) must score non-positively against everything —
    # the padding invariant every real matrix satisfies and the engines'
    # envelope requires (ScoringModel.padding_safe_for_query).
    table[:, PAD_INDEX] = -np.abs(table[:, PAD_INDEX]) - 1
    table[PAD_INDEX, :] = -np.abs(table[PAD_INDEX, :]) - 1
    gap_open = -int(rng.integers(0, 8))
    gap_extend = -int(rng.integers(0, 5))
    go = gap_open + gap_extend
    return table, go, gap_extend, gap_open


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(6))
def test_fuzz_windows_kernel(trial, rng):
    rng = np.random.default_rng(1000 + trial)
    table, go, ge, gap_open = random_system(rng)
    lq = int(rng.integers(1, 40))
    query = rng.integers(1, 32, lq).astype(np.int32)
    profile = table[query]
    n = int(rng.integers(1, 50))
    lens = [int(rng.integers(0, 60)) for _ in range(n)]
    db = np.full((max(max(lens), 4) + (-max(max(lens), 4)) % 4, 1024),
                 PAD_INDEX, dtype=np.int32)
    seqs = []
    for k, L in enumerate(lens):
        s = rng.integers(1, 32, L).astype(np.int32)
        seqs.append(s)
        db[:L, k] = s
    ui = int(rng.choice([2, 4, 8]))
    jb = int(rng.choice([2, 4]))
    got = np.asarray(
        sw_pallas_windows(
            profile, db[None], go, ge, nw=1, jb=jb, ui=ui, interpret=True
        )
    )
    for k in rng.choice(n, min(n, 8), replace=False):
        want = sw_score_single(query, seqs[k], table, gap_open, ge)
        assert got[k] == want, (trial, k, lens[k], got[k], want)


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(3))
def test_fuzz_xla_engines(trial):
    rng = np.random.default_rng(2000 + trial)
    table, go, ge, gap_open = random_system(rng)
    lq = int(rng.integers(1, 25))
    query = rng.integers(1, 32, lq).astype(np.int32)
    profile = table[query]
    n, lb = 16, int(rng.integers(1, 40))
    db = rng.integers(1, 32, (lb, n)).astype(np.int32)
    wf = np.asarray(sw_wavefront(profile, db, go, ge))
    sc = np.asarray(sw_scan(profile, db, go, ge))
    np.testing.assert_array_equal(wf, sc)
    for k in range(0, n, 5):
        want = sw_score_single(query, db[:, k], table, gap_open, ge)
        assert wf[k] == want


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(3))
def test_fuzz_stream_kernel(trial):
    """Random segment layouts + scoring systems through the stream kernel."""
    from seqalign_tpu.pipeline import _db_from_encoded
    from seqalign_tpu.utils.packing import pack_streams

    rng = np.random.default_rng(3000 + trial)
    table, go, ge, gap_open = random_system(rng)
    lq = int(rng.integers(1, 30))
    query = rng.integers(1, 32, lq).astype(np.int32)
    profile = table[query]
    n = int(rng.integers(1100, 3000))
    encoded = [
        rng.integers(1, 32, int(rng.integers(0, 25))).astype(np.int8)
        for _ in range(n)
    ]
    db = _db_from_encoded(encoded)
    order = np.argsort(-db.lengths, kind="stable")
    nw = int(rng.choice([1, 2]))
    jb = int(rng.choice([2, 4]))
    grain = int(rng.choice([8, 16])) * (jb // 2 if jb == 4 else 1)
    grain = max(grain, jb)
    pack = pack_streams(db, order, nw, win=1024, jb=jb, grain=grain)
    # S-production variants ride the same plumbing as the windows kernel;
    # cover the packed path through the STREAM wrapper too (it has its
    # own profile pad/pack staging and static-arg threading).
    pipe, pk = [(0, 1), (6, 1), (6, 2), (6, 4)][int(rng.integers(0, 4))]
    rng.choice(["floor", "round"])  # consume: keeps prior seeds' draws
    sdt = ("int8" if (pipe, pk) == (6, 1) and rng.random() < 0.5
           else "bf16")
    out = np.asarray(
        sw_pallas_stream(
            profile, pack.streams, pack.fs, go, ge,
            nslots=len(pack.slot_ids), nw=nw, jb=jb,
            ui=int(rng.choice([2, 4])), pipe=pipe, pack=pk, sdt=sdt,
            interpret=True,
        )
    )
    scores = np.zeros(n, dtype=np.int32)
    for slot, ids in enumerate(pack.slot_ids):
        scores[ids] = out[slot][: len(ids)]
    for k in rng.choice(n, 6, replace=False):
        want = sw_score_single(
            query, encoded[k].astype(np.int32), table, gap_open, ge
        )
        assert scores[k] == want, (trial, k, scores[k], want)


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(6))
def test_fuzz_packed_config_lattice(trial):
    """Round-3 S-production axes: (nq, pipe, pack, upk, ic) vs the oracle.

    Random scoring systems stay within |P - go| <= 24, inside every
    PACK_BOUNDS level, so all packed variants must be bit-exact. Covers
    the fused-dot pipes (5/6), multi-query row stacking, and non-default
    dot heights through sw_pallas_windows in interpret mode.
    """
    rng = np.random.default_rng(4000 + trial)
    table, go, ge, gap_open = random_system(rng)
    nq = int(rng.choice([1, 2]))
    lq = int(rng.integers(1, 36))
    queries = [rng.integers(1, 32, lq).astype(np.int32) for _ in range(nq)]
    profile = np.stack([table[q] for q in queries])
    if nq == 1:
        profile = profile[0]
    n = int(rng.integers(1, 40))
    lens = [int(rng.integers(0, 50)) for _ in range(n)]
    jb = int(rng.choice([2, 4]))
    lb = max(max(lens), jb)
    lb += (-lb) % jb
    db = np.full((lb, 1024), PAD_INDEX, dtype=np.int32)
    seqs = []
    for k, L in enumerate(lens):
        s = rng.integers(1, 32, L).astype(np.int32)
        seqs.append(s)
        db[:L, k] = s
    # pack > 1 is only defined for the merged-sublane fused-dot mode.
    pipe, pack = [(0, 1), (5, 1), (6, 1), (6, 2), (6, 4)][
        int(rng.integers(0, 5))
    ]
    rng.choice(["floor", "round"])  # consume: keeps prior seeds' draws
    ui = int(rng.choice([2, 4]))
    ic = None if rng.random() < 0.5 else int(rng.integers(1, 2 * lq + 2))
    # int8 S-dot (round 5) is defined exactly on the fused pack=1 path;
    # |P - go| <= 24 stays inside its 127 bound.
    sdt = ("int8" if (pipe, pack) == (6, 1) and rng.random() < 0.5
           else "bf16")
    got = np.asarray(
        sw_pallas_windows(
            profile, db[None], go, ge, nw=1, jb=jb, ui=ui, ic=ic,
            pipe=pipe, pack=pack, sdt=sdt, interpret=True,
        )
    )
    if nq == 1:
        got = got[None]
    for qi in range(nq):
        for k in rng.choice(n, min(n, 6), replace=False):
            want = sw_score_single(queries[qi], seqs[k], table, gap_open, ge)
            assert got[qi, k] == want, (
                trial, qi, k, pipe, pack, sdt, ic, got[qi, k], want,
            )


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(3))
def test_fuzz_striped_packed(trial):
    """Striped kernel with random stripe counts and packed S production."""
    from seqalign_tpu.ops.swa_pallas import sw_pallas_stream_striped
    from seqalign_tpu.pipeline import _db_from_encoded
    from seqalign_tpu.utils.packing import pack_streams

    rng = np.random.default_rng(5000 + trial)
    table, go, ge, gap_open = random_system(rng)
    lq = int(rng.integers(9, 40))  # > stripe_rows: multiple stripes
    query = rng.integers(1, 32, lq).astype(np.int32)
    profile = table[query]
    n = int(rng.integers(1050, 1400))
    encoded = [
        rng.integers(1, 32, int(rng.integers(0, 20))).astype(np.int8)
        for _ in range(n)
    ]
    db = _db_from_encoded(encoded)
    order = np.argsort(-db.lengths, kind="stable")
    jb = 4
    pack_ = pack_streams(db, order, 1, win=1024, jb=jb, grain=8)
    pipe, pk = [(0, 1), (6, 1), (6, 2), (6, 4)][int(rng.integers(0, 4))]
    sdt = ("int8" if (pipe, pk) == (6, 1) and rng.random() < 0.5
           else "bf16")
    out = np.asarray(
        sw_pallas_stream_striped(
            profile, pack_.streams, pack_.fs, go, ge,
            nslots=len(pack_.slot_ids), nw=1, jb=jb, ui=2,
            stripe_rows=8, pipe=pipe, pack=pk, sdt=sdt, interpret=True,
        )
    )
    scores = np.zeros(n, dtype=np.int32)
    for slot, ids in enumerate(pack_.slot_ids):
        scores[ids] = out[slot][: len(ids)]
    for k in rng.choice(n, 6, replace=False):
        want = sw_score_single(
            query, encoded[k].astype(np.int32), table, gap_open, ge
        )
        assert scores[k] == want, (trial, k, pipe, pk, scores[k], want)
