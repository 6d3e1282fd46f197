"""Pallas kernel tests that run without TPU hardware (interpret mode).

Full-scale correctness and performance of the compiled kernel are exercised
on real hardware by tools/tpu_check.py and bench.py; here we pin the kernel
*logic* against the oracle-anchored XLA engine on a tiny workload.
"""

import numpy as np
import pytest

from seqalign_tpu.models import PAD_INDEX, encode, load_builtin, ScoringModel
from seqalign_tpu.ops.swa_pallas import choose_config, sw_pallas_windows
from seqalign_tpu.ops.swa_xla import make_profile, sw_wavefront

from conftest import random_protein


class TestChooseConfig:
    def test_monotone_windows(self):
        nws = [choose_config(lq)[0] for lq in (64, 144, 256, 384, 512, 1024)]
        assert all(a >= b for a, b in zip(nws, nws[1:]))
        assert nws[0] >= 2  # short queries get at least 2 windows

    def test_ic_bounds(self):
        for lq in (8, 144, 333, 1024):
            nw, ic = choose_config(lq)
            lqp = -(-lq // 8) * 8
            assert 1 <= nw
            assert ic <= lqp and ic % 8 == 0


@pytest.mark.slow
class TestPallasInterpret:
    def test_matches_wavefront_tiny(self, rng, blosum62):
        sc = blosum62
        q = sc.query_indices(random_protein(rng, 9))
        prof = make_profile(sc.table, q)
        seqs = [encode(random_protein(rng, int(rng.integers(1, 9)))) for _ in range(40)]
        db = np.full((8, 1024), PAD_INDEX, dtype=np.int32)
        for k, s in enumerate(seqs):
            db[: len(s), k] = s
        got = np.asarray(
            sw_pallas_windows(
                prof,
                db[None],
                sc.gap_open_total,
                sc.gap_extend,
                nw=1,
                interpret=True,
            )
        )
        want = np.asarray(
            sw_wavefront(prof, db, sc.gap_open_total, sc.gap_extend)
        )
        np.testing.assert_array_equal(got[:40], want[:40])
