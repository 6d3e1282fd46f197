"""Pallas kernel tests that run without TPU hardware (interpret mode).

Full-scale correctness and performance of the compiled kernel are exercised
on real hardware by tools/tpu_check.py and bench.py; here we pin the kernel
*logic* against the oracle-anchored XLA engine on a tiny workload.
"""

import numpy as np
import pytest

from seqalign_tpu.models import PAD_INDEX, encode, load_builtin, ScoringModel
from seqalign_tpu.ops.swa_pallas import (
    choose_config,
    sw_pallas_stream,
    sw_pallas_windows,
)
from seqalign_tpu.ops.swa_xla import make_profile, sw_wavefront

from conftest import random_protein


class TestChooseConfig:
    def test_bands_give_validated_shapes(self):
        # Every band yields a config; fused production (pipe=6) serves the
        # short and mid bands, deep-unroll pipe=0 the long ones.
        assert choose_config(17).pipe == 6  # full-ic fused dot
        assert choose_config(17).ic == 18  # whole padded query
        assert choose_config(144).pipe == 6
        assert choose_config(512).pipe == 0
        for lq in (8, 48, 64, 96, 191, 192, 256, 1024, 1536):
            assert choose_config(lq) is not None

    def test_chosen_configs_pass_fits_vmem(self):
        """config_fits_vmem shares choose_config's accounting: every
        emitted config must validate, and an ic above the budget's
        solution must not (the helper gates hand-built experiment
        candidates, tools/exp_pack.py)."""
        import dataclasses

        from seqalign_tpu.ops.swa_pallas import config_fits_vmem

        for lq in (8, 17, 144, 333, 512, 1024):
            for nq in (1, 8):
                for reserve in (0, 2 << 20):
                    cfg = choose_config(
                        lq, reserve=reserve, nq=nq, max_abs_bias=22.0
                    )
                    if cfg is None:
                        continue
                    assert config_fits_vmem(lq, cfg, nq=nq, reserve=reserve)
        # A known-infeasible explicit candidate (48 chains full-height
        # at lq=144 overruns even the single-parity budget).
        from seqalign_tpu.ops.swa_pallas import KernelConfig

        big = KernelConfig(nw=3, jb=16, ui=16, ic=144, pipe=6, pack=4)
        assert not config_fits_vmem(144, big)
        # The 32-chain full-height shape fits ONLY because nc == 1
        # allocates a single s_buf parity (_sbuf_scratch): under the
        # double-buffered accounting the same shape must NOT reach full
        # height (this was the round-4 audit's 15.5 MiB > budget bound).
        from seqalign_tpu.ops.swa_pallas import _vmem_ic_budget

        full32 = KernelConfig(nw=2, jb=16, ui=16, ic=144, pipe=6, pack=4)
        assert config_fits_vmem(144, full32)
        b2, _, lqp = _vmem_ic_budget(144, 2, 16, 16, 6, 4)
        b1, _, _ = _vmem_ic_budget(144, 2, 16, 16, 6, 4, nc1=True)
        assert b2 < lqp <= b1
        # The adopted lq=144 production shape fits with room to spare.
        ok = KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4)
        assert config_fits_vmem(144, ok)

    def test_bounds(self):
        import math

        for lq in (8, 17, 144, 333, 1024):
            for nq in (1, 8):
                for reserve in (0, 2 << 20):
                    for pmax in (None, 22.0):
                        cfg = choose_config(
                            lq, reserve=reserve, nq=nq, max_abs_bias=pmax
                        )
                        if cfg is None:
                            # Infeasible row footprints must be rejected,
                            # not silently over-allocated (callers fall
                            # back to XLA).
                            assert nq * lq >= 1024
                            continue
                        lat = (
                            cfg.ui * cfg.pack
                            // math.gcd(cfg.ui, cfg.pack)
                        )
                        lqp = nq * (-(-lq // lat) * lat)
                        assert 1 <= cfg.nw
                        assert cfg.ui <= cfg.ic <= lqp
                        assert cfg.ic % cfg.ui == 0
                        assert cfg.ic % cfg.pack == 0
                        if pmax is None:
                            # no bias bound known: packing must stay off
                            assert cfg.pack == 1
                        # VMEM footprint (incl. half-weighted one-hot
                        # stack temporaries widened by pack, per-query
                        # bests, the pipe modes' double-buffered S block
                        # at ic/pack physical rows) stays under budget.
                        # A full-height chunk (nc == 1) allocates a
                        # single parity (_sbuf_scratch).
                        parity = 2 if (cfg.pipe and cfg.ic < lqp) else 1
                        vmem = (
                            2 * lqp * cfg.nw * 4096
                            + parity * cfg.nw * cfg.jb
                            * (cfg.ic // cfg.pack) * 4096
                            + (2 * cfg.jb + 1) * cfg.nw * 4096
                            + nq * cfg.nw * 4096
                            + cfg.nw * cfg.jb * cfg.pack * 32 * 1024
                        )
                        assert vmem <= 15.2 * 2**20 - reserve

    def test_pack_gate(self):
        """Packed shapes appear only under an in-bound bias limit."""
        # lq=144 band carries the hardware-validated pack=4 full-height
        # entry (exp_pack: 232.4 vs 212.0 GCUPS)
        cfg = choose_config(144, max_abs_bias=22.0)
        assert cfg.pack == 4 and cfg.pipe == 6 and cfg.ic == 144
        # beyond the 6-bit field bound the entry is ineligible
        assert choose_config(144, max_abs_bias=32.0).pack == 1
        assert choose_config(144).pack == 1  # unknown bias: off

    def test_fixed_nw_honored(self):
        for lq in (17, 144):
            for nw in (1, 2):
                assert choose_config(lq, nw=nw).nw == nw


class TestSupportedScoring:
    @pytest.mark.slow
    def test_f32_exactness_bound(self):
        """Queries whose max attainable score reaches 2**24 must be routed
        to the int32 XLA engine: the striped kernel has no length cap, and
        f32 integer exactness ends at 2**24 (ADVICE round 1)."""
        from seqalign_tpu.ops.swa_pallas import supported_scoring

        lq_bad = 2**24 // 17 + 1
        prof_small = np.full((64, 32), 17, dtype=np.int32)
        assert supported_scoring(prof_small, -3, -1)
        prof_long = np.full((lq_bad, 32), 17, dtype=np.int32)
        assert not supported_scoring(prof_long, -3, -1)
        # All-nonpositive tables can never accumulate: any length is fine.
        prof_neg = np.full((lq_bad, 32), -4, dtype=np.int32)
        assert supported_scoring(prof_neg, -3, -1)

    def test_bf16_and_gap_envelope(self):
        from seqalign_tpu.ops.swa_pallas import supported_scoring

        prof = np.full((16, 32), 300, dtype=np.int32)
        assert not supported_scoring(prof, -3, -1)  # beyond bf16-exact
        prof = np.full((16, 32), 4, dtype=np.int32)
        assert not supported_scoring(prof, -1, -2)  # ge < go


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

    def test_pruned_pipe_modes_rejected(self, rng, blosum62):
        """pipe modes 1-4 and 7 were measured losers/no-ops and pruned
        (round 5); the kernel rejects them loudly instead of silently
        running something else. Negative results: docs/DESIGN.md."""
        sc = blosum62
        prof = make_profile(sc.table, sc.query_indices("ACDEFGHK"))
        db = np.full((12, 1024), PAD_INDEX, dtype=np.int32)
        for pipe in (1, 2, 3, 4, 7):
            with pytest.raises(ValueError, match="pruned"):
                sw_pallas_windows(
                    prof, db[None], sc.gap_open_total, sc.gap_extend,
                    nw=1, jb=4, ui=4, ic=4, pipe=pipe, interpret=True,
                )

    @pytest.mark.slow
    def test_pipe_multiquery(self, rng, blosum62):
        """pipe mode with batched queries: static chain cuts stay exact."""
        sc = blosum62
        nq = 2
        queries = [random_protein(rng, 6) for _ in range(nq)]
        profs = np.zeros((nq, 6, 32), dtype=np.int32)
        for k, q in enumerate(queries):
            profs[k] = make_profile(sc.table, sc.query_indices(q))
        seqs = [
            encode(random_protein(rng, int(rng.integers(1, 10))))
            for _ in range(40)
        ]
        db = np.full((12, 1024), PAD_INDEX, dtype=np.int32)
        for k, s in enumerate(seqs):
            db[: len(s), k] = s
        got = np.asarray(
            sw_pallas_windows(
                profs, db[None], sc.gap_open_total, sc.gap_extend,
                nw=1, jb=4, ui=2, ic=2, pipe=5, interpret=True,
            )
        )
        for k in range(nq):
            want = np.asarray(
                sw_wavefront(profs[k], db, sc.gap_open_total, sc.gap_extend)
            )
            np.testing.assert_array_equal(got[k, :40], want[:40])

    def test_multiquery_matches_wavefront(self, rng, blosum62):
        """NQ queries batched along the row dimension, one dispatch."""
        sc = blosum62
        nq, lqmax = 3, 10
        queries = [random_protein(rng, int(rng.integers(4, lqmax + 1))) for _ in range(nq)]
        profs = np.zeros((nq, lqmax, 32), dtype=np.int32)
        for k, q in enumerate(queries):
            p = make_profile(sc.table, sc.query_indices(q))
            profs[k, : len(p)] = p  # zero rows pad shorter queries
        seqs = [encode(random_protein(rng, int(rng.integers(1, 12)))) for _ in range(60)]
        db = np.full((12, 1024), PAD_INDEX, dtype=np.int32)
        for k, s in enumerate(seqs):
            db[: len(s), k] = s
        got = np.asarray(
            sw_pallas_windows(
                profs,
                db[None],
                sc.gap_open_total,
                sc.gap_extend,
                nw=1,
                ui=2,
                interpret=True,
            )
        )
        assert got.shape == (nq, 1024)
        for k in range(nq):
            want = np.asarray(
                sw_wavefront(
                    profs[k], db, sc.gap_open_total, sc.gap_extend
                )
            )
            np.testing.assert_array_equal(got[k, :60], want[:60])

    def test_packed_production_matches_wavefront(self, rng, blosum62):
        """pack=2/4 field-packed S dots are bit-identical to pack=1.

        Packed production (round 3) folds ``pack`` query rows' biased
        scores into one f32 dot output via power-of-2 field scaling
        (exact: every field is an integer under the per-pack bound, the
        total under 2^24 — see _run_block's docstring).
        """
        sc = blosum62  # P' = P + 12 in [8, 23]: inside pack=4's 31-bound
        q = sc.query_indices(random_protein(rng, 11))
        prof = make_profile(sc.table, q)
        seqs = [
            encode(random_protein(rng, int(rng.integers(1, 10))))
            for _ in range(50)
        ]
        db = np.full((12, 1024), PAD_INDEX, dtype=np.int32)
        for k, s in enumerate(seqs):
            db[: len(s), k] = s
        want = np.asarray(
            sw_wavefront(prof, db, sc.gap_open_total, sc.gap_extend)
        )
        for pack in (2, 4):
            got = np.asarray(
                sw_pallas_windows(
                    prof, db[None], sc.gap_open_total, sc.gap_extend,
                    nw=1, jb=4, ui=2, ic=12, pipe=6, pack=pack,
                    interpret=True,
                )
            )
            np.testing.assert_array_equal(got[:50], want[:50])

    def test_pruned_upk_round_rejected(self, rng):
        """upk="round" lost the round-4 hardware A/B and was pruned
        (round 5): the kernel and choose_config both reject it loudly."""
        from seqalign_tpu.ops.swa_pallas import choose_config

        go, ge = -3, -1
        prof = rng.integers(-20, 20, (12, 32)).astype(np.int32)
        db = np.full((1, 4, 1024), PAD_INDEX, dtype=np.int32)
        with pytest.raises(ValueError, match="pruned"):
            sw_pallas_windows(
                prof, db, go, ge,
                nw=1, jb=4, ui=2, ic=12, pipe=6, pack=4, upk="round",
                interpret=True,
            )
        with pytest.raises(ValueError, match="pruned"):
            choose_config(144, max_abs_bias=18.0, upk="round")

    def test_single_parity_full_height_fast(self, rng):
        """nc==1 single-parity s_buf (_sbuf_scratch): multi-window
        full-height packed production is bit-exact (cheap jb=4 shape;
        the high-jb family is in the slow-tier test below)."""
        go, ge = -3, -1
        prof = rng.integers(-8, 12, (8, 32)).astype(np.int32)
        db = np.full((2, 8, 1024), PAD_INDEX, dtype=np.int32)
        db[:, :, :60] = rng.integers(1, 27, (2, 8, 60))
        want = np.concatenate([
            np.asarray(sw_wavefront(prof, db[w], go, ge))[:60]
            for w in range(2)
        ])
        got = np.asarray(
            sw_pallas_windows(
                prof, db, go, ge,
                nw=2, jb=4, ui=4, ic=8, pipe=6, pack=4, interpret=True,
            )
        )
        got = np.concatenate([got[:60], got[1024 : 1024 + 60]])
        np.testing.assert_array_equal(got, want)

    @pytest.mark.slow
    def test_single_parity_full_height_multiwindow(self, rng):
        """nc==1 configs allocate ONE s_buf parity (_sbuf_scratch) —
        scores must be bit-identical in the high-jb multi-window shapes
        the fix made feasible (the 32-chain full-height family), and in
        their chunked (nc>1, still double-buffered) counterparts.
        """
        go, ge = -3, -1
        lq, sl, lanes = 8, 2, 2 * 128
        prof = rng.integers(-8, 12, (lq, 32)).astype(np.int32)
        db = np.full((2, 16, lanes), PAD_INDEX, dtype=np.int32)
        db[:, :, :80] = rng.integers(1, 27, (2, 16, 80))
        want = np.concatenate([
            np.asarray(sw_wavefront(prof, db[w], go, ge))[:80]
            for w in range(2)
        ])
        for ic, pipe, pack in (
            (8, 6, 4),   # full height, nc=1: single parity (the fix)
            (8, 6, 2),
            (8, 5, 1),   # full height, per-window fused dots
            (4, 6, 4),   # chunked, nc=2: double parity retained
            (4, 5, 1),
        ):
            got = np.asarray(
                sw_pallas_windows(
                    prof, db, go, ge,
                    sl=sl, nw=2, jb=16, ui=4, ic=ic, pipe=pipe, pack=pack,
                    interpret=True,
                )
            )
            got = np.concatenate([got[:80], got[lanes : lanes + 80]])
            np.testing.assert_array_equal(got, want, err_msg=str(
                (ic, pipe, pack)))

    def test_packed_requires_fused_mode(self, blosum62):
        sc = blosum62
        prof = make_profile(sc.table, sc.query_indices("ACDEFGHK"))
        db = np.full((1, 4, 1024), PAD_INDEX, dtype=np.int32)
        with pytest.raises(ValueError, match="pack > 1 requires"):
            sw_pallas_windows(
                prof, db, sc.gap_open_total, sc.gap_extend,
                nw=1, jb=4, ui=2, ic=4, pipe=0, pack=4, interpret=True,
            )

    def test_packed_profile_at_field_bound(self, rng):
        """|P'| exactly at the pack=4 bound (31) stays exact.

        The packed field layout is exact only while every biased score
        fits its 6-bit field; this pins the boundary so a future scoring
        model that widens the range must widen pack's gate, not corrupt
        scores silently.
        """
        go, ge = -3, -1
        lq = 8
        # P' = P - go = P + 3 == +/-31 at the extremes
        prof = rng.integers(-34, 29, (lq, 32)).astype(np.int32)
        prof[0, 1] = 28   # P' = 31
        prof[1, 2] = -34  # P' = -31
        db = np.full((1, 4, 1024), PAD_INDEX, dtype=np.int32)
        db[0, :, :64] = rng.integers(1, 27, (4, 64))
        want = np.asarray(sw_wavefront(prof, db[0], go, ge))
        got = np.asarray(
            sw_pallas_windows(
                prof, db, go, ge,
                nw=1, jb=4, ui=2, ic=8, pipe=6, pack=4, interpret=True,
            )
        )
        np.testing.assert_array_equal(got[:64], want[:64])

    @pytest.mark.slow
    def test_packed_multiquery(self, rng, blosum62):
        """pack=4 with row-stacked queries: packed groups never straddle a
        query boundary (per-query rows pad to lcm(ui, pack))."""
        sc = blosum62
        nq, lqmax = 2, 9
        queries = [
            random_protein(rng, int(rng.integers(5, lqmax + 1)))
            for _ in range(nq)
        ]
        profs = np.zeros((nq, lqmax, 32), dtype=np.int32)
        for k, q in enumerate(queries):
            p = make_profile(sc.table, sc.query_indices(q))
            profs[k, : len(p)] = p
        seqs = [
            encode(random_protein(rng, int(rng.integers(1, 12))))
            for _ in range(40)
        ]
        db = np.full((12, 1024), PAD_INDEX, dtype=np.int32)
        for k, s in enumerate(seqs):
            db[: len(s), k] = s
        got = np.asarray(
            sw_pallas_windows(
                profs, db[None], sc.gap_open_total, sc.gap_extend,
                nw=1, jb=4, ui=2, ic=24, pipe=6, pack=4, interpret=True,
            )
        )
        assert got.shape == (nq, 1024)
        for k in range(nq):
            want = np.asarray(
                sw_wavefront(profs[k], db, sc.gap_open_total, sc.gap_extend)
            )
            np.testing.assert_array_equal(got[k, :40], want[:40])

    @pytest.mark.slow
    def test_stream_multiquery(self, rng, blosum62):
        """Segmented stream + multi-query: both axes of batching at once."""
        from seqalign_tpu.pipeline import _db_from_encoded
        from seqalign_tpu.utils.packing import pack_streams

        sc = blosum62
        nq = 2
        profs = np.stack(
            [
                make_profile(sc.table, sc.query_indices(random_protein(rng, 9)))
                for _ in range(nq)
            ]
        )
        encoded = [
            encode(random_protein(rng, int(rng.integers(1, 14))))
            for _ in range(3000)
        ]
        dbe = _db_from_encoded(encoded)
        order = np.argsort(-dbe.lengths, kind="stable")
        pack = pack_streams(dbe, order, 2, win=1024, jb=4, grain=8)
        nslots = len(pack.slot_ids)
        out = np.asarray(
            sw_pallas_stream(
                profs,
                pack.streams,
                pack.fs,
                sc.gap_open_total,
                sc.gap_extend,
                nslots=nslots,
                nw=2,
                jb=4,
                ui=4,
                interpret=True,
            )
        )
        assert out.shape == (nslots, nq, 1024)
        lb = int(dbe.lengths.max())
        flat = np.full((lb, len(encoded)), PAD_INDEX, dtype=np.int32)
        for i, e in enumerate(encoded):
            flat[: len(e), i] = e
        for k in range(nq):
            scores = np.zeros(len(encoded), dtype=np.int32)
            for slot, ids in enumerate(pack.slot_ids):
                scores[ids] = out[slot, k][: len(ids)]
            want = np.asarray(
                sw_wavefront(profs[k], flat, sc.gap_open_total, sc.gap_extend)
            )
            np.testing.assert_array_equal(scores, want)

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "pack,upk,bound",
        [(2, "floor", 128), (4, "floor", 31)],
    )
    def test_packed_bound_boundary_exact(self, pack, upk, bound):
        """Packing is exact AT the advertised |P - go| bound, not just well
        inside it (random fuzz never reaches the edge; an off-by-one in the
        field scaling would silently corrupt production scores for
        wide-range matrices)."""
        from seqalign_tpu.ops.oracle import sw_score_single
        from seqalign_tpu.ops.swa_pallas import PACK_BOUNDS

        rng = np.random.default_rng(60_000 + pack * 10 + (upk == "round"))
        gap_open, ge = -2, -1
        go = gap_open + ge
        # Table entries span exactly [go - bound, go + bound]; pin the
        # extremes so some profile fields sit at +/-bound after bias.
        table = rng.integers(go - bound, go + bound + 1, (32, 32)).astype(
            np.int32
        )
        table[1, 1] = go + bound
        table[2, 2] = go - bound
        table[:, PAD_INDEX] = -1  # pad column nonpositive (score-invariant)
        table[PAD_INDEX, :] = -1
        lq = 8
        query = np.array([1, 2, 3, 4, 5, 1, 2, 6], dtype=np.int32)
        profile = table[query]
        assert np.max(np.abs(profile - go)) == bound
        if upk == "floor":
            assert bound <= PACK_BOUNDS[pack]
        n, lb = 24, 20
        db = rng.integers(1, 31, (lb, 1024)).astype(np.int32)
        # Force hits on the pinned extremes.
        db[:4, 0] = [1, 1, 2, 1]
        db[:4, 1] = [2, 2, 1, 2]
        got = np.asarray(
            sw_pallas_windows(
                profile, db[None], go, ge, nw=1, jb=4, ui=2,
                pipe=6, pack=pack, upk=upk, interpret=True,
            )
        )
        for k in range(n):
            want = sw_score_single(query, db[:, k], table, gap_open, ge)
            assert got[k] == want, (pack, upk, k, got[k], want)

    def test_choose_config_pack_gate_boundary(self):
        """choose_config admits packing at the exact bound and rejects just
        above it (the production exactness gate)."""
        from seqalign_tpu.ops.swa_pallas import PACK_BOUNDS, choose_config

        for lq in (17, 144):
            cfgs = {}
            for eps, key in ((0.0, "at"), (0.5, "above")):
                cfg = choose_config(lq, max_abs_bias=PACK_BOUNDS[4] + eps)
                cfgs[key] = cfg.pack if cfg else 1
            assert cfgs["above"] == 1, (lq, cfgs)
            # If this band adopts packing at all, the gate must admit it
            # at the exact bound.
            any_packed = choose_config(lq, max_abs_bias=1.0)
            if any_packed and any_packed.pack == 4:
                assert cfgs["at"] == 4, (lq, cfgs)

    def test_choose_config_round5_adoptions(self):
        """The round-5 hardware adoptions are what the tables select
        (docs/hw_r5/ab_lq256.log, abmq2/3.log, abmq144.log, abmq48.log,
        stripe_confirm2.log) — a table regression must fail loudly."""
        from seqalign_tpu.ops.swa_pallas import STRIPE_ROWS, choose_config

        # XXLONG lower band: 16-chain full-height pack4 through lq=384,
        # falling back to (1,8,16) where VMEM rejects it (448+).
        for lq in (256, 384):
            c = choose_config(lq, max_abs_bias=18.0)
            assert (c.nw, c.jb, c.ui, c.pack) == (2, 8, 16, 4), (lq, c)
            assert c.ic >= lq and c.pipe == 6
        c = choose_config(512, max_abs_bias=18.0)
        assert (c.nw, c.jb, c.pack) == (1, 8, 4), c
        # Row-stacked mq: 16-chain pack2 head at the reference's regime;
        # tall stacks prefer pack4.
        c = choose_config(17, nq=8, max_abs_bias=18.0)
        assert (c.nw, c.jb, c.pack) == (4, 4, 2), c
        for nq, lq in ((8, 48), (2, 144)):
            c = choose_config(lq, nq=nq, max_abs_bias=18.0)
            assert (c.nw, c.jb, c.pack) == (2, 4, 4), (nq, lq, c)
        # Deep stacks: fused pack2 with even max chunks — and NOT the old
        # pipe0 pick, which crashes the round-5 remote compiler.
        c = choose_config(17, nq=64, max_abs_bias=18.0)
        assert (c.nw, c.jb, c.ui, c.ic, c.pipe, c.pack) == (1, 4, 2, 288, 6, 2), c
        # Striped production: packed stripes at full stripe height.
        c = choose_config(STRIPE_ROWS, max_abs_bias=18.0, striped=True)
        assert (c.nw, c.jb, c.pipe, c.pack) == (2, 4, 6, 4), c

    def test_choose_config_upk_floor_only(self):
        """"floor" is the only extraction mode (round pruned, round 5):
        explicit floor and the default both work; a bias above the pack=2
        floor bound (128) refuses packed shapes."""
        from seqalign_tpu.ops.swa_pallas import (
            PACK_BOUNDS, PRODUCTION_UPK, choose_config,
        )

        assert PRODUCTION_UPK == "floor" and PACK_BOUNDS[2] == 128.0
        for lq in (17, 144, 512):
            cfg = choose_config(lq, max_abs_bias=18.0, upk="floor")
            assert cfg is not None and cfg.upk == "floor"
            dflt = choose_config(lq, max_abs_bias=18.0)
            assert dflt.upk == "floor"
        cfg_f = choose_config(144, max_abs_bias=200.0, upk="floor")
        assert cfg_f.pack == 1

    @pytest.mark.slow
    def test_striped_packed_production(self, rng, blosum62):
        """Striped kernel with fused+packed S production (pipe=6 pack=4):
        stripe boundaries and packed row groups compose exactly."""
        from seqalign_tpu.ops.swa_pallas import sw_pallas_stream_striped
        from seqalign_tpu.pipeline import _db_from_encoded
        from seqalign_tpu.utils.packing import pack_streams

        sc = blosum62
        q = sc.query_indices(random_protein(rng, 42))
        prof = make_profile(sc.table, q)
        encoded = [
            encode(random_protein(rng, int(rng.integers(1, 16))))
            for _ in range(900)
        ]
        db = _db_from_encoded(encoded)
        order = np.argsort(-db.lengths, kind="stable")
        pack = pack_streams(db, order, 2, win=1024, jb=4, grain=8)
        out = np.asarray(
            sw_pallas_stream_striped(
                prof, pack.streams, pack.fs,
                sc.gap_open_total, sc.gap_extend,
                nslots=len(pack.slot_ids), nw=2, jb=4, ui=4, ic=16,
                stripe_rows=16,  # 42 rows -> 3 stripes
                pipe=6, pack=4,
                interpret=True,
            )
        )
        scores = np.zeros(len(encoded), dtype=np.int32)
        for slot, ids in enumerate(pack.slot_ids):
            scores[ids] = out[slot][: len(ids)]
        lb = int(db.lengths.max())
        flat = np.full((lb, len(encoded)), PAD_INDEX, dtype=np.int32)
        for i, e in enumerate(encoded):
            flat[: len(e), i] = e
        want = np.asarray(
            sw_wavefront(prof, flat, sc.gap_open_total, sc.gap_extend)
        )
        np.testing.assert_array_equal(scores, want)

    @pytest.mark.slow
    def test_striped_long_query(self, rng, blosum62):
        """Row-striped stream kernel: 4 stripes, boundary chain through HBM."""
        from seqalign_tpu.ops.swa_pallas import sw_pallas_stream_striped
        from seqalign_tpu.pipeline import _db_from_encoded
        from seqalign_tpu.utils.packing import pack_streams

        sc = blosum62
        q = sc.query_indices(random_protein(rng, 50))
        prof = make_profile(sc.table, q)
        encoded = [
            encode(random_protein(rng, int(rng.integers(1, 30))))
            for _ in range(2500)
        ]
        db = _db_from_encoded(encoded)
        order = np.argsort(-db.lengths, kind="stable")
        pack = pack_streams(db, order, 2, win=1024, jb=4, grain=8)
        nslots = len(pack.slot_ids)
        out = np.asarray(
            sw_pallas_stream_striped(
                prof,
                pack.streams,
                pack.fs,
                sc.gap_open_total,
                sc.gap_extend,
                nslots=nslots,
                nw=2,
                jb=4,
                ui=4,
                stripe_rows=16,  # 50 rows -> 4 stripes
                interpret=True,
            )
        )
        scores = np.zeros(len(encoded), dtype=np.int32)
        for slot, ids in enumerate(pack.slot_ids):
            scores[ids] = out[slot][: len(ids)]
        lb = int(db.lengths.max())
        flat = np.full((lb, len(encoded)), PAD_INDEX, dtype=np.int32)
        for i, e in enumerate(encoded):
            flat[: len(e), i] = e
        want = np.asarray(
            sw_wavefront(prof, flat, sc.gap_open_total, sc.gap_extend)
        )
        np.testing.assert_array_equal(scores, want)

    def test_stream_segments_match_wavefront(self, rng, blosum62):
        """Segmented stream kernel: several segments per window, flush+reset."""
        from seqalign_tpu.pipeline import _db_from_encoded
        from seqalign_tpu.utils.packing import pack_streams

        sc = blosum62
        q = sc.query_indices(random_protein(rng, 11))
        prof = make_profile(sc.table, q)
        nw, win, jb, grain = 2, 1024, 4, 8
        n = 5000  # ~5 slots over 2 windows, uneven lengths
        encoded = [
            encode(random_protein(rng, int(rng.integers(1, 14))))
            for _ in range(n)
        ]
        db = _db_from_encoded(encoded)
        order = np.argsort(-db.lengths, kind="stable")
        pack = pack_streams(db, order, nw, win=win, jb=jb, grain=grain)
        nslots = len(pack.slot_ids)
        assert nslots >= 4  # exercises multiple flush+reset cycles
        out = np.asarray(
            sw_pallas_stream(
                prof,
                pack.streams,
                pack.fs,
                sc.gap_open_total,
                sc.gap_extend,
                nslots=nslots,
                nw=nw,
                jb=jb,
                ui=4,
                interpret=True,
            )
        )
        scores = np.zeros(n, dtype=np.int32)
        for slot, ids in enumerate(pack.slot_ids):
            scores[ids] = out[slot][: len(ids)]
        # Reference: wavefront engine on a single padded batch.
        lb = int(db.lengths.max())
        flat = np.full((lb, n), PAD_INDEX, dtype=np.int32)
        for i, e in enumerate(encoded):
            flat[: len(e), i] = e
        want = np.asarray(
            sw_wavefront(prof, flat, sc.gap_open_total, sc.gap_extend)
        )
        np.testing.assert_array_equal(scores, want)


class TestStreamBoundaryEdges:
    """Segment boundaries at the extremes of the grid."""

    def test_tiny_tail_segment_on_last_block(self, rng, blosum62):
        """A segment that STARTS at the final j-block: the start-flush and
        the end-flush both fire on the same grid step, different windows
        columns — the tightest flush interleaving the kernel supports."""
        from seqalign_tpu.pipeline import _db_from_encoded
        from seqalign_tpu.utils.packing import pack_streams

        sc = blosum62
        q = sc.query_indices(random_protein(rng, 8))
        prof = make_profile(sc.table, q)
        # One window; two slots: a long segment then a grain-sized tail.
        encoded = [encode(random_protein(rng, 32)) for _ in range(1024)]
        encoded += [encode(random_protein(rng, 3)) for _ in range(1024)]
        db = _db_from_encoded(encoded)
        order = np.arange(len(encoded))  # already longest-first
        pack = pack_streams(db, order, 1, win=1024, jb=4, grain=4)
        # The tail segment must start at the very last block for this test
        # to exercise what it claims; grain=4 == jb makes it 1 block long.
        starts = np.nonzero(pack.fs[:, 0, 0])[0]
        assert len(starts) == 1 and starts[0] == pack.fs.shape[0] - 1
        out = np.asarray(
            sw_pallas_stream(
                prof,
                pack.streams,
                pack.fs,
                sc.gap_open_total,
                sc.gap_extend,
                nslots=2,
                nw=1,
                jb=4,
                ui=4,
                interpret=True,
            )
        )
        scores = np.zeros(len(encoded), dtype=np.int32)
        for slot, ids in enumerate(pack.slot_ids):
            scores[ids] = out[slot][: len(ids)]
        lb = int(db.lengths.max())
        flat = np.full((lb, len(encoded)), PAD_INDEX, dtype=np.int32)
        for i, e in enumerate(encoded):
            flat[: len(e), i] = e
        want = np.asarray(
            sw_wavefront(prof, flat, sc.gap_open_total, sc.gap_extend)
        )
        np.testing.assert_array_equal(scores, want)
