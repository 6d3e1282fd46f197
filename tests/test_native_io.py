"""Native fastio (C++/ctypes) vs pure-Python reference behavior."""

import gzip

import numpy as np
import pytest

from seqalign_tpu.models import PAD_INDEX, encode
from seqalign_tpu.utils import native_io
from seqalign_tpu.utils.fasta import read_fasta

from conftest import random_protein

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native fastio not built"
)


@pytest.fixture
def fasta_file(tmp_path, rng):
    p = tmp_path / "db.fa"
    lines = []
    for k in range(23):
        lines.append(f">rec{k} some description {k}")
        seq = random_protein(rng, int(rng.integers(1, 90)))
        # split across lines to exercise multi-line records
        lines.append(seq[:30])
        if len(seq) > 30:
            lines.append(seq[30:])
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestNativeParse:
    def test_matches_python(self, fasta_file):
        ndb = native_io.parse_file(fasta_file)
        pdb = native_io._parse_file_python(fasta_file)
        assert ndb.n == pdb.n
        np.testing.assert_array_equal(ndb.offsets, pdb.offsets)
        np.testing.assert_array_equal(ndb.seq, pdb.seq)
        assert ndb.names == pdb.names

    def test_gzip(self, fasta_file, tmp_path):
        gz = tmp_path / "db.fa.gz"
        gz.write_bytes(gzip.compress(open(fasta_file, "rb").read()))
        a = native_io.parse_file(fasta_file)
        b = native_io.parse_file(str(gz))
        np.testing.assert_array_equal(a.seq, b.seq)
        assert a.names == b.names

    def test_fastq(self, tmp_path):
        p = tmp_path / "r.fq"
        p.write_text("@r1\nACGT\n+\n!!!!\n@r2\nGGCC\n+\n####\n")
        db = native_io.parse_file(str(p))
        assert db.n == 2
        np.testing.assert_array_equal(db.record(0), encode("ACGT"))
        np.testing.assert_array_equal(db.record(1), encode("GGCC"))
        assert db.names == ["r1", "r2"]

    def test_illegal_char(self, tmp_path):
        p = tmp_path / "bad.fa"
        p.write_text(">x\nAC-GT\n")
        from seqalign_tpu.models import AlphabetError

        with pytest.raises(AlphabetError):
            native_io.parse_file(str(p))

    def test_missing_file(self):
        with pytest.raises(OSError):
            native_io.parse_file("/nonexistent/x.fa")

    def test_names_match_python_reader(self, fasta_file):
        ndb = native_io.parse_file(fasta_file)
        recs = list(read_fasta(fasta_file))
        assert ndb.names == [r.name for r in recs]


class TestNativePack:
    def test_pack_matches_python(self, fasta_file, rng):
        db = native_io.parse_file(fasta_file)
        order = np.argsort(-db.lengths, kind="stable")[:8]
        lb_pad = int(db.lengths.max()) + 5
        got = native_io.pack_batch(db, order, lanes=8, lb_pad=lb_pad)
        # python fallback path
        import seqalign_tpu.utils.native_io as nio

        lib, nio._lib = nio._lib, None
        try:
            import unittest.mock as mock

            with mock.patch.object(nio, "_load", return_value=None):
                want = nio.pack_batch(db, order, lanes=8, lb_pad=lb_pad)
        finally:
            nio._lib = lib
        np.testing.assert_array_equal(got, want)
        assert (got[lb_pad - 1] == PAD_INDEX).all()
