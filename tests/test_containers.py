import numpy as np
import pytest

from ma_tpu.containers import NucSeq, Pack, ReadBatch, encode_seq, decode_seq, revcomp_codes


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode_seq(encode_seq(s)) == s
    assert list(encode_seq("ACGTN")) == [0, 1, 2, 3, 4]
    assert decode_seq(encode_seq("acgt")) == "ACGT"


def test_revcomp():
    assert decode_seq(revcomp_codes(encode_seq("AACGT"))) == "ACGTT"
    assert decode_seq(revcomp_codes(encode_seq("ANT"))) == "ANT"


def test_nucseq():
    r = NucSeq.from_str("ACGT", name="r1", qual="IIII")
    assert len(r) == 4
    assert str(r.revcomp()) == "ACGT"
    assert r.revcomp().qual == "IIII"
    r2 = NucSeq.from_str("AAAC")
    assert str(r2.revcomp()) == "GTTT"


def test_read_batch():
    reads = [NucSeq.from_str("ACGT", name="a"), NucSeq.from_str("ACGTACGTA", name="b")]
    rb = ReadBatch.from_reads(reads, padded_len=16, batch=4)
    assert rb.seqs.shape == (4, 16)
    assert list(rb.lens) == [4, 9, 0, 0]
    assert rb.seqs[0, 4] == 4  # N padding
    assert rb.names[:2] == ["a", "b"]


def test_bucketize():
    reads = [NucSeq.from_str("A" * n) for n in (10, 100, 130, 10, 300)]
    batches = list(ReadBatch.bucketize(reads, batch=2, min_len=128))
    shapes = sorted({(b.batch, b.padded_len) for b in batches})
    assert shapes == [(2, 128), (2, 256), (2, 512)]
    total = sum(int((b.lens > 0).sum()) for b in batches)
    assert total == 5


def _mk_pack():
    return Pack.from_contigs([("c1", "ACGTACGTAC"), ("c2", "TTTTGGGGCCAA")])


def test_pack_coordinates():
    p = _mk_pack()
    L = p.unpacked_size_forward_strand
    assert L == 22
    assert p.num_contigs == 2
    assert not p.is_reverse_strand(0)
    assert p.is_reverse_strand(L)
    # absolute position folding (pack.h:909-914)
    assert p.absolute_position(2 * L - 1) == 0
    assert p.absolute_position(L) == L - 1
    assert p.seq_id_for_position(0) == 0
    assert p.seq_id_for_position(10) == 1
    assert p.seq_id_for_position(2 * L - 1) == 0  # mirrors back to contig 0


def test_pack_extract_forward_and_reverse():
    p = _mk_pack()
    L = p.unpacked_size_forward_strand
    assert decode_seq(p.extract(0, 4)) == "ACGT"
    assert decode_seq(p.extract(10, 14)) == "TTTT"
    # reverse strand: extract of mirrored range == revcomp of forward range
    fwd = p.extract(0, 5)
    rev = p.extract(2 * L - 5, 2 * L)
    assert decode_seq(rev) == decode_seq(revcomp_codes(fwd))


def test_pack_bridging():
    p = _mk_pack()
    L = p.unpacked_size_forward_strand
    assert not p.bridging(0, 10)
    assert p.bridging(8, 12)  # crosses contig border
    assert p.bridging(L - 2, L + 2)  # crosses strand border
    assert not p.bridging(L, L + 5)


def test_pack_holes():
    p = Pack.from_contigs([("c1", "ACGTNNNNACGT")])
    assert p.holes == [(4, 8)]


def test_pack_store_load(tmp_path):
    p = _mk_pack()
    prefix = str(tmp_path / "genome")
    p.store(prefix)
    q = Pack.load(prefix)
    assert q.names == p.names
    assert np.array_equal(q.codes, p.codes)
    assert np.array_equal(q.starts, p.starts)


def test_compressed_nucseq_roundtrip():
    import numpy as np
    from ma_tpu.containers.nucseq import compress_codes, decompress_codes

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 1001).astype(np.uint8)
    codes[100:150] = 4
    codes[0] = 4
    codes[-3:] = 4
    packed, n, runs = compress_codes(codes)
    assert len(packed) == (1001 + 3) // 4  # 4x compression
    assert np.array_equal(decompress_codes(packed, n, runs), codes)
    # empty + all-N edge cases
    p, n0, r = compress_codes(np.zeros(0, np.uint8))
    assert np.array_equal(decompress_codes(p, n0, r), np.zeros(0, np.uint8))
    alln = np.full(10, 4, np.uint8)
    p, n1, r = compress_codes(alln)
    assert np.array_equal(decompress_codes(p, n1, r), alln)
