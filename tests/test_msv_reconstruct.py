"""MSV genome reconstruction — the lossless-representation invariant
(reference: libs/msv/tests/genome_reconstruction.py: deletion, inversion,
insertion, translocation reconstructed from calls)."""
import numpy as np

from ma_tpu.containers.nucseq import decode_seq, encode_seq
from ma_tpu.containers.pack import Pack
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.reconstruct import (
    calls_to_seeds,
    reconstruct_from_seeds,
    reconstruct_sequenced_genome,
)


def ref_pack():
    pack = Pack.empty()
    pack.append("chr1", encode_seq("GATCGTATC"))
    pack.append("chr2", encode_seq("CTCGTCAACAG"))
    return pack


def test_reference_golden_example():
    """The reference's hand-crafted example: del + inv + ins + transloc
    (genome_reconstruction.py:8-56; expected string from :48)."""
    pack = ref_pack()
    a = SvCall(4, 7, 0, 0, True, True)  # deletion
    b = SvCall(9, 14, 0, 0, True, False)  # inversion (enter)
    c = SvCall(10, 15, 0, 0, False, True)  # inversion (exit)
    d = SvCall(16, 17, 0, 0, True, True,
               inserted_sequence=encode_seq("TGTT"))  # insertion
    e = SvCall(0, 19, 0, 0, True, True)  # translocation
    f = SvCall(1, 19, 0, 0, False, False, mirrored=True)  # traversed reversed
    g = SvCall(18, 20, 0, 0, True, True)

    # traversal paths (the reference stores this order in order_id columns)
    paths = [[e, f, a], [b, c, d, g]]
    recon = reconstruct_sequenced_genome(paths, pack)
    got = decode_seq(recon.codes[: recon.unpacked_size_forward_strand])
    assert got == "GGATCGTCCGACGAAATGTTCA"
    assert [int(l) for l in recon.lengths] == [8, 14]


def test_identity_reconstruction():
    """No calls inside a contig -> a single call spanning to the next contig
    reconstructs the original sequence."""
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 50).astype(np.uint8)
    pack = Pack.empty()
    pack.append("c1", codes)
    # call jumping from the last base to one-past-the-end = identity
    call = SvCall(49, 50, 0, 0, True, True)
    recon = reconstruct_sequenced_genome([[call]], pack)
    assert np.array_equal(
        recon.codes[: recon.unpacked_size_forward_strand][:50], codes
    )


def test_simple_deletion():
    # the contig remainder after the last call must be < half the contig
    # (reference sanity rule), so delete near the end
    codes = encode_seq("AAAAAAAAAAAACCCCGGGG")
    pack = Pack.empty()
    pack.append("c1", codes)
    # delete [12, 16): jump from 11 to 16
    call = SvCall(11, 16, 0, 0, True, True)
    recon = reconstruct_sequenced_genome([[call]], pack)
    got = decode_seq(recon.codes[: recon.unpacked_size_forward_strand])
    assert got == "AAAAAAAAAAAAGGGG"


def test_simple_insertion():
    codes = encode_seq("AAAAAAAACCCC")
    pack = Pack.empty()
    pack.append("c1", codes)
    call = SvCall(7, 8, 0, 0, True, True, inserted_sequence=encode_seq("GG"))
    recon = reconstruct_sequenced_genome([[call]], pack)
    got = decode_seq(recon.codes[: recon.unpacked_size_forward_strand])
    assert got == "AAAAAAAAGGCCCC"


def test_inversion_roundtrip():
    codes = encode_seq("AAAACGTGCCCC")
    pack = Pack.empty()
    pack.append("c1", codes)
    # invert [4, 8): enter at (3 -> 7 backward), exit at (4 backward -> 8)
    b = SvCall(3, 7, 0, 0, True, False)
    c = SvCall(4, 8, 0, 0, False, True)
    recon = reconstruct_sequenced_genome([[b, c]], pack)
    got = decode_seq(recon.codes[: recon.unpacked_size_forward_strand])
    # revcomp of CGTG = CACG
    assert got == "AAAACACGCCCC"
