"""SAM output.

Host re-design of the reference FileWriter
(reference: libs/ma/inc/ma/module/fileWriter.h:366-470):

* @SQ headers from the pack's contigs, @PG line (fileWriter.h:394-399)
* per alignment: name, flag, contig, 1-based pos, MAPQ=ceil(f*254)
  (255 for NaN), CIGAR (M or =/X mode, soft/hard clips), SEQ strand-matched
  (reverse complement for reverse-strand alignments), QUAL
* unaligned output omitted (the reference emits no record for unaligned
  reads either)
"""
from __future__ import annotations

from typing import IO, Iterable, List

from ma_tpu.containers.alignment import Alignment
from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack

from ma_tpu import __version__


def sam_header(pack: Pack, cmd: str = "ma_tpu") -> str:
    lines = ["@HD\tVN:1.6\tSO:unknown"]
    for name, length in zip(pack.names, pack.lengths):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(length)}")
    lines.append(f"@PG\tID:ma_tpu\tPN:ma_tpu\tVN:{__version__}\tCL:{cmd}")
    return "\n".join(lines) + "\n"


def sam_record(
    aln: Alignment,
    query: NucSeq,
    pack: Pack,
    soft_clip: bool = False,
    use_m_cigar: bool = True,
) -> str:
    rev = bool(pack.is_reverse_strand(aln.begin_on_ref))
    flag = aln.sam_flag(pack)
    pos = aln.sam_position(pack)
    cig = aln.cigar(pack, len(query), soft_clip=soft_clip, use_m=use_m_cigar)
    if soft_clip:
        codes = query.codes
        qual = query.qual or "*"
    else:
        codes = query.codes[aln.begin_on_query : aln.end_on_query]
        qual = (
            query.qual[aln.begin_on_query : aln.end_on_query] if query.qual else "*"
        )
    if rev:
        codes = revcomp_codes(codes)
        if qual != "*":
            qual = qual[::-1]
    seq = decode_seq(codes) or "*"
    fields = [
        query.name or "*",
        str(flag),
        aln.contig(pack),
        str(pos),
        str(aln.sam_mapq()),
        cig,
        "*",  # RNEXT
        "0",  # PNEXT
        "0",  # TLEN
        seq,
        qual if qual else "*",
    ]
    return "\t".join(fields)


class SamWriter:
    """Streaming SAM writer (FileWriter's role, minus the thread mutex —
    the host pipeline is single-writer)."""

    def __init__(self, out: IO[str], pack: Pack, cmd: str = "ma_tpu",
                 soft_clip: bool = False, use_m_cigar: bool = True):
        self.out = out
        self.pack = pack
        self.soft_clip = soft_clip
        self.use_m = use_m_cigar
        out.write(sam_header(pack, cmd))

    def write(self, alignments: Iterable[Alignment], query: NucSeq) -> None:
        for aln in alignments:
            self.out.write(
                sam_record(aln, query, self.pack, self.soft_clip, self.use_m) + "\n"
            )
