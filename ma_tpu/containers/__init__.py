from ma_tpu.containers.nucseq import NucSeq, ReadBatch, encode_seq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
