from ma_tpu.io.fasta import read_fasta, read_fastq, read_reads
