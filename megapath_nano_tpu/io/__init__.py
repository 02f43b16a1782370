from megapath_nano_tpu.io.fastq import ReadBatch, read_fastq

__all__ = ["ReadBatch", "read_fastq"]
