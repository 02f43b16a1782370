"""megapath_nano_tpu — TPU-native long-read metagenomics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MegaPath-Nano
(HKU-BAL/MegaPath-Nano): ONT read QC, minimizer seed-chain-extend alignment
against RefSeq-scale references, affine-gap Smith-Waterman extension, global
read reassignment, noise-filtered abundance estimation / taxonomic reporting,
and consensus-based AMR detection — with the DP inner loops as Pallas kernels
and the reference index sharded over a TPU device mesh.

Layer map (mirrors SURVEY.md §7):
  io/       FASTQ/FASTA streaming + packing (native-backed)
  index/    minimizer index build + sharded device-resident format
  kernels/  Pallas: banded affine-gap SW, chaining DP
  align/    seed → chain → extend pipeline, align_list records
  dist/     device mesh, shard_map alignment, collective merges
  taxon/    best-alignment, abundance, interval algebra, noise filters,
            reassignment
  amr/      consensus building + AMR database scan + report merge
  report/   output writers (.preport, .microbe_stat, results.csv)
  db/       reference DB preparation (metadata, taxonomy)
  cli/      command-line drivers
  native/   ctypes bindings to cpp/libmpn_native.so
"""

__version__ = "0.1.0"
