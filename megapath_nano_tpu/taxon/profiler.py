"""End-to-end taxonomic profiling pipeline.

The orchestrator tying the framework's stages into the reference's main
flow (reference: bin/megapath_nano.py:3890 main(); step table in SURVEY §2.5):

  read QC -> [human/decoy filter] -> placement (align vs RefDB)
  -> [reassignment] -> [spike filter] -> noise removal -> best alignment
  -> per-assembly stats -> species profile (.preport) + .microbe_stat

Optional steps mirror the reference's gate flags and defaults
(spike_filter off, reassignment off, human/decoy off — megapath_nano.py:
4982-5000)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.align.records import AlignList
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.report.writers import (write_microbe_stat,
                                              write_preport,
                                              write_read_stat)
from megapath_nano_tpu.taxon.abundance import align_stat_by_assembly
from megapath_nano_tpu.taxon.best_align import best_align_list
from megapath_nano_tpu.taxon.filters import spike_filter_bed
from megapath_nano_tpu.taxon.intervals import merge_bed, overlap_bp
from megapath_nano_tpu.taxon.reassign import reassign


@dataclass
class ProfileOptions:
    """Gate flags, defaults matching the reference's argparse defaults."""

    reassignment: bool = False              # --reassignment (off)
    spike_filter: bool = False              # --spike_filter (off)
    spike_stdev: float = 6.0                # expected_max_depth stdev (:5100)
    noise_overlap_fraction: float = 0.5     # drop if >50% in noise (:5103)
    min_aligned_bp_per_species: int = 0     # species presence floor (:1287)
    align: AlignParams = field(default_factory=AlignParams)
    reassign_ratio: float = 0.05
    reassign_error_rate: float = 0.05
    reassign_as_threshold: float = 0.0


@dataclass
class ProfileResult:
    align_list: AlignList           # all alignments post noise-removal
    best: AlignList                 # best alignment per read
    stat: np.ndarray                # per-assembly microbe_stat table
    noise_bed: np.ndarray | None
    n_reads_in: int
    n_reads_aligned: int


class TaxonProfiler:
    def __init__(self, db: RefDB, options: ProfileOptions | None = None):
        self.db = db
        self.options = options or ProfileOptions()
        self.aligner = MinimizerAligner(db.index, db.sequence_meta,
                                        self.options.align)

    def profile(self, reads: list[np.ndarray],
                read_names: list[str] | None = None) -> ProfileResult:
        opt = self.options
        info = self.db.assembly_info

        align_list = self.aligner.map_reads(reads, read_names)
        n_aligned = len(np.unique(align_list.data["read_id"])) \
            if len(align_list) else 0

        if opt.reassignment and len(align_list):
            align_list = reassign(
                align_list, ratio=opt.reassign_ratio,
                error_rate=opt.reassign_error_rate,
                as_threshold=opt.reassign_as_threshold).align_list

        noise_bed = None
        if opt.spike_filter and len(align_list):
            noise_bed = spike_filter_bed(align_list, info,
                                         stdev=opt.spike_stdev)

        if noise_bed is not None and len(noise_bed):
            # drop alignments mostly inside noise (step_noise_removal,
            # megapath_nano.py:2247-2272; >50% overlap threshold :5103)
            from megapath_nano_tpu.taxon.intervals import make_bed

            q = make_bed(align_list.data["assembly_id"],
                         align_list.data["sequence_id"],
                         align_list.data["sequence_from"],
                         align_list.data["sequence_to"])
            # make_bed drops empty intervals; build parallel arrays directly
            ov = overlap_bp(q, noise_bed)
            span = (align_list.data["sequence_to"]
                    - align_list.data["sequence_from"])
            keep = ov <= opt.noise_overlap_fraction * span
            align_list = align_list.filter(keep)

        best = best_align_list(align_list, info, noise_bed)
        stat = align_stat_by_assembly(best, info, noise_bed)

        return ProfileResult(
            align_list=align_list, best=best, stat=stat,
            noise_bed=noise_bed, n_reads_in=len(reads),
            n_reads_aligned=n_aligned)

    def write_reports(self, result: ProfileResult, out_dir: str,
                      prefix: str = "out") -> dict:
        os.makedirs(out_dir, exist_ok=True)
        paths = {
            "preport": os.path.join(out_dir, f"{prefix}.preport"),
            "microbe_stat": os.path.join(out_dir, f"{prefix}.microbe_stat"),
            "read_stat": os.path.join(out_dir, f"{prefix}.read_stat"),
        }
        write_preport(paths["preport"], result.stat, self.db.tax_names)
        write_microbe_stat(paths["microbe_stat"], result.stat,
                           self.db.assembly_names)
        best = result.best
        aligned_bp = int((best.data["read_to"] - best.data["read_from"]).sum()) \
            if len(best) else 0
        write_read_stat(paths["read_stat"], {
            "input": {"reads": result.n_reads_in, "bp": 0},
            "aligned": {"reads": result.n_reads_aligned, "bp": aligned_bp},
        })
        return paths
