"""End-to-end taxonomic profiling pipeline.

The orchestrator tying the framework's stages into the reference's main flow
(reference: bin/megapath_nano.py:3890 main(); full step table in SURVEY §2.5):

  step 1  read QC                       io.read_fastq (nanofastq semantics)
  step 2  human/decoy filter            [--human_filter/--decoy_filter, off]
  step 3  placement to species          MinimizerAligner vs RefDB
  step 3b reassignment                  [--reassignment, off]
  step 9  spike filter                  [--spike_filter, off]
  step 13 noise removal                 always (drop >50%-in-noise aligns)
  step 14 short alignment removal       [--short_alignment_filter, off]
  step 15 closing spike filter          [--closing_spike_filter, off]
  step 16 combine with human/decoy      always (microbe AS must beat both)
  step 17 best alignment                always (abundance-weighted ties)
  step 18 separate human/decoy          always (read categories)
  step 19 unique alignment              [--unique_alignment, off]
  step 26 read statistics               always
  step 27 format output                 report writers

Gate-flag defaults match the reference argparse defaults
(megapath_nano.py:4982-5023)."""

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
from megapath_nano_tpu.taxon.intervals import make_bed, merge_bed, overlap_bp
from megapath_nano_tpu.taxon.reassign import reassign
from megapath_nano_tpu.utils.log import Log


@dataclass
class ProfileOptions:
    """Gate flags; defaults match the reference's argparse defaults."""

    # QC (reference defaults: min quality 7.0, megapath_nano.py:5068)
    # (applied at read_fastq time by the CLI; profiler receives clean reads)

    # human/decoy filter (both off by default, :4985-4986)
    human_filter: bool = False
    decoy_filter: bool = False
    human_filter_score: int = 1000          # AS threshold (:5071)
    human_filter_score_percent: float = 1.0  # AS >= pct * read_len (:5073)

    reassignment: bool = False              # --reassignment (off, :5000)
    spike_filter: bool = False              # --spike_filter (off, :4989)
    spike_stdev: float = 6.0                # mean + k*sqrt(mean) (:5100)
    closing_spike_filter: bool = False      # off (:4992)
    closing_spike_stdev: float = 9.0        # (:5109)
    short_alignment_filter: bool = False    # off
    min_alignment_length: int = 0           # (:5106)
    unique_alignment: bool = False          # off
    unique_as_ratio: float = 0.8            # best*0.8 > 2nd (:2561-2590)
    noise_overlap_fraction: float = 0.5     # drop if >50% in noise (:5103)
    min_aligned_bp_per_species: int = 0     # species floor (:1287)
    align: AlignParams = field(default_factory=AlignParams)
    reassign_ratio: float = 0.05
    reassign_error_rate: float = 0.05
    reassign_as_threshold: float = 0.0


@dataclass
class ProfileResult:
    align_list: AlignList           # microbe alignments post noise-removal
    best: AlignList                 # best microbe alignment per read
    stat: np.ndarray                # per-assembly microbe_stat table
    noise_bed: np.ndarray | None
    n_reads_in: int
    n_reads_aligned: int
    # read categorization (step 18 separate; step 26 read_statistics)
    human_read_ids: np.ndarray = None
    decoy_read_ids: np.ndarray = None
    unique_read_ids: np.ndarray = None      # step 19 (if enabled)
    human_best: AlignList | None = None
    decoy_best: AlignList | None = None


def _best_as_per_read(align_list: AlignList) -> dict[int, int]:
    out: dict[int, int] = {}
    for rid, score in zip(align_list.data["read_id"],
                          align_list.data["alignment_score"]):
        r = int(rid)
        if score > out.get(r, -1):
            out[r] = int(score)
    return out


class TaxonProfiler:
    def __init__(self, db: RefDB, options: ProfileOptions | None = None,
                 human_db: RefDB | None = None,
                 decoy_db: RefDB | None = None, log: Log | None = None):
        self.db = db
        self.options = options or ProfileOptions()
        self.aligner = MinimizerAligner(db.index, db.sequence_meta,
                                        self.options.align)
        self.human_db = human_db
        self.decoy_db = decoy_db
        self.log = log or Log("taxon")

    def _map_filter_db(self, reads, refdb: RefDB):
        aligner = MinimizerAligner(refdb.index, refdb.sequence_meta,
                                   self.options.align)
        return aligner.map_reads(reads)

    def profile(self, reads: list[np.ndarray],
                read_names: list[str] | None = None) -> ProfileResult:
        opt = self.options
        info = self.db.assembly_info
        log = self.log

        # step 2: human/decoy filter — flag reads, keep their best AS for
        # the later combine step (megapath_nano.py:1091-1233, 2425-2441)
        human_best = decoy_best = None
        human_as: dict[int, int] = {}
        decoy_as: dict[int, int] = {}
        human_ids = np.zeros(0, np.int64)
        decoy_ids = np.zeros(0, np.int64)
        if opt.human_filter and self.human_db is not None:
            with log.step("human_filter"):
                h_aligns = self._map_filter_db(reads, self.human_db)
                human_best = best_align_list(h_aligns,
                                             self.human_db.assembly_info)
                d = human_best.data
                is_h = (d["alignment_score"] >= opt.human_filter_score) | (
                    d["alignment_score"] >= opt.human_filter_score_percent
                    * d["read_length"])
                human_ids = d["read_id"][is_h]
                human_as = _best_as_per_read(human_best.filter(is_h))
        if opt.decoy_filter and self.decoy_db is not None:
            with log.step("decoy_filter"):
                rest = [r for i, r in enumerate(reads)
                        if i not in set(human_ids.tolist())]
                rest_ids = [i for i in range(len(reads))
                            if i not in set(human_ids.tolist())]
                d_aligns = self._map_filter_db(rest, self.decoy_db)
                # remap read ids back to global
                d_aligns.data["read_id"] = np.array(rest_ids, np.int64)[
                    d_aligns.data["read_id"]]
                decoy_best = best_align_list(d_aligns,
                                             self.decoy_db.assembly_info)
                d = decoy_best.data
                is_d = (d["alignment_score"] >= opt.human_filter_score) | (
                    d["alignment_score"] >= opt.human_filter_score_percent
                    * d["read_length"])
                decoy_ids = d["read_id"][is_d]
                decoy_as = _best_as_per_read(decoy_best.filter(is_d))

        excluded = set(human_ids.tolist()) | set(decoy_ids.tolist())
        microbe_reads = [r for i, r in enumerate(reads) if i not in excluded]
        microbe_ids = [i for i in range(len(reads)) if i not in excluded]

        # step 3: placement to species
        with log.step("placement_to_species"):
            align_list = self.aligner.map_reads(microbe_reads, read_names)
            if len(align_list) and microbe_ids != list(range(len(reads))):
                remap = np.array(microbe_ids, np.int64)
                align_list.data["read_id"] = remap[align_list.data["read_id"]]
                if align_list.cigar_map is not None:
                    align_list.cigar_map = {
                        (int(remap[r]), s): v
                        for (r, s), v in align_list.cigar_map.items()}
        n_aligned = len(np.unique(align_list.data["read_id"])) \
            if len(align_list) else 0

        # step 3b: reassignment
        if opt.reassignment and len(align_list):
            with log.step("reassignment"):
                align_list = reassign(
                    align_list, ratio=opt.reassign_ratio,
                    error_rate=opt.reassign_error_rate,
                    as_threshold=opt.reassign_as_threshold).align_list

        # step 9: spike filter -> noise bed
        noise_bed = None
        if opt.spike_filter and len(align_list):
            with log.step("spike_filter"):
                noise_bed = spike_filter_bed(align_list, info,
                                             stdev=opt.spike_stdev)

        # step 13: noise removal (always; no-op without noise)
        if noise_bed is not None and len(noise_bed) and len(align_list):
            q = make_bed(align_list.data["assembly_id"],
                         align_list.data["sequence_id"],
                         align_list.data["sequence_from"],
                         align_list.data["sequence_to"])
            ov = overlap_bp(q, noise_bed)
            span = (align_list.data["sequence_to"]
                    - align_list.data["sequence_from"])
            align_list = align_list.filter(
                ov <= opt.noise_overlap_fraction * span)

        # step 14: short alignment removal
        if opt.short_alignment_filter and len(align_list):
            span = (align_list.data["sequence_to"]
                    - align_list.data["sequence_from"])
            align_list = align_list.filter(span >= opt.min_alignment_length)

        # step 16: combine with human/decoy — microbe alignments must beat
        # the read's human/decoy score (megapath_nano.py:2432-2441)
        if (human_as or decoy_as) and len(align_list):
            d = align_list.data
            floor = np.zeros(len(d), np.int64)
            for i, rid in enumerate(d["read_id"]):
                r = int(rid)
                floor[i] = max(human_as.get(r, 0), decoy_as.get(r, 0))
            align_list = align_list.filter(d["alignment_score"] >= floor)

        # step 15: closing spike filter — removes whole READS whose best
        # alignment sits in late-detected spikes (megapath_nano.py:2391-2406)
        if opt.closing_spike_filter and len(align_list):
            with log.step("closing_spike_filter"):
                spike2 = spike_filter_bed(align_list, info,
                                          stdev=opt.closing_spike_stdev)
                if len(spike2):
                    pre_best = best_align_list(align_list, info, None)
                    q = make_bed(pre_best.data["assembly_id"],
                                 pre_best.data["sequence_id"],
                                 pre_best.data["sequence_from"],
                                 pre_best.data["sequence_to"])
                    ov = overlap_bp(q, spike2)
                    span = (pre_best.data["sequence_to"]
                            - pre_best.data["sequence_from"])
                    bad_reads = set(
                        pre_best.data["read_id"][
                            ov > opt.noise_overlap_fraction * span].tolist())
                    if bad_reads:
                        keep = np.array([int(r) not in bad_reads
                                         for r in align_list.data["read_id"]])
                        align_list = align_list.filter(keep)

        # step 17: best alignment (abundance-weighted tie-break)
        with log.step("best_alignment"):
            best = best_align_list(align_list, info, noise_bed)

        # step 19: unique alignment (optional)
        unique_ids = None
        if opt.unique_alignment and len(best):
            uniq = []
            as_by_read: dict[int, list] = {}
            for row in align_list.data:
                as_by_read.setdefault(int(row["read_id"]), []).append(
                    (int(row["alignment_score"]), int(row["assembly_id"])))
            for row in best.data:
                rid = int(row["read_id"])
                best_as = int(row["alignment_score"])
                others = [s for s, a in as_by_read.get(rid, [])
                          if a != int(row["assembly_id"])]
                others.append(human_as.get(rid, 0))
                others.append(decoy_as.get(rid, 0))
                second = max(others) if others else 0
                if best_as * opt.unique_as_ratio > second:
                    uniq.append(rid)
            unique_ids = np.array(uniq, np.int64)

        with log.step("statistics"):
            stat = align_stat_by_assembly(best, info, noise_bed)

        return ProfileResult(
            align_list=align_list, best=best, stat=stat,
            noise_bed=noise_bed, n_reads_in=len(reads),
            n_reads_aligned=n_aligned,
            human_read_ids=human_ids, decoy_read_ids=decoy_ids,
            unique_read_ids=unique_ids,
            human_best=human_best, decoy_best=decoy_best)

    def write_reports(self, result: ProfileResult, out_dir: str,
                      prefix: str = "out",
                      read_lengths: np.ndarray | None = None,
                      read_quals: np.ndarray | None = None) -> dict:
        """Output surface (step 27, megapath_nano.py:3275-3888)."""
        os.makedirs(out_dir, exist_ok=True)
        paths = {
            "preport": os.path.join(out_dir, f"{prefix}.preport"),
            "microbe_stat": os.path.join(out_dir, f"{prefix}.microbe_stat"),
            "read_stat": os.path.join(out_dir, f"{prefix}.read_stat"),
            "read_list": os.path.join(out_dir, f"{prefix}.read_list"),
        }
        write_preport(paths["preport"], result.stat, self.db.tax_names)
        write_microbe_stat(paths["microbe_stat"], result.stat,
                           self.db.assembly_names)
        best = result.best
        aligned_bp = int((best.data["read_to"] - best.data["read_from"]).sum()) \
            if len(best) else 0
        human_set = set(result.human_read_ids.tolist()
                        if result.human_read_ids is not None else [])
        decoy_set = set(result.decoy_read_ids.tolist()
                        if result.decoy_read_ids is not None else [])
        categories = {
            "input": {"reads": result.n_reads_in,
                      "bp": int(read_lengths.sum()) if read_lengths is not None
                      else 0},
            "human": {"reads": len(human_set), "bp": 0},
            "decoy": {"reads": len(decoy_set), "bp": 0},
            "microbe_aligned": {"reads": len(best), "bp": aligned_bp},
        }
        if result.unique_read_ids is not None:
            categories["unique"] = {"reads": len(result.unique_read_ids),
                                    "bp": 0}
        write_read_stat(paths["read_stat"], categories)

        # per-read list with category flags (read_list, ref :2472-2548)
        with open(paths["read_list"], "w") as f:
            f.write("read_id\tcategory\tassembly_id\talignment_score\n")
            assigned = {int(r["read_id"]): r for r in best.data}
            for rid in range(result.n_reads_in):
                if rid in human_set:
                    cat, asm, score = "human", "-", 0
                elif rid in decoy_set:
                    cat, asm, score = "decoy", "-", 0
                elif rid in assigned:
                    row = assigned[rid]
                    cat = "microbe"
                    asm = self.db.assembly_names[int(row["assembly_id"])]
                    score = int(row["alignment_score"])
                else:
                    cat, asm, score = "unaligned", "-", 0
                f.write(f"{rid}\t{cat}\t{asm}\t{score}\n")
        return paths
