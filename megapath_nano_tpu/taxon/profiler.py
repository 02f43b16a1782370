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
from megapath_nano_tpu.taxon.assembly_selection import (
    run_assembly_selection, select_assemblies_per_species)
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
    assembly_selection: bool = False        # steps 4-6 (off, :4987)
    assembly_id_min_average_depth: float = 0.5   # (:5081)
    good_align_threshold: float = 0.8       # good_alignment_threshold (:5080)
    spike_filter: bool = False              # --spike_filter (off, :4989)
    spike_stdev: float = 6.0                # mean + k*sqrt(mean) (:5100)
    human_repetitive_filter: bool = False   # step 10 (off, :4990)
    microbe_repetitive_filter: bool = False  # step 12 (off, :4991)
    variable_region_adjustment: bool = False  # step 8 (off, :4988)
    similar_species_marker: bool = False    # step 21 (off)
    noise_projection: bool = False          # step 20 (off)
    noise_projection_reads: int = 1000
    amplicon_filter_module: bool = False    # exit after placement (:1279)
    closing_spike_filter: bool = False      # off (:4992)
    closing_spike_stdev: float = 9.0        # (:5109)
    short_alignment_filter: bool = False    # off
    min_alignment_length: int = 0           # (:5106)
    unique_alignment: bool = False          # off
    unique_as_ratio: float = 0.8            # best*0.8 > 2nd (:2561-2590)
    noise_overlap_fraction: float = 0.5     # drop if >50% in noise (:5103)
    min_aligned_bp_per_species: int = 0     # species floor (:1287)
    align: AlignParams = field(default_factory=AlignParams)
    # CIGAR emission for the species placement. The taxon math itself only
    # needs PAF-level fields (the device kernel provides them exactly);
    # base-level CIGARs are required by the AMR consensus, variant
    # candidates, and the .species.sam output — callers that use those must
    # leave this True (reference: minimap2 -a, lib/aligner.py:245-261).
    emit_cigars: bool = True
    # slice size for the two-thread host/device overlap (None = one slice)
    map_slice: int | None = 2048
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
    # noise bookkeeping (steps 22-25)
    noise_sources: dict = field(default_factory=dict)   # name -> bed
    n_noise_alignments: int = 0
    max_stat: np.ndarray | None = None      # step 25 upper-bound abundance
    similar_marks: dict = field(default_factory=dict)   # assembly -> bool
    noise_projections: list = field(default_factory=list)  # step 20 results
    # steps 4-7 products
    selected_assembly_list: dict = field(default_factory=dict)  # sp -> asm
    raw_stat: np.ndarray | None = None      # step 7 pre-noise stat table
    # name tables covering every assembly/sequence id in this result (equal
    # to the profiler db's unless assembly selection appended candidates)
    assembly_names: list = field(default_factory=list)
    sequence_names: list = field(default_factory=list)
    sequence_lengths: np.ndarray | None = None


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
                 decoy_db: RefDB | None = None, log: Log | None = None,
                 aligner=None, assembly_db: RefDB | None = None):
        self.db = db
        # assembly-ID genome set: extra candidate assemblies for steps 4-6
        # (reference config/assembly_id.genome_set); names disjoint from db's
        self.assembly_db = assembly_db
        self.options = options or ProfileOptions()
        # aligner override: pass a dist.sharded_aligner.ShardedAligner to
        # profile against an index partitioned across chips/hosts (output
        # parity with the single-index aligner is tested)
        self.aligner = aligner or MinimizerAligner(db.index, db.sequence_meta,
                                                   self.options.align)
        self.human_db = human_db
        self.decoy_db = decoy_db
        self.log = log or Log("taxon")

    def _map_filter_db(self, reads, refdb: RefDB):
        # filter passes consume scores only — never CIGARs
        aligner = MinimizerAligner(refdb.index, refdb.sequence_meta,
                                   self.options.align)
        return aligner.map_reads(reads, slice_size=self.options.map_slice,
                                 emit_cigars=False)

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
            align_list = self.aligner.map_reads(
                microbe_reads, read_names,
                slice_size=self.options.map_slice,
                emit_cigars=self.options.emit_cigars)
            if len(align_list) and microbe_ids != list(range(len(reads))):
                remap = np.array(microbe_ids, np.int64)
                align_list.data["read_id"] = remap[align_list.data["read_id"]]
                if align_list.cigar_map is not None:
                    align_list.cigar_map = {
                        (int(remap[k[0]]), *k[1:]): v
                        for k, v in align_list.cigar_map.items()}
        n_aligned = len(np.unique(align_list.data["read_id"])) \
            if len(align_list) else 0

        # step 3b: reassignment
        if opt.reassignment and len(align_list):
            with log.step("reassignment"):
                align_list = reassign(
                    align_list, ratio=opt.reassign_ratio,
                    error_rate=opt.reassign_error_rate,
                    as_threshold=opt.reassign_as_threshold).align_list

        # amplicon filter mode: stop after species placement — downstream
        # tooling consumes the raw alignments (megapath_nano.py:1279-1280)
        if opt.amplicon_filter_module:
            best = best_align_list(align_list, info, None)
            stat = align_stat_by_assembly(best, info, None)
            return ProfileResult(
                align_list=align_list, best=best, stat=stat, noise_bed=None,
                n_reads_in=len(reads), n_reads_aligned=n_aligned,
                human_read_ids=human_ids, decoy_read_ids=decoy_ids,
                human_best=human_best, decoy_best=decoy_best,
                assembly_names=list(self.db.assembly_names),
                sequence_names=list(self.db.index.seq_names),
                sequence_lengths=self.db.index.seq_lengths)

        # steps 4-6: assembly selection. Gate on: demux-per-species
        # re-alignment against the assembly-ID genome set + per-species
        # best-assembly choice (megapath_nano.py:1313-1538). Gate off: the
        # per-species best assembly comes from the species-set stats without
        # re-aligning (main:4285-4310); the align_list is unchanged.
        selected_assemblies: dict[int, int] = {}
        result_seq_names = list(self.db.index.seq_names)
        result_asm_names = list(self.db.assembly_names)
        result_seq_lens = self.db.index.seq_lengths
        if len(align_list):
            if opt.assembly_selection and self.assembly_db is not None:
                with log.step("assembly_selection"):
                    sp_best = best_align_list(align_list, info, None)
                    d = sp_best.data
                    sp_bp: dict[int, int] = {}
                    for s, f, t in zip(d["species_tax_id"],
                                       d["sequence_from"],
                                       d["sequence_to"]):
                        sp_bp[int(s)] = sp_bp.get(int(s), 0) + int(t - f)
                    selected_species = sorted(
                        s for s, bp in sp_bp.items()
                        if bp >= opt.min_aligned_bp_per_species)
                    asr = run_assembly_selection(
                        reads, align_list, self.db, self.assembly_db,
                        selected_species=selected_species,
                        min_average_depth=opt.assembly_id_min_average_depth,
                        good_ratio=opt.good_align_threshold,
                        align_params=opt.align, map_slice=opt.map_slice)
                    align_list = asr.align_list
                    info = asr.info
                    selected_assemblies = asr.assembly_list
                    result_seq_names = asr.sequence_names
                    result_asm_names = asr.assembly_names
                    result_seq_lens = np.concatenate(
                        [self.db.index.seq_lengths,
                         self.assembly_db.index.seq_lengths])
            else:
                # off branch computes the stat on the full placement list
                # (no good-alignment filter), main:4291-4310
                selected_assemblies = select_assemblies_per_species(
                    align_list, info, good_ratio=0.0)

        # step 7: raw stat — pre-noise best alignments that beat the read's
        # human/decoy score (megapath_nano.py:1546-1567)
        raw_stat_table = None
        if len(align_list):
            raw_best = best_align_list(align_list, info, None)
            if human_as or decoy_as:
                d = raw_best.data
                floor = np.array(
                    [max(human_as.get(int(r), 0), decoy_as.get(int(r), 0))
                     for r in d["read_id"]], np.int64)
                raw_best = raw_best.filter(d["alignment_score"] >= floor)
            raw_stat_table = align_stat_by_assembly(raw_best, info, None)

        # noise stack (steps 8-12): named noise sources accumulate
        noise_sources: dict[str, np.ndarray] = {}
        if opt.spike_filter and len(align_list):
            with log.step("spike_filter"):
                bed = spike_filter_bed(align_list, info,
                                       stdev=opt.spike_stdev)
                if len(bed):
                    noise_sources["spike"] = bed
        if opt.human_repetitive_filter and self.human_db is not None \
                and len(align_list):
            with log.step("human_repetitive_filter"):
                bed = self._human_repetitive_bed(align_list)
                if len(bed):
                    noise_sources["human_repetitive"] = bed
        if opt.microbe_repetitive_filter and len(align_list):
            with log.step("microbe_repetitive_filter"):
                bed = self._microbe_repetitive_bed(align_list, info)
                if len(bed):
                    noise_sources["microbe_repetitive"] = bed
        if opt.variable_region_adjustment and len(align_list):
            with log.step("variable_region"):
                bed = self._variable_region_bed(align_list, info)
                if len(bed):
                    noise_sources["variable_region"] = bed

        noise_bed = None
        if noise_sources:
            noise_bed = merge_bed(np.concatenate(list(
                noise_sources.values())))

        # step 13: noise removal (always; no-op without noise)
        n_noise_alignments = 0
        if noise_bed is not None and len(noise_bed) and len(align_list):
            q = make_bed(align_list.data["assembly_id"],
                         align_list.data["sequence_id"],
                         align_list.data["sequence_from"],
                         align_list.data["sequence_to"])
            ov = overlap_bp(q, noise_bed)
            span = (align_list.data["sequence_to"]
                    - align_list.data["sequence_from"])
            keep_mask = ov <= opt.noise_overlap_fraction * span
            n_noise_alignments = int((~keep_mask).sum())
            pre_noise_align = align_list
            align_list = align_list.filter(keep_mask)
        else:
            pre_noise_align = align_list

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
            # step 25: upper-bound abundance over best + noise alignments
            # (max_adjusted_abundance, megapath_nano.py:3183-3202)
            max_stat = None
            if noise_bed is not None and len(noise_bed):
                max_best = best_align_list(pre_noise_align, info, None)
                max_stat = align_stat_by_assembly(max_best, info, None)

        # step 21: similar-species marker (top genera's siblings)
        similar_marks: dict[int, bool] = {}
        if opt.similar_species_marker and len(stat):
            with log.step("similar_species_marker"):
                similar_marks = self._similar_species_marks(stat)

        # step 20: noise projection (simulate reads from top assemblies,
        # measure cross-mapping onto genus siblings)
        projections: list = []
        if opt.noise_projection and len(stat):
            with log.step("noise_projection"):
                projections = self._noise_projections(stat)

        return ProfileResult(
            align_list=align_list, best=best, stat=stat,
            noise_bed=noise_bed, n_reads_in=len(reads),
            n_reads_aligned=n_aligned,
            human_read_ids=human_ids, decoy_read_ids=decoy_ids,
            unique_read_ids=unique_ids,
            human_best=human_best, decoy_best=decoy_best,
            noise_sources=noise_sources,
            n_noise_alignments=n_noise_alignments,
            max_stat=max_stat, similar_marks=similar_marks,
            noise_projections=projections,
            selected_assembly_list=selected_assemblies,
            raw_stat=raw_stat_table,
            assembly_names=result_asm_names,
            sequence_names=result_seq_names,
            sequence_lengths=result_seq_lens)

    # -- genome-vs-genome helpers ----------------------------------------
    def _assembly_seqs(self, db: RefDB, assembly_id: int):
        idx = db.index
        sa = db.seq_assembly
        out = []
        for sid in np.flatnonzero(sa == assembly_id):
            s0 = int(idx.seq_offsets[sid])
            s1 = int(idx.seq_offsets[sid + 1])
            out.append(idx.seq_data[s0:s1])
        return out

    def _human_repetitive_bed(self, align_list: AlignList):
        """Step 10: align the human genome against the selected assemblies'
        index; covered regions become noise (megapath_nano.py:1809-1932)."""
        from megapath_nano_tpu.taxon.genome_filters import \
            human_repetitive_bed

        human_seqs = []
        hidx = self.human_db.index
        for sid in range(len(hidx.seq_names)):
            s0 = int(hidx.seq_offsets[sid])
            s1 = int(hidx.seq_offsets[sid + 1])
            human_seqs.append(hidx.seq_data[s0:s1])
        return human_repetitive_bed(
            human_seqs, self.db.index, self.db.seq_assembly,
            backend=self.options.align.backend)

    def _microbe_repetitive_bed(self, align_list: AlignList, info):
        """Step 12: abundance-ratio ladder between present assemblies
        (megapath_nano.py:1968-2246)."""
        from megapath_nano_tpu.index.minimizer import MinimizerIndex
        from megapath_nano_tpu.taxon.genome_filters import \
            microbe_repetitive_beds

        pre_stat = align_stat_by_assembly(align_list, info, None)
        abundances = {int(r["assembly_id"]): float(r["adjusted_total_aligned_bp"])
                      for r in pre_stat}
        # cap to the top assemblies to bound pairwise work
        top = sorted(abundances, key=lambda a: -abundances[a])[:8]
        abundances = {a: abundances[a] for a in top}
        assemblies = {a: self._assembly_seqs(self.db, a) for a in top}
        genus_of = {a: int(self.db.assembly_tax[a, 2]) for a in top}
        idx_of = {}
        sa_of = {}
        for a in top:
            seqs = assemblies[a]
            idx_of[a] = MinimizerIndex.build(
                seqs, [f"a{a}s{i}" for i in range(len(seqs))])
            sa_of[a] = np.full(len(seqs), a, np.int32)
        bed = microbe_repetitive_beds(
            assemblies, abundances, genus_of, idx_of, sa_of,
            backend=self.options.align.backend)
        if len(bed):
            # sequence ids in the per-assembly indexes are local; map back to
            # global sequence ids of the main db
            for a in top:
                local = bed["assembly_id"] == a
                if local.any():
                    global_ids = np.flatnonzero(self.db.seq_assembly == a)
                    bed["sequence_id"][local] = global_ids[
                        bed["sequence_id"][local]]
        return bed

    def _variable_region_bed(self, align_list: AlignList, info):
        """Step 8: within each species with multiple DB assemblies, regions
        of the most-aligned assembly not shared by >=50% of its sibling
        strains become noise (megapath_nano.py:1572-1758)."""
        from megapath_nano_tpu.index.minimizer import MinimizerIndex
        from megapath_nano_tpu.taxon.genome_filters import \
            variable_region_bed
        from megapath_nano_tpu.taxon.intervals import BED_DTYPE, merge_bed

        pre_stat = align_stat_by_assembly(align_list, info, None)
        beds = []
        species_seen = set()
        for row in pre_stat[np.argsort(
                -pre_stat["adjusted_total_aligned_bp"], kind="stable")]:
            sp = int(row["species_tax_id"])
            if sp in species_seen:
                continue
            species_seen.add(sp)
            chosen = int(row["assembly_id"])
            sibs = [a for a in range(len(self.db.assembly_names))
                    if int(self.db.assembly_tax[a, 1]) == sp]
            if len(sibs) < 2:
                continue
            strain_seqs = {a: self._assembly_seqs(self.db, a) for a in sibs}
            chosen_seqs = strain_seqs[chosen]
            tindex = MinimizerIndex.build(
                chosen_seqs, [f"c{i}" for i in range(len(chosen_seqs))])
            bed = variable_region_bed(
                strain_seqs, tindex, np.zeros(len(chosen_seqs), np.int32),
                chosen, backend=self.options.align.backend)
            if len(bed):
                # map local sequence ids back to global
                global_ids = np.flatnonzero(self.db.seq_assembly == chosen)
                bed["sequence_id"] = global_ids[bed["sequence_id"]]
                bed["assembly_id"] = chosen
                beds.append(bed)
        if not beds:
            return np.zeros(0, BED_DTYPE)
        return merge_bed(np.concatenate(beds))

    def _noise_projections(self, stat) -> list:
        """Step 20: simulate reads from the top genera's dominant assemblies
        and measure cross-mapping onto genus siblings
        (megapath_nano.py:2596-2749)."""
        from megapath_nano_tpu.taxon.noise_projection import project_noise

        opt = self.options
        order = np.argsort(-stat["adjusted_total_aligned_bp"], kind="stable")
        projections = []
        genera_done = set()
        for row in stat[order]:
            g = int(row["genus_tax_id"])
            if g in genera_done:
                continue
            genera_done.add(g)
            if len(genera_done) > 3:
                break
            src = int(row["assembly_id"])
            sibs = {a: self._assembly_seqs(self.db, a)
                    for a in range(len(self.db.assembly_names))
                    if int(self.db.assembly_tax[a, 2]) == g and a != src}
            if not sibs:
                continue
            # read length cap = 0.5 x the source's average read length
            # (megapath_nano.py:2675-2685)
            avg_len = float(row["average_read_length"]) or 1000.0
            projections.extend(project_noise(
                src, self._assembly_seqs(self.db, src), sibs,
                n_reads=opt.noise_projection_reads,
                max_read_length=max(int(avg_len * 0.5), 300),
                backend=opt.align.backend))
        return projections

    def _similar_species_marks(self, stat) -> dict[int, bool]:
        """Step 21: within each of the top genera, mark assemblies similar
        to the genus-dominant assembly (megapath_nano.py:2756-2943)."""
        from megapath_nano_tpu.index.minimizer import MinimizerIndex
        from megapath_nano_tpu.taxon.genome_filters import \
            similar_species_marker

        order = np.argsort(-stat["adjusted_total_aligned_bp"], kind="stable")
        top_genera = []
        for row in stat[order]:
            g = int(row["genus_tax_id"])
            if g not in top_genera:
                top_genera.append(g)
            if len(top_genera) >= 3:
                break
        marks: dict[int, bool] = {}
        for g in top_genera:
            rows = stat[stat["genus_tax_id"] == g]
            if len(rows) == 0:
                continue
            rows = rows[np.argsort(-rows["adjusted_total_aligned_bp"],
                                   kind="stable")]
            top_asm = int(rows[0]["assembly_id"])
            # siblings: every OTHER assembly of this genus in the database
            # (the reference aligns against the genus genome set, not just
            # assemblies with reads — megapath_nano.py:2818-2938)
            sibs = [a for a in range(len(self.db.assembly_names))
                    if int(self.db.assembly_tax[a, 2]) == g and a != top_asm]
            if not sibs:
                continue
            sib_seqs, sib_sa, sib_lens = [], [], {}
            for a in sibs:
                seqs = self._assembly_seqs(self.db, a)
                for s in seqs:
                    sib_seqs.append(s)
                    sib_sa.append(a)
                sib_lens[a] = int(sum(len(s) for s in seqs))
            if not sib_seqs:
                continue
            sib_index = MinimizerIndex.build(
                sib_seqs, [f"s{i}" for i in range(len(sib_seqs))])
            got = similar_species_marker(
                self._assembly_seqs(self.db, top_asm), sib_index,
                np.array(sib_sa, np.int32), sib_lens,
                backend=self.options.align.backend)
            marks.update(got)
        return marks

    def write_reports(self, result: ProfileResult, out_dir: str,
                      prefix: str = "out",
                      read_lengths: np.ndarray | None = None,
                      read_quals: np.ndarray | None = None,
                      reads: list | None = None) -> dict:
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
                           result.assembly_names)
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

        # step 7 raw (pre-noise) stat table (.raw_stat, ref :1546-1567)
        if result.raw_stat is not None:
            paths["raw_stat"] = os.path.join(out_dir, f"{prefix}.raw_stat")
            write_microbe_stat(paths["raw_stat"], result.raw_stat,
                               result.assembly_names)
        # steps 4-6 product: per-species chosen assembly (.genome_set-like)
        if result.selected_assembly_list:
            paths["assembly_selection"] = os.path.join(
                out_dir, f"{prefix}.assembly_selection")
            with open(paths["assembly_selection"], "w") as f:
                f.write("species_tax_id\tassembly\n")
                for sp, aid in sorted(result.selected_assembly_list.items()):
                    name = result.assembly_names[aid] \
                        if aid < len(result.assembly_names) else str(aid)
                    f.write(f"{sp}\t{name}\n")

        # noise statistics (steps 22-24, megapath_nano.py:2944-3175)
        if result.noise_sources:
            paths["noise_stat"] = os.path.join(out_dir,
                                               f"{prefix}.noise_stat")
            from megapath_nano_tpu.taxon.intervals import \
                covered_bp_by_assembly

            with open(paths["noise_stat"], "w") as f:
                f.write("source\tassembly_id\tnoise_span_bp\n")
                for source, bed in result.noise_sources.items():
                    for aid, bp in sorted(
                            covered_bp_by_assembly(bed).items()):
                        name = result.assembly_names[aid] \
                            if aid < len(result.assembly_names) else str(aid)
                        f.write(f"{source}\t{name}\t{bp}\n")
                f.write(f"#removed_alignments\t{result.n_noise_alignments}\n")
        if result.max_stat is not None:
            paths["max_microbe_stat"] = os.path.join(
                out_dir, f"{prefix}.max_microbe_stat")
            write_microbe_stat(paths["max_microbe_stat"], result.max_stat,
                               result.assembly_names)
        if result.noise_projections:
            paths["noise_projection"] = os.path.join(
                out_dir, f"{prefix}.noise_projection")
            with open(paths["noise_projection"], "w") as f:
                f.write("source_assembly\ttarget_assembly\tsimulated_reads"
                        "\tprojected_noise_reads\tprojected_noise_bp\n")
                for pr in result.noise_projections:
                    sn = result.assembly_names[pr.source_assembly]
                    tn = result.assembly_names[pr.target_assembly]
                    f.write(f"{sn}\t{tn}\t{pr.simulated_reads}"
                            f"\t{pr.projected_noise_reads}"
                            f"\t{pr.projected_noise_bp}\n")
        if result.similar_marks:
            paths["similar_species"] = os.path.join(
                out_dir, f"{prefix}.similar_species")
            with open(paths["similar_species"], "w") as f:
                f.write("assembly_id\tsimilar_to_genus_top\n")
                for aid, mark in sorted(result.similar_marks.items()):
                    name = result.assembly_names[aid] \
                        if aid < len(result.assembly_names) else str(aid)
                    f.write(f"{name}\t{int(bool(mark))}\n")

        # alignment record outputs (.species.sam/.paf, lib/aligner.py:245-261)
        if reads is not None and len(result.best):
            from megapath_nano_tpu.report.samout import write_paf, write_sam

            paths["species_paf"] = os.path.join(out_dir,
                                                f"{prefix}.species.paf")
            write_paf(paths["species_paf"], result.best)
            # SAM needs real CIGARs — only written when the run mapped with
            # emit_cigars (PAF-only runs skip it rather than emit fake Ms)
            if result.best.cigar_map is not None:
                paths["species_sam"] = os.path.join(out_dir,
                                                    f"{prefix}.species.sam")
                write_sam(paths["species_sam"], result.best, reads,
                          result.sequence_lengths if result.sequence_lengths is not None else self.db.index.seq_lengths)

        # per-category length/quality histograms (step 26 outputs)
        if read_lengths is not None:
            from megapath_nano_tpu.report.histograms import write_histograms

            micro_ids = (np.unique(result.best.data["read_id"])
                         if len(result.best) else np.zeros(0, np.int64))
            cats = {
                "all": {"lengths": read_lengths, "quals": read_quals},
                "microbe": {
                    "lengths": read_lengths[micro_ids.astype(np.int64)]
                    if len(micro_ids) else np.zeros(0),
                    "quals": (read_quals[micro_ids.astype(np.int64)]
                              if read_quals is not None and len(micro_ids)
                              else None),
                },
            }
            hp = write_histograms(out_dir, prefix, cats)
            paths.update(hp)

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
                    asm = result.assembly_names[int(row["assembly_id"])]
                    score = int(row["alignment_score"])
                else:
                    cat, asm, score = "unaligned", "-", 0
                f.write(f"{rid}\t{cat}\t{asm}\t{score}\n")
        return paths
