"""Per-species assembly selection (reference steps 4-6).

The reference demuxes reads per selected species and aligns each group
against that species' other assemblies, then keeps the assembly with the
highest adjusted_average_depth (reference: bin/megapath_nano.py:1313-1471
step_placement_to_assembly / step_assembly_selection; good_align_list =
alignments >= 80% of the read's best score, :642-663). Here species groups
come from the existing align_list and candidate assemblies are re-scored
with the same aligner.
"""

from __future__ import annotations

import numpy as np

from megapath_nano_tpu.align.records import AlignList
from megapath_nano_tpu.taxon.abundance import (AssemblyInfo,
                                               align_stat_by_assembly)


def good_align_list(align_list: AlignList,
                    ratio: float = 0.8) -> AlignList:
    """Alignments scoring >= ratio * the read's best score (:642-663)."""
    if len(align_list) == 0:
        return align_list
    d = align_list.data
    rids, inv = np.unique(d["read_id"], return_inverse=True)
    best = np.full(len(rids), -1, np.int64)
    np.maximum.at(best, inv, d["alignment_score"])
    return align_list.filter(d["alignment_score"] >= ratio * best[inv])


def select_assemblies_per_species(
    align_list: AlignList,
    info: AssemblyInfo,
    *,
    good_ratio: float = 0.8,
) -> dict[int, int]:
    """species_tax_id -> chosen assembly_id (max adjusted_average_depth over
    the good alignments; ties -> more reads, then lower id)."""
    good = good_align_list(align_list, good_ratio)
    if len(good) == 0:
        return {}
    stat = align_stat_by_assembly(good, info)
    chosen: dict[int, tuple] = {}
    for row in stat:
        sp = int(row["species_tax_id"])
        key = (float(row["adjusted_average_depth"]),
               int(row["total_number_of_read"]), -int(row["assembly_id"]))
        if sp not in chosen or key > chosen[sp][0]:
            chosen[sp] = (key, int(row["assembly_id"]))
    return {sp: asm for sp, (k, asm) in chosen.items()}


def restrict_to_selected(align_list: AlignList,
                         selected: dict[int, int]) -> AlignList:
    """Keep only alignments to each species' chosen assembly (the effect of
    the reference's species->assembly consolidation, main:4285-4310)."""
    if len(align_list) == 0 or not selected:
        return align_list
    d = align_list.data
    keep = np.array([
        selected.get(int(sp), int(asm)) == int(asm)
        for sp, asm in zip(d["species_tax_id"], d["assembly_id"])])
    return align_list.filter(keep)
