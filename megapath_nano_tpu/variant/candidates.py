"""Variant candidate extraction and input-tensor construction.

The Clair-ensemble preprocessing equivalents (reference:
bin/Clair-ensemble/Clair.beta.ensemble.cpu/preprocess/
ExtractVariantCandidates.py and CreateTensor.py): candidates are pileup
positions whose non-reference allele frequency passes the threshold
(AF >= 0.125 in the amplicon pipeline, runClair-ensemble.sh:44-47); each
candidate becomes a (2*flanking+1) x 8 x 4 summary tensor
(flankingBaseNum=16 → 33 positions; matrixRow=8; matrixNum=4 — shared/
param.py). Channel/row semantics here are redefined for this framework's
pileup (documented below) rather than byte-copied from Clair.

Tensor layout (positions x 8 rows x 4 channels):
  rows 0-3: base counts A/C/G/T from reads, normalized by depth cap
  row 4:    deletion count
  row 5:    reference one-hot
  row 6:    depth (broadcast)
  row 7:    non-ref fraction
  channels: [all reads, forward strand, reverse strand, near-candidate mask]
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from megapath_nano_tpu.align.records import AlignList
from megapath_nano_tpu.utils.dna import revcomp

FLANKING = 16
POSITIONS = 2 * FLANKING + 1   # 33
ROWS = 8
CHANNELS = 4
MATRIX_DEPTH_CAP = 100         # shared/param.py matrix_depth


@dataclass
class Candidate:
    sequence_id: int
    position: int               # 0-based
    ref_base: int
    depth: int
    alt_fraction: float
    # strand-resolved pileup around the position, (POSITIONS, 6, 2):
    # rows A/C/G/T/del/depth x [fwd, rev]
    context: np.ndarray


def stranded_pileup(
    align_list: AlignList,
    reads: list[np.ndarray],
    sequence_id: int,
    seq_len: int,
) -> np.ndarray:
    """(6, seq_len, 2) strand-resolved counts: A/C/G/T/del/total."""
    counts = np.zeros((6, seq_len, 2), np.int32)
    assert align_list.cigar_map is not None
    rows = align_list.data[align_list.data["sequence_id"] == sequence_id]
    for row in rows:
        key = (int(row["read_id"]), int(row["sequence_id"]))
        entry = align_list.cigar_map.get(key)
        if entry is None:
            continue
        cigar, oriented_from, strand = entry
        read = reads[int(row["read_id"])]
        oriented = revcomp(read) if strand else read
        qi = oriented_from
        ti = int(row["sequence_from"])
        s = int(strand)
        for length, op in cigar:
            if op == "M":
                seg = oriented[qi: qi + length]
                pos = np.arange(ti, ti + length)
                ok = (pos >= 0) & (pos < seq_len) & (seg < 4)
                np.add.at(counts, (seg[ok], pos[ok], s), 1)
                np.add.at(counts[5], (pos[(pos >= 0) & (pos < seq_len)], s), 1)
                qi += length
                ti += length
            elif op == "I":
                qi += length
            elif op == "D":
                pos = np.arange(ti, ti + length)
                ok = (pos >= 0) & (pos < seq_len)
                np.add.at(counts[4], (pos[ok], s), 1)
                np.add.at(counts[5], (pos[ok], s), 1)
                ti += length
    return counts


def extract_candidates(
    align_list: AlignList,
    reads: list[np.ndarray],
    sequence_id: int,
    ref_seq: np.ndarray,
    *,
    min_af: float = 0.125,
    min_depth: int = 4,
    min_alt_count: int = 2,
) -> list[Candidate]:
    seq_len = len(ref_seq)
    counts = stranded_pileup(align_list, reads, sequence_id, seq_len)
    total = counts[5].sum(axis=1)                   # (L,)
    base_tot = counts[:4].sum(axis=2)               # (4, L)
    del_tot = counts[4].sum(axis=1)
    ref_idx = np.clip(ref_seq, 0, 3)
    ref_support = base_tot[ref_idx, np.arange(seq_len)]
    alt_support = base_tot.sum(axis=0) + del_tot - ref_support
    with np.errstate(divide="ignore", invalid="ignore"):
        af = np.where(total > 0, alt_support / np.maximum(total, 1), 0.0)
    cand_pos = np.flatnonzero((total >= min_depth)
                              & (alt_support >= min_alt_count)
                              & (af >= min_af)
                              & (ref_seq < 4))
    out = []
    for p in cand_pos:
        lo = p - FLANKING
        hi = p + FLANKING + 1
        ctx = np.zeros((POSITIONS, 6, 2), np.int32)
        src_lo, src_hi = max(lo, 0), min(hi, seq_len)
        ctx[src_lo - lo: src_hi - lo] = np.transpose(
            counts[:, src_lo:src_hi], (1, 0, 2))
        out.append(Candidate(
            sequence_id=sequence_id, position=int(p),
            ref_base=int(ref_seq[p]), depth=int(total[p]),
            alt_fraction=float(af[p]), context=ctx))
    return out


def candidate_tensor(cand: Candidate, ref_seq: np.ndarray) -> np.ndarray:
    """(POSITIONS, ROWS, CHANNELS) float32 input tensor."""
    t = np.zeros((POSITIONS, ROWS, CHANNELS), np.float32)
    ctx = cand.context.astype(np.float32)           # (33, 6, 2)
    depth = np.maximum(ctx[:, 5, :].sum(axis=1), 1.0)
    cap = float(MATRIX_DEPTH_CAP)
    both = ctx.sum(axis=2)                          # (33, 6)
    for ch, sel in enumerate((both, ctx[:, :, 0], ctx[:, :, 1])):
        t[:, 0:4, ch] = np.minimum(sel[:, 0:4], cap) / cap
        t[:, 4, ch] = np.minimum(sel[:, 4], cap) / cap
        t[:, 6, ch] = np.minimum(sel[:, 5] if sel.shape[1] > 5
                                 else depth, cap) / cap
    # row 5: normalized reference base; row 7: non-ref fraction
    lo = cand.position - FLANKING
    for i in range(POSITIONS):
        rp = lo + i
        if 0 <= rp < len(ref_seq) and ref_seq[rp] < 4:
            t[i, 5, :] = float(ref_seq[rp] + 1) / 4.0
    ref_sup = np.array([
        both[i, np.clip(ref_seq[lo + i], 0, 3)]
        if 0 <= lo + i < len(ref_seq) else 0.0
        for i in range(POSITIONS)])
    tot = np.maximum(both[:, 5], 1.0)
    t[:, 7, 0] = 1.0 - np.minimum(ref_sup / tot, 1.0)
    # channel 3: center-position mask
    t[FLANKING, :, 3] = 1.0
    return t
