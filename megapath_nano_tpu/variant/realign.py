"""Local realignment around candidate variants.

Reimplements the ONT local-realignment pass (reference:
bin/realignment/local_realignment.py:24-25 ±200 bp windows, :321-327
FastPassAligner SSW of each read's local sequence against ±300 bp of
reference with match 4 / mismatch 6 / gapO 8 / gapE 2
(fast_align_reads2ref.py:4-8), then recounting alt support from the new
CIGARs (:362-406) — the same libssw-parity core (cpp/mpn_ssw.cc) does the
alignment here, via the threaded banded batch API.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from megapath_nano_tpu.align.records import AlignList
from megapath_nano_tpu.native.banded import banded_align_batch
from megapath_nano_tpu.utils.dna import revcomp

READ_WINDOW = 200     # bases of read on each side of the candidate
REF_WINDOW = 300      # bases of reference on each side


@dataclass
class RealignedCounts:
    position: int
    depth: int
    base_counts: np.ndarray      # (5,) A/C/G/T/del support after realignment
    ref_support: int
    alt_support: int


def _read_offset_at(cigar, oriented_from, seq_from, target_pos):
    """Walk a CIGAR to find the oriented-read offset aligned at target_pos.
    Returns None if the position is not covered by this alignment."""
    qi, ti = oriented_from, seq_from
    for length, op in cigar:
        if op == "M":
            if ti <= target_pos < ti + length:
                return qi + (target_pos - ti)
            qi += length
            ti += length
        elif op == "I":
            qi += length
        elif op == "D":
            if ti <= target_pos < ti + length:
                return -(qi + 1)       # deleted at this read (flag negative)
            ti += length
    return None


def realign_candidates(
    align_list: AlignList,
    reads: list[np.ndarray],
    sequence_id: int,
    ref_seq: np.ndarray,
    positions: list[int],
    *,
    match: int = 4,
    mismatch: int = 6,
    gap_open: int = 8,
    gap_extend: int = 2,
) -> list[RealignedCounts]:
    """For each candidate position, realign overlapping reads' local windows
    and recount base support at the position."""
    assert align_list.cigar_map is not None
    rows = align_list.data[align_list.data["sequence_id"] == sequence_id]
    out = []
    for pos in positions:
        ref_lo = max(pos - REF_WINDOW, 0)
        ref_hi = min(pos + REF_WINDOW + 1, len(ref_seq))
        ref_win = ref_seq[ref_lo:ref_hi]
        local_reads = []
        for row in rows:
            if not (row["sequence_from"] <= pos < row["sequence_to"]):
                continue
            key = (int(row["read_id"]), int(row["sequence_id"]))
            entry = align_list.cigar_map.get(key)
            if entry is None:
                continue
            cigar, oriented_from, strand = entry
            read = reads[int(row["read_id"])]
            oriented = revcomp(read) if strand else read
            off = _read_offset_at(cigar, oriented_from,
                                  int(row["sequence_from"]), pos)
            if off is None:
                continue
            center = abs(off) - (1 if off < 0 else 0)
            lo = max(center - READ_WINDOW, 0)
            hi = min(center + READ_WINDOW + 1, len(oriented))
            local_reads.append(oriented[lo:hi])
        if not local_reads:
            out.append(RealignedCounts(pos, 0, np.zeros(5, np.int64), 0, 0))
            continue
        alns = banded_align_batch(
            local_reads, [ref_win] * len(local_reads), band=256,
            match=match, mismatch=mismatch, gap_open=gap_open,
            gap_extend=gap_extend)
        counts = np.zeros(5, np.int64)
        target_local = pos - ref_lo
        for lr, a in zip(local_reads, alns):
            if a.score <= 0:
                continue
            off = _read_offset_at(a.cigar, a.read_begin, a.ref_begin,
                                  target_local)
            if off is None:
                continue
            if off < 0:
                counts[4] += 1
            else:
                b = int(lr[off])
                if b < 4:
                    counts[b] += 1
        depth = int(counts.sum())
        ref_base = int(ref_seq[pos]) if ref_seq[pos] < 4 else -1
        ref_sup = int(counts[ref_base]) if 0 <= ref_base < 4 else 0
        out.append(RealignedCounts(pos, depth, counts, ref_sup,
                                   depth - ref_sup))
    return out
