"""Overlap-variant post-filter (Clair-ensemble step 4 parity).

The reference pipes the merged ensemble VCF through
clair/post_processing/overlap_variant.py (invoked at
bin/runClair-ensemble.sh:219-224): scanning position-sorted variants, a
variant whose DELETION span covers the start of the next variant (SNP or
deletion) conflicts with it, and only the higher-quality one survives
(ties keep the later call). SNV-only call sets pass through unchanged —
distinct positions never overlap without a deletion span.

Active reference semantics reproduced exactly:
  - deletion interval of v = [pos-1, pos + max(len(ref) - len(alt), 0))
    over all alternates (shortest alternate gives the longest deletion)
  - snp interval = [pos-1, pos) when any alternate has len == len(ref)
  - earlier.deletion overlaps later.snp/deletion iff
    del_begin <= other_begin < del_end
  - on conflict keep `earlier if earlier.qual > later.qual else later`
"""

from __future__ import annotations


def _max_deletion_length(ref: str, alts: list[str]) -> int:
    return len(ref) - min(len(a) for a in alts)


def _is_snp(ref: str, alts: list[str]) -> bool:
    return any(len(a) == len(ref) for a in alts)


def _conflicts(first, second) -> bool:
    """first precedes second (same chrom, pos1 <= pos2)."""
    chrom1, pos1, ref1, alts1 = first[:4]
    chrom2, pos2, ref2, alts2 = second[:4]
    if chrom1 != chrom2:
        return False
    dlen = _max_deletion_length(ref1, alts1)
    if dlen <= 0:
        return False
    del_begin, del_end = pos1 - 1, pos1 + dlen
    other_begin = pos2 - 1
    other_is_del = _max_deletion_length(ref2, alts2) > 0
    if not (_is_snp(ref2, alts2) or other_is_del):
        return False
    return del_begin <= other_begin < del_end


def filter_overlapping_records(records: list[tuple]) -> list[tuple]:
    """records: position-sorted (chrom, pos_1based, ref, [alts], quality,
    *extra) tuples (trailing elements pass through untouched). Returns the
    surviving subset in order (reference filter_variants_with: compare each
    variant with the LAST KEPT one; higher quality wins, ties keep the
    later). Qualities compare TRUNCATED to int — the reference's
    variant_from parses qual as int(float(qual)), so fractional differences
    do not break ties."""
    kept: list[tuple] = []
    for rec in records:
        if kept:
            last = kept[-1]
            a, b = (last, rec) if last[1] <= rec[1] else (rec, last)
            if _conflicts(a, b):
                if not (int(last[4]) > int(rec[4])):  # keep later on ties
                    kept.pop()
                    kept.append(rec)
                continue
        kept.append(rec)
    return kept


def filter_overlapping_calls(calls: list) -> list:
    """VariantCall-level wrapper: maps calls to records per sequence and
    returns the surviving calls (order preserved). Our caller emits
    single-base SNVs, so this is usually a no-op — it exists so any
    deletion-style calls (e.g. from realignment re-genotyping) get the
    reference's conflict resolution."""
    recs = []
    for i, c in enumerate(calls):
        ref = "ACGT"[c.ref_base] if isinstance(c.ref_base, int) \
            else str(c.ref_base)
        alts = str(c.alt).split(",")
        recs.append((c.sequence_id, c.position + 1, ref, alts,
                     float(c.quality), i))
    recs.sort(key=lambda r: (r[0], r[1], r[5]))
    # the original call index rides through as the records' 6th element
    keep_idx = {r[5] for r in filter_overlapping_records(recs)}
    return [c for i, c in enumerate(calls) if i in keep_idx]
