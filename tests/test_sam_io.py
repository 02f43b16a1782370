"""SAM/BAM interop: write_sam/write_bam → read_sam/read_bam round trip,
and AlignList reconstruction from records.

The reference exchanges BAMs between stages (megapath_nano_amr.py
--query_bam; lib/aligner.py samtools view|sort); these tests pin our
readers/writers to that boundary format.
"""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.io.sam import (alignments_from_records, read_bam,
                                      read_sam, write_bam)
from megapath_nano_tpu.report.samout import write_sam
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


@pytest.fixture(scope="module")
def mapped():
    rng = np.random.default_rng(11)
    genomes = [random_sequence(rng, 20000) for _ in range(2)]
    index = MinimizerIndex.build(genomes, ["gA", "gB"])
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    reads = []
    for i in range(24):
        g = i % 2
        s = int(rng.integers(0, 19000))
        rd = mutate(rng, genomes[g][s: s + 800], 0.02, 0.01, 0.01)
        if i % 3 == 0:
            rd = revcomp(rd)
        reads.append(rd)
    al = aligner.map_reads(reads, [f"r{i}" for i in range(24)],
                           emit_cigars=True)
    return al, reads, index


def test_sam_round_trip(tmp_path, mapped):
    al, reads, index = mapped
    path = str(tmp_path / "out.sam")
    write_sam(path, al, reads, index.seq_lengths)
    refs, records = read_sam(path)
    assert refs == {"gA": 20000, "gB": 20000}
    assert len(records) == len(al.data)
    back, back_reads = alignments_from_records(refs, records)
    # original read recovered in original orientation
    name_to_rid = {n: i for i, n in enumerate(back.read_names)}
    for orig_rid, name in enumerate(al.read_names):
        np.testing.assert_array_equal(back_reads[name_to_rid[name]],
                                      reads[orig_rid])
    # per-record coordinate/score fields survive
    orig = {(al.read_names[int(r["read_id"])], int(r["sequence_id"])): r
            for r in al.data}
    for r in back.data:
        o = orig[(back.read_names[int(r["read_id"])],
                  int(r["sequence_id"]))]
        for f in ("read_from", "read_to", "strand", "sequence_from",
                  "sequence_to", "edit_dist", "alignment_score", "mapq"):
            assert r[f] == o[f], f
    assert back.cigar_map


def test_bam_round_trip(tmp_path, mapped):
    al, reads, index = mapped
    sam_path = str(tmp_path / "out.sam")
    bam_path = str(tmp_path / "out.bam")
    write_sam(sam_path, al, reads, index.seq_lengths)
    write_bam(bam_path, al, reads, index.seq_lengths)
    refs_s, recs_s = read_sam(sam_path)
    refs_b, recs_b = read_bam(bam_path)
    assert refs_b == refs_s
    assert len(recs_b) == len(recs_s)
    for a, b in zip(recs_s, recs_b):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert a.rname == b.rname
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        np.testing.assert_array_equal(a.seq, b.seq)
        assert a.tags.get("NM") == b.tags.get("NM")
        assert a.tags.get("AS") == b.tags.get("AS")


def test_bam_alignlist_feeds_amr_consensus(tmp_path, mapped):
    """A BAM file can seed the AMR consensus path (the reference's
    --query_bam contract, megapath_nano_amr.py:240-255)."""
    from megapath_nano_tpu.amr.consensus import pileup_counts

    al, reads, index = mapped
    bam_path = str(tmp_path / "q.bam")
    write_bam(bam_path, al, reads, index.seq_lengths)
    refs, records = read_bam(bam_path)
    back, back_reads = alignments_from_records(refs, records)
    counts = pileup_counts(back, back_reads, 0, 20000)
    assert counts.shape == (5, 20000)
    assert counts.sum() > 0


def test_sam_gz_and_unmapped(tmp_path):
    import gzip

    sam = ("@SQ\tSN:chr1\tLN:100\n"
           "u1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\t*\n"
           "m1\t0\tchr1\t11\t60\t2S3M1I2M\t*\t0\t0\tAACGTACG\tIIIIIIII"
           "\tNM:i:1\tAS:i:9\n")
    p = tmp_path / "t.sam.gz"
    with gzip.open(p, "wt") as f:
        f.write(sam)
    refs, records = read_sam(str(p))
    assert refs == {"chr1": 100}
    assert records[0].is_unmapped
    r = records[1]
    assert r.pos == 10 and r.cigar == [(2, "S"), (3, "M"), (1, "I"), (2, "M")]
    assert r.tags == {"NM": 1, "AS": 9}
    al, rds = alignments_from_records(refs, records)
    assert len(al.data) == 1
    row = al.data[0]
    assert row["sequence_from"] == 10 and row["sequence_to"] == 15
    assert row["read_from"] == 2 and row["read_to"] == 8
    assert al.cigar_map[(0, 0)] == ([(3, "M"), (1, "I"), (2, "M")], 2, 0)
