"""SAM / PAF output surface: syntactically valid, round-trip consistent."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.report.samout import write_paf, write_sam
from megapath_nano_tpu.utils.dna import decode, mutate, random_sequence, revcomp


def test_sam_paf_outputs(tmp_path):
    rng = np.random.default_rng(0)
    genome = random_sequence(rng, 20000)
    index = MinimizerIndex.build([genome], ["chr1"])
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    reads, names = [], []
    for i in range(20):
        s = int(rng.integers(0, 19000))
        r = mutate(rng, genome[s:s + 700], 0.03, 0.015, 0.015)
        if i % 2:
            r = revcomp(r)
        reads.append(r)
        names.append(f"read{i}")
    res = aligner.map_reads(reads, names)
    res.read_names = names

    sam_path = tmp_path / "out.sam"
    write_sam(str(sam_path), res, reads, index.seq_lengths)
    lines = open(sam_path).read().splitlines()
    assert lines[0].startswith("@HD")
    assert any(l.startswith("@SQ\tSN:chr1\tLN:20000") for l in lines)
    body = [l for l in lines if not l.startswith("@")]
    assert len(body) == len(res)
    for l in body:
        cols = l.split("\t")
        assert len(cols) >= 11
        flag = int(cols[1])
        assert flag in (0, 16)
        pos = int(cols[3])
        assert 1 <= pos <= 20000
        # CIGAR read-consuming ops must sum to SEQ length
        import re

        consumed = sum(int(n) for n, op in re.findall(r"(\d+)([MIS])",
                                                      cols[5]))
        assert consumed == len(cols[9]), (cols[5], len(cols[9]))
        # reconstruct aligned segment: M runs of SEQ vs reference mostly match
        qname = cols[0]
        rid = int(qname[4:])
        strand = flag == 16
        oriented = revcomp(reads[rid]) if strand else reads[rid]
        assert cols[9] == decode(oriented)

    paf_path = tmp_path / "out.paf"
    write_paf(str(paf_path), res)
    plines = open(paf_path).read().splitlines()
    assert len(plines) == len(res)
    for l in plines:
        cols = l.split("\t")
        assert len(cols) >= 12
        assert cols[4] in "+-"
        assert int(cols[2]) < int(cols[3]) <= int(cols[1])
        assert int(cols[7]) < int(cols[8]) <= int(cols[6])
        assert int(cols[9]) <= int(cols[10])
