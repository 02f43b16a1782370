"""Auxiliary modules: demux, assembly selection, histograms, simulator,
noise projection."""

import numpy as np

from megapath_nano_tpu.align.records import ALIGN_DTYPE, AlignList
from megapath_nano_tpu.io.demux import demux_reads, write_demuxed_fastq
from megapath_nano_tpu.report.histograms import write_histograms
from megapath_nano_tpu.sim.simulator import ErrorProfile, simulate_reads
from megapath_nano_tpu.taxon.abundance import AssemblyInfo
from megapath_nano_tpu.taxon.assembly_selection import (
    good_align_list, restrict_to_selected, select_assemblies_per_species)
from megapath_nano_tpu.taxon.noise_projection import project_noise
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def test_demux(tmp_path):
    groups = demux_reads(np.array([0, 1, 0, 2, 1, -1]))
    assert {k: v.tolist() for k, v in groups.items()} == {
        0: [0, 2], 1: [1, 4], 2: [3]}
    reads = [random_sequence(np.random.default_rng(i), 50) for i in range(6)]
    paths = write_demuxed_fastq(str(tmp_path), groups, reads,
                                group_names={0: "spA", 1: "spB", 2: "spC"})
    from megapath_nano_tpu.io.fastq import read_fastq

    b = read_fastq(paths[0])
    assert b.num_reads == 2
    assert np.array_equal(b.read(0), reads[0])


def _al(rows):
    d = np.zeros(len(rows), ALIGN_DTYPE)
    for i, (rid, sp, asm, score, sf, st) in enumerate(rows):
        d[i]["read_id"] = rid
        d[i]["read_length"] = 800
        d[i]["species_tax_id"] = sp
        d[i]["assembly_id"] = asm
        d[i]["alignment_score"] = score
        d[i]["sequence_id"] = asm
        d[i]["sequence_from"] = sf
        d[i]["sequence_to"] = st
        d[i]["match"] = (st - sf) * 9 // 10
    return AlignList(d, [], [], [])


def test_good_align_and_selection():
    # species 10 has assemblies 0 (deep coverage) and 1 (sparse)
    rows = []
    for r in range(20):
        rows.append((r, 10, 0, 1000, r * 400, r * 400 + 400))
        rows.append((r, 10, 1, 900, 0, 400))        # within 80% -> good
        rows.append((r, 10, 1, 100, 500, 900))      # junk -> filtered
    al = _al(rows)
    good = good_align_list(al)
    assert len(good) == 40
    info = AssemblyInfo.from_lengths([10000, 10000])
    info.species_tax_id[:] = 10
    sel = select_assemblies_per_species(al, info)
    assert sel == {10: 0}
    kept = restrict_to_selected(al, sel)
    assert (kept.data["assembly_id"] == 0).all()


def test_histograms(tmp_path):
    cats = {
        "microbe": {"lengths": np.array([100, 900, 4000]),
                    "quals": np.array([8.0, 12.0, 30.0])},
        "human": {"lengths": np.array([250]), "quals": np.array([20.0])},
    }
    paths = write_histograms(str(tmp_path), "x", cats)
    rl = open(paths["read_length"]).read()
    assert "microbe\t500\t1000\t1" in rl
    assert "human\t200\t500\t1" in rl
    qs = open(paths["quality_score"]).read()
    assert "microbe\t12\t13\t1" in qs


def test_simulator_properties():
    rng = np.random.default_rng(0)
    genome = random_sequence(rng, 50000)
    prof = ErrorProfile(sub_rate=0.02, ins_rate=0.01, del_rate=0.02)
    reads, truth = simulate_reads(genome, 50, prof, seed=1, max_length=3000)
    assert len(reads) == 50
    lens = np.array([len(r) for r in reads])
    assert (lens >= 150).all() and lens.max() <= 3300
    # reads should map back to their truth positions
    from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
    from megapath_nano_tpu.index.minimizer import MinimizerIndex

    idx = MinimizerIndex.build([genome])
    aligner = MinimizerAligner(idx, params=AlignParams(backend="jnp"))
    res = aligner.map_reads(reads)
    by_read = {}
    for row in res.data:
        r = int(row["read_id"])
        if r not in by_read or row["alignment_score"] > by_read[r]["alignment_score"]:
            by_read[r] = row
    ok = sum(1 for rid, (s, e, st) in enumerate(truth)
             if rid in by_read and abs(int(by_read[rid]["sequence_from"]) - s) < 200
             and int(by_read[rid]["strand"]) == st)
    assert ok >= 45

    # circular mode wraps the origin
    creads, ctruth = simulate_reads(genome[:5000], 20, prof, seed=2,
                                    circular=True, max_length=2000)
    assert any(e > 5000 for s, e, st in ctruth)


def test_noise_projection():
    rng = np.random.default_rng(1)
    shared = random_sequence(rng, 8000)
    src = [np.concatenate([shared, random_sequence(rng, 8000)])]
    sib_similar = [np.concatenate([shared, random_sequence(rng, 8000)])]
    sib_distant = [random_sequence(rng, 16000)]
    proj = project_noise(0, src, {1: sib_similar, 2: sib_distant},
                         n_reads=60, max_read_length=1500, seed=3)
    by_target = {p.target_assembly: p for p in proj}
    assert by_target[1].projected_noise_reads > 5 * max(
        by_target[2].projected_noise_reads, 1) or \
        by_target[2].projected_noise_reads == 0
    assert by_target[1].projected_noise_bp > 0
