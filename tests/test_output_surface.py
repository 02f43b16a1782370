"""Step-27 output surface: file presence + column schemas
(reference megapath_nano.py:3275-3888)."""

import os
import tarfile

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    rng = np.random.default_rng(31)
    g0 = random_sequence(rng, 15000)
    g1 = random_sequence(rng, 15000)
    human = random_sequence(rng, 15000)
    db = RefDB.build([g0, g1], ["sA", "sB"], [0, 1], ["asmA", "asmB"],
                     [(11, 901, 90), (12, 902, 90)],
                     tax_names={901: "Escherichia coli",
                                902: "Klebsiella pneumoniae"})
    hdb = RefDB.build([human], ["chrH"], [0], ["GRCh38"], [(9606, 9606, 9605)])
    reads, srcs = [], []
    for i in range(30):
        g = [g0, g1][i % 2]
        s = int(rng.integers(0, 13000))
        reads.append(mutate(rng, g[s:s + 1200], sub_rate=0.03,
                            ins_rate=0.015, del_rate=0.015))
        srcs.append(i % 2)
    for i in range(5):   # human reads
        s = int(rng.integers(0, 13000))
        reads.append(human[s:s + 1200].copy())
    prof = TaxonProfiler(
        db,
        ProfileOptions(emit_cigars=False, human_filter=True,
                       spike_filter=True, unique_alignment=True,
                       align=AlignParams(backend="jnp")),
        human_db=hdb)
    res = prof.profile(reads)
    out = tmp_path_factory.mktemp("reports")
    lengths = np.array([len(r) for r in reads], np.int64)
    quals = np.full(len(reads), 20.0)
    paths = prof.write_reports(res, str(out), prefix="demo",
                               read_lengths=lengths, read_quals=quals,
                               reads=reads)
    return res, paths, str(out)


def test_core_files_present(run):
    res, paths, out = run
    for key in ["preport", "microbe_stat", "read_stat", "genome_set",
                "id_stat", "raw_stat", "human_stat",
                "microbe_stat_by_sequence_id", "read_count_by_name",
                "bam_filter", "bam_filter_good", "per_read_archive",
                "species_paf", "read_length_archive",
                "quality_score_archive"]:
        assert key in paths, key
        assert os.path.exists(paths[key]), paths[key]


def test_read_stat_schema(run):
    res, paths, _ = run
    header, vals = open(paths["read_stat"]).read().strip().split("\n")
    cols = header.split("\t")
    assert cols == [
        "total_number_of_read", "passed_filter", "aligned", "human_read",
        "decoy_read", "microbe_read", "unaligned", "total_read_bp",
        "total_passed_filter_read_bp", "total_aligned_read_bp",
        "total_human_read_bp", "total_decoy_read_bp",
        "total_microbe_read_bp", "total_unaligned_read_bp"]
    v = dict(zip(cols, (int(x) for x in vals.split("\t"))))
    assert v["total_number_of_read"] == 35
    assert v["human_read"] == 5
    assert v["microbe_read"] >= 25
    assert v["total_read_bp"] > 0


def test_microbe_stat_has_pre_noise_and_marker_cols(run):
    res, paths, _ = run
    header = open(paths["microbe_stat"]).readline().strip().split("\t")
    assert "pre_total_aligned_bp" in header
    assert "pre_covered_percent" in header
    assert "is_similar" in header
    assert "adjusted_total_aligned_bp" in header


def test_per_read_archive_contents(run):
    res, paths, _ = run
    with tarfile.open(paths["per_read_archive"]) as tf:
        names = {os.path.basename(n) for n in tf.getnames() if n != "."}
        assert {"demo.read_list", "demo.microbe_list", "demo.list",
                "demo.human_list", "demo.raw_list",
                "demo.noise_list"} <= names
        rl = tf.extractfile([n for n in tf.getnames()
                             if n.endswith("read_list")][0]).read().decode()
    lines = rl.strip().split("\n")
    assert lines[0].split("\t") == ["read_id", "read_length",
                                    "passed_filter", "aligned", "human_read",
                                    "decoy_read", "microbe_read"]
    assert len(lines) == 36   # header + 35 reads


def test_align_list_tsv_schema(run):
    res, paths, _ = run
    header = open(paths["bam_filter"]).readline().strip().split("\t")
    assert header == ["read_id", "read_length", "read_from", "read_to",
                      "strand", "sequence_id", "sequence_length",
                      "sequence_from", "sequence_to", "match", "mapq",
                      "edit_dist", "alignment_score", "assembly_id",
                      "tax_id", "species_tax_id", "genus_tax_id",
                      "alignment_score_tiebreaker"]
    row = open(paths["bam_filter"]).readlines()[1].split("\t")
    assert row[4] in "+-"
    assert row[13] in ("asmA", "asmB")


def test_noise_archive_and_source_attribution(run):
    res, paths, _ = run
    if "noise_archive" not in paths:
        pytest.skip("no noise detected in this world")
    with tarfile.open(paths["noise_archive"]) as tf:
        names = {os.path.basename(n) for n in tf.getnames()}
        assert "demo.noise_stat" in names
        assert "demo.noise_source_stat" in names
        ns = tf.extractfile([n for n in tf.getnames()
                             if n.endswith("noise_stat")][0]).read().decode()
    header = ns.split("\n")[0].split("\t")
    assert "spike_read_count" in header and "all_aligned_bp" in header


def test_unique_and_preport(run):
    res, paths, _ = run
    assert res.unique_read_ids is not None
    if res.unique_stat is not None:
        assert "unique_stat" in paths
    pre = open(paths["preport"]).read()
    assert "Escherichia coli" in pre or "Klebsiella" in pre


def test_read_count_by_name(run):
    res, paths, _ = run
    lines = open(paths["read_count_by_name"]).read().strip().split("\n")
    assert lines[0] == "sequence_name\tread_count"
    total = sum(int(l.split("\t")[1]) for l in lines[1:])
    assert total == len(np.unique(res.best.data["read_id"]))
