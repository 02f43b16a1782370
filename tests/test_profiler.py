"""End-to-end taxonomic profiling on a synthetic mock metagenome."""

import os

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


def _mock_world(seed=0):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, 30000) for _ in range(3)]
    db = RefDB.build(
        sequences=genomes,
        seq_names=["chrA", "chrB", "chrC"],
        seq_assembly=[0, 1, 2],
        assembly_names=["asmA", "asmB", "asmC"],
        assembly_tax=[(1001, 101, 11), (1002, 102, 11), (1003, 103, 12)],
        tax_names={101: "Species alpha", 102: "Species beta",
                   103: "Species gamma"},
    )
    return rng, genomes, db


def _reads_with_mix(rng, genomes, counts, read_len=700, err=0.06):
    reads, origins = [], []
    for g, n in enumerate(counts):
        for _ in range(n):
            s = int(rng.integers(0, len(genomes[g]) - read_len))
            read = mutate(rng, genomes[g][s: s + read_len],
                          sub_rate=err / 2, ins_rate=err / 4, del_rate=err / 4)
            if rng.integers(0, 2):
                read = revcomp(read)
            reads.append(read)
            origins.append(g)
    order = rng.permutation(len(reads))
    return [reads[i] for i in order], [origins[i] for i in order]


def test_profile_recovers_mixture(tmp_path):
    rng, genomes, db = _mock_world()
    reads, origins = _reads_with_mix(rng, genomes, [40, 20, 5])
    prof = TaxonProfiler(db, ProfileOptions(align=AlignParams(backend="jnp")))
    result = prof.profile(reads, [f"r{i}" for i in range(len(reads))])

    assert result.n_reads_aligned >= len(reads) * 0.95
    # species ranking must follow the mixture 40 > 20 > 5
    stat = result.stat
    by_species = {int(r["species_tax_id"]): int(r["adjusted_total_aligned_bp"])
                  for r in stat}
    assert by_species[101] > by_species[102] > by_species[103] > 0

    # best list: one row per read, assignments match origins
    best = result.best
    assert len(best) == result.n_reads_aligned
    correct = sum(
        1 for row in best.data
        if int(row["assembly_id"]) == origins[int(row["read_id"])])
    assert correct >= 0.95 * len(best)

    # reports
    paths = prof.write_reports(result, str(tmp_path), "mock")
    lines = open(paths["preport"]).read().splitlines()
    assert lines[0] == "species_tax_id\tname\tadjusted_abundance"
    assert lines[1].startswith("101\tSpecies alpha")
    assert os.path.getsize(paths["microbe_stat"]) > 0


def test_refdb_save_load_roundtrip(tmp_path):
    rng, genomes, db = _mock_world(seed=2)
    db.save(str(tmp_path / "db"))
    db2 = RefDB.load(str(tmp_path / "db"))
    assert np.array_equal(db.index.keys, db2.index.keys)
    assert db2.assembly_names == db.assembly_names
    assert db2.tax_names == db.tax_names

    reads, _ = _reads_with_mix(rng, genomes, [5, 0, 0], read_len=500)
    p1 = TaxonProfiler(db, ProfileOptions(align=AlignParams(backend="jnp")))
    p2 = TaxonProfiler(db2, ProfileOptions(align=AlignParams(backend="jnp")))
    r1 = p1.profile(reads)
    r2 = p2.profile(reads)
    assert np.array_equal(r1.best.data, r2.best.data)


def test_spike_filter_flags_hotspot():
    rng, genomes, db = _mock_world(seed=5)
    # 50 reads piled on one 1kb hotspot + 10 spread reads
    reads = []
    for _ in range(50):
        reads.append(mutate(rng, genomes[0][5000:6000], sub_rate=0.02,
                            ins_rate=0.01, del_rate=0.01))
    for i in range(10):
        s = 8000 + i * 2000
        reads.append(mutate(rng, genomes[0][s: s + 1000], sub_rate=0.02,
                            ins_rate=0.01, del_rate=0.01))
    prof = TaxonProfiler(db, ProfileOptions(
        align=AlignParams(backend="jnp"), spike_filter=True))
    result = prof.profile(reads)
    assert result.noise_bed is not None and len(result.noise_bed) > 0
    nb = result.noise_bed
    # the hotspot is flagged
    assert ((nb["start"] < 6000) & (nb["end"] > 5000)).any()
    # spike alignments were removed from the noise-filtered align list
    in_spike = (result.align_list.data["sequence_from"] >= 4900) \
        & (result.align_list.data["sequence_to"] <= 6100)
    assert in_spike.sum() == 0


def test_profile_paf_mode_matches(tmp_path):
    """emit_cigars=False (device-stats PAF path) must give the identical
    profile: same best list, same stats, no .species.sam output."""
    rng, genomes, db = _mock_world(seed=5)
    reads, _ = _reads_with_mix(rng, genomes, [15, 8, 4])
    names = [f"r{i}" for i in range(len(reads))]
    base = TaxonProfiler(
        db, ProfileOptions(align=AlignParams(backend="jnp")))
    paf = TaxonProfiler(
        db, ProfileOptions(align=AlignParams(backend="jnp"),
                           emit_cigars=False))
    r1 = base.profile(reads, names)
    r2 = paf.profile(reads, names)
    assert r2.best.cigar_map is None and r1.best.cigar_map
    np.testing.assert_array_equal(r1.best.data, r2.best.data)
    np.testing.assert_array_equal(r1.stat, r2.stat)
    p1 = base.write_reports(r1, str(tmp_path / "a"), "m", reads=reads)
    p2 = paf.write_reports(r2, str(tmp_path / "b"), "m", reads=reads)
    assert "species_sam" in p1 and "species_sam" not in p2
    assert open(p1["preport"]).read() == open(p2["preport"]).read()
    assert open(p1["species_paf"]).read() == open(p2["species_paf"]).read()
