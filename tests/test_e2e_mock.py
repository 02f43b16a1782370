"""End-to-end mock-community acceptance test (BASELINE configs 3-4 analog).

Simulates a 10-species mock metagenome with the ONT simulator
(sim/simulator.py — the NanoSim equivalent, reference bin/tools/nanosim),
builds a RefDB + AMR gene DB with the shipped build_db CLI, runs the real
`cli/main.py` taxon + AMR pipeline, and asserts species recall/precision and
AMR gene detection against the planted truth — the closest zero-egress
approximation of the reference's documented demo run
(reference: README.md:168-173 E. coli demo; docs/Supplementary AMR table).
"""

import os

import numpy as np
import pytest

from megapath_nano_tpu.io.fastq import write_fasta, write_fastq
from megapath_nano_tpu.sim.simulator import ErrorProfile, simulate_reads
from megapath_nano_tpu.utils.dna import random_sequence

N_SPECIES = 10
GLEN = 20_000
# planted per-species read counts (abundance ladder, species 0 dominant)
COUNTS = [60, 50, 40, 30, 20, 15, 12, 10, 8, 6]


@pytest.fixture(scope="module")
def mockworld(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mock")
    rng = np.random.default_rng(42)
    gene_amp = random_sequence(rng, 900)     # planted in species 0
    gene_tet = random_sequence(rng, 850)     # planted in species 3
    gene_van = random_sequence(rng, 800)     # in the DB, NOT planted

    genomes, names = [], []
    meta_lines = []
    for s in range(N_SPECIES + 2):           # 2 extra DB-only species
        g = random_sequence(rng, GLEN)
        if s == 0:
            g = np.concatenate([g[:8000], gene_amp, g[8000:]])
        if s == 3:
            g = np.concatenate([g[:5000], gene_tet, g[5000:]])
        genomes.append(g)
        names.append(f"asm{s}")
        write_fasta(str(tmp / f"asm{s}.fna"), [f"chr{s}"], [g])
        meta_lines.append(
            f"asm{s}\t{1000 + s}\t{10 * (s + 1)}\t{5 + s}\tSpecies sp{s}\n")
    with open(tmp / "meta.tsv", "w") as f:
        f.writelines(meta_lines)

    write_fasta(str(tmp / "genes.fna"), ["geneAmp", "geneTet", "geneVan"],
                [gene_amp, gene_tet, gene_van])
    with open(tmp / "pheno.tsv", "w") as f:
        f.write("geneAmp\tampicillin\n")
        f.write("geneTet\ttetracycline\n")
        f.write("geneVan\tvancomycin\n")

    prof = ErrorProfile()
    reads, ids, quals = [], [], []
    for s, n in enumerate(COUNTS):
        rs, _truth, qs = simulate_reads(genomes[s], n, prof, seed=100 + s,
                                        max_length=2000, with_quals=True)
        for j, (r, q) in enumerate(zip(rs, qs)):
            reads.append(r)
            quals.append(q)
            ids.append(f"sp{s}_r{j}")
    write_fastq(str(tmp / "mock.fastq"), ids, reads, quals)
    return tmp


def test_mock_community_end_to_end(mockworld):
    from megapath_nano_tpu.cli import build_db, main as cli_main

    tmp = mockworld
    args = ["ref", "--metadata", str(tmp / "meta.tsv"),
            "--out", str(tmp / "refdb")]
    for s in range(N_SPECIES + 2):
        args += ["--fasta", str(tmp / f"asm{s}.fna")]
    assert build_db.main(args) == 0
    assert build_db.main(["amr", "--name", "resfinder",
                          "--fasta", str(tmp / "genes.fna"),
                          "--phenotypes", str(tmp / "pheno.tsv"),
                          "--out", str(tmp / "amrdb")]) == 0

    out = tmp / "out"
    assert cli_main.main([
        "--query", str(tmp / "mock.fastq"),
        "--db", str(tmp / "refdb"),
        "--amr_db", str(tmp / "amrdb"),
        "--output_folder", str(out),
        "--output_prefix", "mock",
        "--backend", "jnp"]) == 0

    # ---- taxon truth: recall, precision, abundance ordering -------------
    lines = open(out / "mock.preport").read().splitlines()
    assert lines[0].startswith("species_tax_id")
    rows = [ln.split("\t") for ln in lines[1:] if ln.strip()]
    reported = {int(r[0]): float(r[-1]) for r in rows}
    planted = {10 * (s + 1) for s in range(N_SPECIES)}
    absent = {10 * (s + 1) for s in range(N_SPECIES, N_SPECIES + 2)}

    found = {t for t, ab in reported.items() if ab > 0}
    recall = len(planted & found) / len(planted)
    assert recall == 1.0, f"missing species: {sorted(planted - found)}"
    # precision: the two DB-only species carry (near-)zero abundance
    for t in absent:
        assert reported.get(t, 0.0) <= 0.02 * max(reported.values()), t
    # the dominant planted species leads the report
    assert int(rows[0][0]) == 10
    # rank correlation: top-5 reported are a subset of top-7 planted
    top_reported = [int(r[0]) for r in rows[:5]]
    top_planted = [10 * (s + 1) for s in range(7)]
    assert set(top_reported) <= set(top_planted), top_reported

    # ---- AMR truth: planted genes detected, unplanted not ---------------
    results = open(out / "mock.results.csv").read().upper()
    assert "AMPICILLIN" in results and "GENEAMP" in results
    assert "TETRACYCLINE" in results and "GENETET" in results
    assert "VANCOMYCIN" not in results
    assert "GENEVAN" not in results

    # read_stat totals track the simulated input (a couple of simulated
    # reads may legitimately fall below the QC quality floor)
    header, vals = (open(out / "mock.read_stat").read()
                    .strip().split("\n"))
    stat = dict(zip(header.split("\t"), vals.split("\t")))
    total = int(stat["total_number_of_read"])
    assert 0.95 * sum(COUNTS) <= total <= sum(COUNTS), total
