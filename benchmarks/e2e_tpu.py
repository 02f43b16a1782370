#!/usr/bin/env python3
"""Full-pipeline drive on the REAL TPU backend (VERDICT r4 item 4).

Simulates a 10-species mock community (same construction as
tests/test_e2e_mock.py, scaled up), builds the RefDB + AMR DB with the
shipped build_db CLI, then runs the real `cli/main.py` taxon + AMR pipeline
TWICE — once with --backend pallas on the chip, once with --backend jnp —
and asserts the observable output surface is IDENTICAL (preport,
microbe_stat, read_stat, AMR results.csv). Per-stage wall times from both
runs land in benchmarks/e2e_tpu.json alongside the .timing tables.

This is the only artifact that exercises filter → align → taxon → AMR →
reports end-to-end on TPU hardware (bench.py covers the map path only);
a device-side dtype/cap bug in the non-map stages would trip here.

Usage: python benchmarks/e2e_tpu.py  (needs the TPU; ~5 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N_SPECIES = 10
GLEN = 100_000
COUNTS = [300, 250, 200, 150, 100, 75, 60, 50, 40, 30]   # 1,255 reads

COMPARE_FILES = ["mock.preport", "mock.microbe_stat", "mock.read_stat",
                 "mock.results.csv"]


def build_world(tmp: str):
    from megapath_nano_tpu.io.fastq import write_fasta, write_fastq
    from megapath_nano_tpu.sim.simulator import ErrorProfile, simulate_reads
    from megapath_nano_tpu.utils.dna import random_sequence

    rng = np.random.default_rng(42)
    gene_amp = random_sequence(rng, 900)
    gene_tet = random_sequence(rng, 850)
    gene_van = random_sequence(rng, 800)

    meta_lines = []
    genomes = []
    for s in range(N_SPECIES + 2):
        g = random_sequence(rng, GLEN)
        if s == 0:
            g = np.concatenate([g[:8000], gene_amp, g[8000:]])
        if s == 3:
            g = np.concatenate([g[:5000], gene_tet, g[5000:]])
        genomes.append(g)
        write_fasta(os.path.join(tmp, f"asm{s}.fna"), [f"chr{s}"], [g])
        meta_lines.append(
            f"asm{s}\t{1000 + s}\t{10 * (s + 1)}\t{5 + s}\tSpecies sp{s}\n")
    with open(os.path.join(tmp, "meta.tsv"), "w") as f:
        f.writelines(meta_lines)
    write_fasta(os.path.join(tmp, "genes.fna"),
                ["geneAmp", "geneTet", "geneVan"],
                [gene_amp, gene_tet, gene_van])
    with open(os.path.join(tmp, "pheno.tsv"), "w") as f:
        f.write("geneAmp\tampicillin\ngeneTet\ttetracycline\n"
                "geneVan\tvancomycin\n")

    prof = ErrorProfile()
    reads, ids, quals = [], [], []
    for s, n in enumerate(COUNTS):
        rs, _t, qs = simulate_reads(genomes[s], n, prof, seed=100 + s,
                                    max_length=2000, with_quals=True)
        for j, (r, q) in enumerate(zip(rs, qs)):
            reads.append(r)
            quals.append(q)
            ids.append(f"sp{s}_r{j}")
    write_fastq(os.path.join(tmp, "mock.fastq"), ids, reads, quals)


def run_pipeline(tmp: str, backend: str) -> tuple[float, str]:
    from megapath_nano_tpu.cli import main as cli_main

    out = os.path.join(tmp, f"out_{backend}")
    t0 = time.time()
    rc = cli_main.main([
        "--query", os.path.join(tmp, "mock.fastq"),
        "--db", os.path.join(tmp, "refdb"),
        "--amr_db", os.path.join(tmp, "amrdb"),
        "--output_folder", out,
        "--output_prefix", "mock",
        "--backend", backend])
    assert rc == 0, f"pipeline rc={rc} backend={backend}"
    return time.time() - t0, out


def main() -> int:
    import jax

    from megapath_nano_tpu.cli import build_db

    on_tpu = jax.default_backend() == "tpu"
    tmp = tempfile.mkdtemp(prefix="e2e_tpu_")
    try:
        build_world(tmp)
        args = ["ref", "--metadata", os.path.join(tmp, "meta.tsv"),
                "--out", os.path.join(tmp, "refdb")]
        for s in range(N_SPECIES + 2):
            args += ["--fasta", os.path.join(tmp, f"asm{s}.fna")]
        assert build_db.main(args) == 0
        assert build_db.main(["amr", "--name", "resfinder",
                              "--fasta", os.path.join(tmp, "genes.fna"),
                              "--phenotypes", os.path.join(tmp, "pheno.tsv"),
                              "--out", os.path.join(tmp, "amrdb")]) == 0

        rec = {"n_reads": int(sum(COUNTS)), "n_species": N_SPECIES,
               "genome_bp": GLEN * (N_SPECIES + 2),
               "tpu_available": bool(on_tpu)}
        backends = ["pallas", "jnp"] if on_tpu else ["jnp"]
        outs = {}
        for be in backends:
            wall, out = run_pipeline(tmp, be)
            outs[be] = out
            timing = {}
            with open(os.path.join(out, "mock.timing")) as f:
                for ln in f:
                    if ln.strip():
                        name, dt = ln.rsplit("\t", 1)
                        timing[name] = round(float(dt), 3)
            rec[be] = {"wall_s": round(wall, 1), "stage_timing_s": timing}
            print(f"{be}: {wall:.1f}s", flush=True)

        if on_tpu:
            mismatches = []
            for fname in COMPARE_FILES:
                a = open(os.path.join(outs["pallas"], fname)).read()
                b = open(os.path.join(outs["jnp"], fname)).read()
                if a != b:
                    mismatches.append(fname)
            rec["outputs_identical"] = not mismatches
            rec["mismatched_files"] = mismatches
            assert not mismatches, f"backend outputs differ: {mismatches}"

        # sanity: the planted truth holds on the TPU run
        src = outs.get("pallas", outs.get("jnp"))
        lines = open(os.path.join(src, "mock.preport")).read().splitlines()
        rows = [ln.split("\t") for ln in lines[1:] if ln.strip()]
        reported = {int(r[0]): float(r[-1]) for r in rows}
        planted = {10 * (s + 1) for s in range(N_SPECIES)}
        found = {t for t, ab in reported.items() if ab > 0}
        rec["species_recall"] = round(
            len(planted & found) / len(planted), 3)
        assert rec["species_recall"] == 1.0
        results = open(os.path.join(src, "mock.results.csv")).read().upper()
        assert "AMPICILLIN" in results and "TETRACYCLINE" in results
        assert "VANCOMYCIN" not in results
        rec["amr_truth_ok"] = True

        out_json = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "e2e_tpu.json")
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"written {out_json}")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
