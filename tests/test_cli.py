"""CLI end-to-end: build DBs from FASTA, run the full pipeline, check the
output surface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from megapath_nano_tpu.io.fastq import write_fasta, write_fastq
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))


def _run(args):
    return subprocess.run([sys.executable, "-m"] + args, env=ENV, cwd=REPO,
                          capture_output=True, text=True, timeout=300)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cliworld")
    rng = np.random.default_rng(0)
    gene = random_sequence(rng, 800)
    g1 = np.concatenate([random_sequence(rng, 12000), gene,
                         random_sequence(rng, 4000)])
    g2 = random_sequence(rng, 15000)
    write_fasta(str(tmp / "asm1.fna"), ["chr1"], [g1])
    write_fasta(str(tmp / "asm2.fna"), ["chr2"], [g2])
    with open(tmp / "meta.tsv", "w") as f:
        f.write("asmA\t100\t10\t1\tSpecies foo\n")
        f.write("asmB\t200\t20\t2\tSpecies bar\n")
    write_fasta(str(tmp / "genes.fna"), ["blaX"], [gene])
    with open(tmp / "pheno.tsv", "w") as f:
        f.write("blaX\tampicillin;cephalothin\n")

    reads, quals = [], []
    for _ in range(50):
        g, genome = (0, g1) if rng.random() < 0.7 else (1, g2)
        s = int(rng.integers(0, len(genome) - 800))
        r = mutate(rng, genome[s: s + 800], 0.03, 0.015, 0.015)
        if rng.integers(0, 2):
            r = revcomp(r)
        reads.append(r)
        quals.append(np.full(len(r), 25, np.int8))
    # one junk low-quality read that must be QC-filtered
    junk = random_sequence(rng, 500)
    reads.append(junk)
    quals.append(np.full(500, 3, np.int8))
    write_fastq(str(tmp / "reads.fastq"),
                [f"read{i}" for i in range(len(reads))], reads, quals)
    return tmp


def test_build_and_run(world):
    r = _run(["megapath_nano_tpu.cli.build_db", "ref",
              "--fasta", str(world / "asm1.fna"),
              "--fasta", str(world / "asm2.fna"),
              "--metadata", str(world / "meta.tsv"),
              "--out", str(world / "refdb")])
    assert r.returncode == 0, r.stderr
    assert "2 assemblies" in r.stdout

    r = _run(["megapath_nano_tpu.cli.build_db", "amr",
              "--name", "resfinder", "--fasta", str(world / "genes.fna"),
              "--phenotypes", str(world / "pheno.tsv"),
              "--out", str(world / "amrdb")])
    assert r.returncode == 0, r.stderr

    out = world / "out"
    r = _run(["megapath_nano_tpu.cli.main",
              "--query", str(world / "reads.fastq"),
              "--db", str(world / "refdb"),
              "--amr_db", str(world / "amrdb"),
              "--output_folder", str(out),
              "--output_prefix", "demo",
              "--backend", "jnp"])
    assert r.returncode == 0, r.stderr

    preport = open(out / "demo.preport").read().splitlines()
    assert preport[0].startswith("species_tax_id")
    assert preport[1].split("\t")[0] == "10"      # dominant species first
    assert "Species foo" in preport[1]
    assert any(line.split("\t")[0] == "20" for line in preport[1:])

    results = open(out / "demo.results.csv").read()
    assert "AMPICILLIN" in results and "blaX" in results
    assert "CEPHALOTHIN" in results

    # read_list now ships inside the per-read archive (reference
    # .per_read.tar.gz, megapath_nano.py:3345-3360)
    import tarfile

    with tarfile.open(out / "demo.per_read.tar.gz") as tf:
        rl_member = [n for n in tf.getnames() if n.endswith("read_list")][0]
        read_list = tf.extractfile(rl_member).read().decode().splitlines()
    assert len(read_list) == 51  # header + 50 QC-passing reads
    # 14-column read_stat: the junk read never reached the pipeline
    header, vals = open(out / "demo.read_stat").read().strip().split("\n")
    stat = dict(zip(header.split("\t"), vals.split("\t")))
    assert stat["total_number_of_read"] == "50"
    assert os.path.exists(out / "demo.timing")


def test_sharded_run_matches_monolithic(world):
    """--index_shards N must reproduce the monolithic preport exactly."""
    if not (world / "refdb").exists():   # build independently of test order
        r = _run(["megapath_nano_tpu.cli.build_db", "ref",
                  "--fasta", str(world / "asm1.fna"),
                  "--fasta", str(world / "asm2.fna"),
                  "--metadata", str(world / "meta.tsv"),
                  "--out", str(world / "refdb")])
        assert r.returncode == 0, r.stderr
    out1 = world / "out_mono"
    out2 = world / "out_shard"
    for out, extra in ((out1, []), (out2, ["--index_shards", "3"])):
        r = _run(["megapath_nano_tpu.cli.main",
                  "--query", str(world / "reads.fastq"),
                  "--db", str(world / "refdb"),
                  "--output_folder", str(out),
                  "--output_prefix", "demo",
                  "--no_amr",
                  "--backend", "jnp"] + extra)
        assert r.returncode == 0, r.stderr
    assert (open(out1 / "demo.preport").read()
            == open(out2 / "demo.preport").read())
    assert (open(out1 / "demo.microbe_stat").read()
            == open(out2 / "demo.microbe_stat").read())
    assert (open(out1 / "demo.species.paf").read()
            == open(out2 / "demo.species.paf").read())


def test_tunable_flags_reach_options():
    """Every reference-named tunable flag must land on its ProfileOptions
    field (reference argparse: bin/megapath_nano.py:5062-5128)."""
    from megapath_nano_tpu.cli.main import build_parser, options_from_args

    args = build_parser().parse_args([
        "--query", "x.fq", "--db", "d",
        "--min_alignment_score", "17",
        "--species_id_min_aligned_bp", "123",
        "--variable_region_percent", "40",
        "--expected_max_depth_stdev", "4.5",
        "--closing_expected_max_depth_stdev", "7.5",
        "--max_alignment_noise_overlap", "60",
        "--unique_alignment_threshold", "70",
        "--reassignment_ratio", "0.07",
        "--reassignment_error_rate", "0.03",
        "--reassignment_as_threshold", "0.9",
        "--similar_species_marker_num_genus", "5",
        "--similar_species_marker_alignment_similarity_1", "99",
        "--similar_species_marker_aligned_region_threshold_1", "60",
        "--similar_species_marker_alignment_similarity_2", "90",
        "--similar_species_marker_aligned_region_threshold_2", "80",
        "--similar_species_marker_similarity_combine_logic", "and",
        "--number_of_genus_to_perform_noise_projection", "2",
        "--noise_projection_num_read_to_simulate", "500",
        "--noise_projection_simulated_read_length_multiplier", "0.25",
        "--human_filter_alignment_score", "900",
        "--human_filter_alignment_score_percent", "80",
        "--backend", "jnp",
    ])
    opt = options_from_args(args)
    assert opt.align.min_alignment_score == 17
    assert opt.min_aligned_bp_per_species == 123
    assert opt.variable_region_percent == 0.40
    assert opt.spike_stdev == 4.5
    assert opt.closing_spike_stdev == 7.5
    assert opt.noise_overlap_fraction == 0.60
    assert opt.unique_as_ratio == 0.70
    assert opt.reassign_ratio == 0.07
    assert opt.reassign_error_rate == 0.03
    assert opt.reassign_as_threshold == 0.9
    assert opt.similar_marker_num_genus == 5
    assert opt.similar_marker_cond1 == (0.99, 0.60)
    assert opt.similar_marker_cond2 == (0.90, 0.80)
    assert opt.similar_marker_combine == "and"
    assert opt.noise_projection_num_genus == 2
    assert opt.noise_projection_reads == 500
    assert opt.noise_projection_read_length_multiplier == 0.25
    assert opt.human_filter_score == 900
    assert opt.human_filter_score_percent == 0.80

    # reference defaults hold when flags are omitted
    dflt = options_from_args(build_parser().parse_args(
        ["--query", "x.fq", "--db", "d"]))
    assert dflt.spike_stdev == 6.0 and dflt.closing_spike_stdev == 9.0
    assert dflt.noise_overlap_fraction == 0.5
    assert dflt.unique_as_ratio == 0.8
    assert dflt.similar_marker_cond1 == (0.98, 0.5)
    assert dflt.similar_marker_cond2 == (0.95, 0.75)
    assert dflt.similar_marker_combine == "or"
    assert dflt.noise_projection_reads == 10000


def test_reference_flag_coverage():
    """Every flag of the reference's megapath_nano.py argparse surface
    (fixture: tests/golden/reference_flags.txt, extracted from
    /root/reference/bin/megapath_nano.py:4831-5146) must have a row in
    docs/USAGE.md's coverage table, and every row claiming a CLI equivalent
    must actually parse in the named parser."""
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    flags = [ln.strip() for ln in
             open(os.path.join(here, "tests", "golden",
                               "reference_flags.txt")) if ln.strip()]
    usage = open(os.path.join(here, "docs", "USAGE.md")).read()
    section = usage.split("## Reference flag coverage", 1)[1]
    rows = {}
    for ln in section.splitlines():
        parts = [c.strip() for c in ln.split("|")]
        if len(parts) >= 4 and re.fullmatch(r"`[A-Za-z_0-9]+`", parts[1]):
            rows[parts[1].strip("`")] = (parts[2], parts[3])

    missing = [f for f in flags if f not in rows]
    assert not missing, f"flags missing from USAGE.md table: {missing}"

    from megapath_nano_tpu.cli import amplicon as cli_amplicon
    from megapath_nano_tpu.cli import amr as cli_amr
    from megapath_nano_tpu.cli import main as cli_main

    main_opts = cli_main.build_parser()._option_string_actions
    amp_opts = cli_amplicon.build_parser()._option_string_actions
    amr_opts = cli_amr.build_parser()._option_string_actions

    for ref_flag, (equiv, notes) in rows.items():
        if equiv == "N/A":
            assert notes, f"{ref_flag}: N/A rows need a reason"
            continue
        m = re.search(r"`(?:cli/(\w+)\.py )?(--[A-Za-z_0-9]+)`", equiv)
        if not m:
            # module-level equivalents (e.g. `python -m ...cli.amr`)
            assert "cli." in equiv or "`--" not in equiv, (ref_flag, equiv)
            continue
        where, flag = m.group(1), m.group(2)
        opts = {"amplicon": amp_opts, "amr": amr_opts}.get(where, main_opts)
        assert flag in opts, f"{ref_flag}: claimed equivalent {flag} " \
                             f"does not parse in {where or 'main'}"


def test_stage_subset_and_output_toggle_flags():
    """--filter_fq_only / --mapping_only / --taxon_module_only /
    output toggles parse and wire (no pipeline run needed)."""
    from megapath_nano_tpu.cli.main import (build_parser,
                                            output_gates_from_args)

    a = build_parser().parse_args(
        ["--query", "x.fq", "--db", "d", "--filter_fq_only",
         "--no_output_per_read_data", "--no_output_noise_stat",
         "--archive_format", "zip", "--read_length_bin_size", "250",
         "--min_read_quality", "9.5", "--min_read_length", "400"])
    assert a.filter_fq_only and a.archive_format == "zip"
    assert a.read_filter_min_quality == 9.5
    assert a.read_filter_min_length == 400
    gates = output_gates_from_args(a)
    assert "per_read_data" not in gates and "noise_stat" not in gates
    assert "PAF" in gates and "genome_set" in gates

    b = build_parser().parse_args(
        ["--query", "x.fq", "--db", "d", "--no_all_taxon_module_steps"])
    assert not b.all_taxon_module_steps

    c = build_parser().parse_args(
        ["--query", "x.fq", "--db", "d", "--taxon_module_only",
         "--mapping_only"])
    assert c.taxon_module_only and c.mapping_only

    # microbe-rep ladder + noise projection tunables reach ProfileOptions
    from megapath_nano_tpu.cli.main import options_from_args

    d = build_parser().parse_args(
        ["--query", "x.fq", "--db", "d",
         "--microbe_repetitive_region_filter_abundance_threshold_80", "100",
         "--microbe_repetitive_region_filter_min_average_depth", "0.5",
         "--min_percent_abundance_to_perform_noise_projection", "30",
         "--noise_projection_simulated_read_length_bin_size", "500"])
    opt = options_from_args(d)
    assert opt.microbe_rep_thresholds[0] == 100.0
    assert opt.microbe_rep_min_average_depth == 0.5
    assert opt.noise_projection_min_percent_abundance == 30.0
    assert opt.noise_projection_length_bin_size == 500
