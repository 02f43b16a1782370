"""Train-variant CLI: train on truth VCF, then the model calls the variants
in the amplicon pipeline."""

import os
import subprocess
import sys

import numpy as np
import pytest

from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.io.fastq import write_fastq
from megapath_nano_tpu.utils.dna import mutate, random_sequence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))


@pytest.mark.slow
def test_train_then_call(tmp_path):
    rng = np.random.default_rng(0)
    ref = random_sequence(rng, 9000)
    donor = ref.copy()
    snvs = [2000, 4500, 7000]
    for p in snvs:
        donor[p] = (donor[p] + 1) % 4
    RefDB.build([ref], ["chrT"], [0], ["T"], [(1, 1, 1)]) \
        .save(str(tmp_path / "db"))
    reads = [mutate(rng, donor[int(rng.integers(0, 8200)):][:800],
                    0.01, 0.005, 0.005) for _ in range(120)]
    write_fastq(str(tmp_path / "reads.fastq"),
                [f"r{i}" for i in range(len(reads))], reads)
    with open(tmp_path / "truth.vcf", "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for p in snvs:
            f.write(f"chrT\t{p + 1}\t.\t{'ACGT'[ref[p]]}\t{'ACGT'[donor[p]]}"
                    f"\t60\tPASS\t.\tGT\t1/1\n")

    r = subprocess.run(
        [sys.executable, "-m", "megapath_nano_tpu.cli.train_variant",
         "--query", str(tmp_path / "reads.fastq"),
         "--ref_db", str(tmp_path / "db"),
         "--truth_vcf", str(tmp_path / "truth.vcf"),
         "--out", str(tmp_path / "model.pkl"),
         "--steps", "400", "--hidden", "32", "--backend", "jnp"],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.exists(tmp_path / "model.pkl")
    # trained accuracy reported and high (overfit on its own data)
    assert "train zyg acc" in r.stdout
    acc = float(r.stdout.split("train zyg acc ")[1].rstrip(")\n"))
    assert acc > 0.95

    # use the model in the amplicon caller
    r2 = subprocess.run(
        [sys.executable, "-m", "megapath_nano_tpu.cli.amplicon",
         "--query", str(tmp_path / "reads.fastq"),
         "--target_db", str(tmp_path / "db"),
         "--model", str(tmp_path / "model.pkl"),
         "--output_folder", str(tmp_path / "out"),
         "--backend", "jnp"],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-1500:]
    vcf = (tmp_path / "out" / "amplicon.vcf").read_text().splitlines()
    called = {int(l.split("\t")[1]) - 1 for l in vcf if not l.startswith("#")}
    for p in snvs:
        assert any(abs(p - q) <= 1 for q in called), (p, called)
