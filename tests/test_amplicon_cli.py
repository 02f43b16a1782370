"""Amplicon CLI end-to-end: screen -> align -> AF-call -> realign -> VCF."""

import os
import subprocess
import sys

import numpy as np

from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.io.fastq import write_fastq
from megapath_nano_tpu.utils.dna import mutate, random_sequence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))


def test_amplicon_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    tb_ref = random_sequence(rng, 12000)
    other = random_sequence(rng, 12000)
    donor = tb_ref.copy()
    snvs = [3000, 8000]
    for p in snvs:
        donor[p] = (donor[p] + 1) % 4

    RefDB.build([tb_ref], ["H37Rv"], [0], ["TB"], [(1773, 1773, 1763)]) \
        .save(str(tmp_path / "target_db"))
    RefDB.build([tb_ref, other], ["H37Rv", "decoyc"], [0, 1],
                ["TB", "OtherBug"],
                [(1773, 1773, 1763), (2, 2, 2)]) \
        .save(str(tmp_path / "screen_db"))

    reads = []
    for _ in range(150):      # TB reads carrying the SNVs
        s = int(rng.integers(0, 11200))
        reads.append(mutate(rng, donor[s: s + 800], 0.01, 0.005, 0.005))
    for _ in range(20):       # off-target reads
        s = int(rng.integers(0, 11200))
        reads.append(mutate(rng, other[s: s + 800], 0.01, 0.005, 0.005))
    write_fastq(str(tmp_path / "reads.fastq"),
                [f"r{i}" for i in range(len(reads))], reads)

    r = subprocess.run(
        [sys.executable, "-m", "megapath_nano_tpu.cli.amplicon",
         "--query", str(tmp_path / "reads.fastq"),
         "--target_db", str(tmp_path / "target_db"),
         "--screen_db", str(tmp_path / "screen_db"),
         "--target_assembly", "TB",
         "--output_folder", str(tmp_path / "out"),
         "--backend", "jnp"],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    vcf = (tmp_path / "out" / "amplicon.vcf").read_text().splitlines()
    body = [l for l in vcf if not l.startswith("#")]
    called = {int(l.split("\t")[1]) - 1 for l in body}
    for p in snvs:
        assert any(abs(p - q) <= 1 for q in called), (p, called)
    # no massive false-positive load from 1%-error reads
    assert len(body) <= 10
    assert (tmp_path / "out" / "amplicon.mpn.done").exists()
    assert (tmp_path / "out" / "amplicon.call.done").exists()
