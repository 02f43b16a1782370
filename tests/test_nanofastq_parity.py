"""read_fastq vs the reference nanofastq binary, option grid golden parity.

Fixtures in tests/golden/nanofastq_golden.json were produced by running the
reference's prebuilt filter (bin/tools/nanofastq, source nanofastq.c) over
deterministic synthetic FASTQ — see gen_nanofastq_golden.py. The test checks
that our native QC keeps exactly the same reads, emits identical trimmed
sequences, and reproduces the per-read info table (length + avgQ rounded the
same way nanofastq prints them)."""

import json
import os

import numpy as np
import pytest

from megapath_nano_tpu.io.fastq import read_fastq
from megapath_nano_tpu.utils.dna import decode

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "nanofastq_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fastq_path(golden, tmp_path_factory):
    p = tmp_path_factory.mktemp("nfq") / "in.fastq"
    with open(p, "w") as f:
        for rid, seq, quals in golden["reads"]:
            qs = "".join(chr(33 + q) for q in quals)
            f.write(f"@{rid}\n{seq}\n+\n{qs}\n")
    return str(p)


def test_option_grid_parity(golden, fastq_path):
    for cfg in golden["configs"]:
        o = cfg["options"]
        batch = read_fastq(fastq_path, head_crop=o["h"], tail_crop=o["t"],
                           min_length=o["l"], min_quality=o["q"])
        assert batch.ids == cfg["passed_ids"], o
        for i, seq in enumerate(cfg["passed_seqs"]):
            assert decode(batch.read(i)) == seq, (o, cfg["passed_ids"][i])


def test_info_table_parity(golden, fastq_path):
    cfg = golden["configs"][0]          # q=7 default config
    o = cfg["options"]
    batch = read_fastq(fastq_path, head_crop=o["h"], tail_crop=o["t"],
                       min_length=o["l"], min_quality=o["q"])
    st = batch.stats
    assert len(cfg["info"]) == len(st["passed"])
    for i, row in enumerate(cfg["info"]):
        rid, ln, avgq, lnt, avgqt, passed = row
        assert int(ln) == int(st["orig_len"][i]), (i, row)
        assert int(lnt) == int(st["trimmed_len"][i]), (i, row)
        assert int(passed) == int(st["passed"][i]), (i, row)
        # nanofastq prints %.2f
        assert f"{st['avg_q'][i]:.2f}" == avgq, (i, row)
        assert f"{st['avg_q_trimmed'][i]:.2f}" == avgqt, (i, row)
