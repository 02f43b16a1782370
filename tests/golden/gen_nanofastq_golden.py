"""Generate nanofastq golden fixtures from the reference binary.

Runs the reference's prebuilt stream filter (/root/reference/bin/tools/
nanofastq, source nanofastq.c) over deterministic synthetic FASTQ for a grid
of (-q, -l, -h, -t) options and records, per config: the surviving read ids
+ sequences (stdout) and the per-read info TSV (stderr,
read_id len avgQ len_trimmed avgQ_trimmed passed — nanofastq.c:234-244).

Usage: python tests/golden/gen_nanofastq_golden.py  (writes
tests/golden/nanofastq_golden.json; requires /root/reference)
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from megapath_nano_tpu.utils.dna import decode, random_sequence  # noqa: E402

BIN = "/root/reference/bin/tools/nanofastq"
OUT = os.path.join(os.path.dirname(__file__), "nanofastq_golden.json")

CONFIGS = [
    {"q": 7.0, "l": 0, "h": 0, "t": 0},
    {"q": 12.0, "l": 0, "h": 0, "t": 0},
    {"q": 7.0, "l": 300, "h": 0, "t": 0},
    {"q": 7.0, "l": 0, "h": 50, "t": 30},
    {"q": 10.0, "l": 200, "h": 25, "t": 25},
    {"q": 0.0, "l": 0, "h": 0, "t": 0},
]


def make_fastq(rng, n=40):
    reads = []
    lines = []
    for i in range(n):
        ln = int(rng.integers(60, 800))
        seq = decode(random_sequence(rng, ln))
        # quality profile: mix of clean, noisy, and degraded-tail reads
        kind = i % 4
        if kind == 0:
            q = rng.integers(20, 35, ln)
        elif kind == 1:
            q = rng.integers(2, 12, ln)
        elif kind == 2:
            q = np.concatenate([rng.integers(25, 35, ln // 2),
                                rng.integers(2, 10, ln - ln // 2)])
        else:
            q = rng.integers(5, 30, ln)
        qs = "".join(chr(33 + int(x)) for x in q)
        lines.append(f"@r{i}\n{seq}\n+\n{qs}\n")
        reads.append((f"r{i}", seq, [int(x) for x in q]))
    return "".join(lines), reads


def main():
    rng = np.random.default_rng(20260818)
    fastq, reads = make_fastq(rng)
    golden = {"reads": reads, "configs": []}
    for cfg in CONFIGS:
        cmd = [BIN, "-q", str(cfg["q"]), "-l", str(cfg["l"]),
               "-h", str(cfg["h"]), "-t", str(cfg["t"])]
        r = subprocess.run(cmd, input=fastq, capture_output=True, text=True,
                           check=True)
        out_ids, out_seqs = [], []
        out_lines = r.stdout.splitlines()
        for i in range(0, len(out_lines), 4):
            out_ids.append(out_lines[i][1:].split()[0])
            out_seqs.append(out_lines[i + 1])
        info = [line.split("\t") for line in r.stderr.splitlines() if line]
        golden["configs"].append({
            "options": cfg, "passed_ids": out_ids, "passed_seqs": out_seqs,
            "info": info})
    with open(OUT, "w") as f:
        json.dump(golden, f)
    print(f"{OUT}: {len(golden['configs'])} configs over {len(reads)} reads")


if __name__ == "__main__":
    main()
