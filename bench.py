"""Benchmark: ONT-style read alignment throughput on one TPU chip.

Measures the full map path (sketch -> seed lookup -> device chaining ->
batched Pallas banded extension -> exact per-candidate emit) of
MinimizerAligner against a synthetic multi-genome index, steady-state after
compile warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline anchors to the reference pipeline's alignment stage: minimap2
map-ont sustains roughly 2-4 Mbp/s per CPU core on ~1 kb ONT reads; the
reference runs it with up to 64 threads (reference: bin/megapath_nano.py:
5049-5050), i.e. ~25k reads/s of 1 kb reads on a full 64-core server.
vs_baseline = measured reads/s/chip ÷ 25,000.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner  # noqa: E402
from megapath_nano_tpu.index.minimizer import MinimizerIndex  # noqa: E402
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp  # noqa: E402

BASELINE_READS_PER_S = 25000.0

N_GENOMES = 10
GENOME_LEN = 300_000
N_READS = 8192
READ_LEN = 1000
ERR = 0.06


def main():
    import jax

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    rng = np.random.default_rng(2026)
    genomes = [random_sequence(rng, GENOME_LEN) for _ in range(N_GENOMES)]
    index = MinimizerIndex.build(genomes,
                                 [f"genome{i}" for i in range(N_GENOMES)])
    aligner = MinimizerAligner(index, params=AlignParams(backend=backend))

    def make_reads(seed):
        r = np.random.default_rng(seed)
        reads = []
        for _ in range(N_READS):
            g = int(r.integers(0, N_GENOMES))
            s = int(r.integers(0, GENOME_LEN - READ_LEN))
            read = mutate(r, genomes[g][s: s + READ_LEN], sub_rate=ERR / 2,
                          ins_rate=ERR / 4, del_rate=ERR / 4)
            if r.integers(0, 2):
                read = revcomp(read)
            reads.append(read)
        return reads

    # pre-generate all batches (simulation is not part of the measured path)
    n_iter = 2
    batches = [make_reads(i) for i in range(n_iter + 1)]

    # PAF mode: all alignment fields from the device kernel, no CIGARs —
    # the reference's taxon path equivalent (minimap2 PAF without -a)
    # warmup: compile all shapes
    res = aligner.map_reads(batches[0], slice_size=4096, emit_cigars=False)
    n_aligned = len(np.unique(res.data["read_id"]))
    assert n_aligned >= 0.9 * N_READS, f"only {n_aligned} aligned in warmup"

    # steady state
    t0 = time.time()
    for it in range(n_iter):
        aligner.map_reads(batches[it + 1], slice_size=4096,
                          emit_cigars=False)
    dt = time.time() - t0
    reads_per_s = n_iter * N_READS / dt

    print(json.dumps({
        "metric": "ONT reads/s/chip (1kb@6%err vs 10-genome index, full map path)",
        "value": round(reads_per_s, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))
    return reads_per_s


def _regression_gate(reads_per_s):
    """Fail (exit 1, after the JSON line) when throughput drops >30% below
    the recorded best on this backend — the tunnel fluctuates ±25% minute to
    minute (docs/PERF.md), so the gate sits just outside that band. The best
    is auto-raised (committed in benchmarks/best.json) when beaten by >5%."""
    import os

    import jax

    backend = jax.default_backend()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "best.json")
    best = {}
    if os.path.exists(path):
        with open(path) as f:
            best = json.load(f)
    prev = best.get(backend, 0.0)
    if reads_per_s > prev * 1.05:
        best[backend] = round(reads_per_s, 1)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(best, f, indent=1)
    elif reads_per_s < prev * 0.70:
        print(f"PERF REGRESSION: {reads_per_s:.1f} reads/s < 70% of "
              f"recorded best {prev:.1f} (benchmarks/best.json)",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    _regression_gate(main())
