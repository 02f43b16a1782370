"""AMR module driver: profile result -> consensus -> multi-DB scan -> report.

The reference forks megapath_nano_amr.py on the species-alignment BAM
(reference: bin/lib/aligner.py:250-256 spawn; bin/megapath_nano_amr.py:227
main). Here it's a library call on the profiler's outputs — the same best
alignments, no BAM round-trip.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from megapath_nano_tpu.align.records import AlignList
from megapath_nano_tpu.amr.consensus import ConsensusContig, consensus_contigs
from megapath_nano_tpu.amr.db import AMRGeneDB
from megapath_nano_tpu.amr.report import merge_results, write_results_csv
from megapath_nano_tpu.amr.scan import AMRHit, scan_contigs


@dataclass
class AMRResult:
    contigs: list[ConsensusContig]
    hits_by_db: dict[str, list[AMRHit]]
    merged: dict

    def write(self, out_dir: str, prefix: str = "amr") -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{prefix}.results.csv")
        write_results_csv(path, self.merged, sorted(self.hits_by_db))
        return path


def run_amr(
    best_align: AlignList,
    reads: list[np.ndarray],
    target_seqs: dict[int, np.ndarray],     # sequence_id -> numeric seq
    dbs: list[AMRGeneDB],
    *,
    min_depth: int = 1,
    min_identity: float = 0.90,
    min_coverage: float = 0.60,
    backend: str = "jnp",
) -> AMRResult:
    """Build consensus over every aligned target sequence, scan all DBs."""
    contigs: list[ConsensusContig] = []
    for seq_id in np.unique(best_align.data["sequence_id"]):
        ref = target_seqs.get(int(seq_id))
        if ref is None:
            continue
        contigs.extend(consensus_contigs(best_align, reads, int(seq_id), ref,
                                         min_depth=min_depth))
    hits_by_db = {
        db.name: scan_contigs(contigs, db, min_identity=min_identity,
                              min_coverage=min_coverage, backend=backend)
        for db in dbs
    }
    return AMRResult(contigs, hits_by_db, merge_results(hits_by_db))
