"""Read demultiplexing — the nanosplit equivalent.

The reference splits reads into per-destination FASTQ files with a C tool
(reference: bin/tools/nanosplit.c:31, driven by megapath_nano.py:1352-1364
to group reads per species for assembly placement). Here reads are already
columnar in memory, so demux is a grouping operation; FASTQ output is
provided for interoperability.
"""

from __future__ import annotations

import numpy as np

from megapath_nano_tpu.io.fastq import write_fastq


def demux_reads(
    assignments: dict[int, int] | np.ndarray,
    n_groups: int | None = None,
) -> dict[int, np.ndarray]:
    """read_id -> group mapping into {group: read_id array} (sorted)."""
    if isinstance(assignments, dict):
        if not assignments:
            return {}
        rids = np.fromiter(assignments.keys(), np.int64)
        grps = np.fromiter(assignments.values(), np.int64)
    else:
        rids = np.arange(len(assignments), dtype=np.int64)
        grps = np.asarray(assignments, np.int64)
        keep = grps >= 0
        rids, grps = rids[keep], grps[keep]
    order = np.lexsort((rids, grps))
    rids, grps = rids[order], grps[order]
    out: dict[int, np.ndarray] = {}
    if len(rids) == 0:
        return out
    bounds = np.flatnonzero(np.append(True, grps[1:] != grps[:-1]))
    for i, s in enumerate(bounds):
        e = bounds[i + 1] if i + 1 < len(bounds) else len(rids)
        out[int(grps[s])] = rids[s:e]
    return out


def write_demuxed_fastq(
    out_dir: str,
    groups: dict[int, np.ndarray],
    reads: list[np.ndarray],
    read_names: list[str] | None = None,
    group_names: dict[int, str] | None = None,
) -> dict[int, str]:
    """Write one FASTQ per group (nanosplit's file outputs)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for g, rids in groups.items():
        name = (group_names or {}).get(g, f"group{g}")
        path = os.path.join(out_dir, f"{name}.fastq")
        write_fastq(
            path,
            [read_names[r] if read_names else f"read{r}" for r in rids],
            [reads[r] for r in rids])
        paths[g] = path
    return paths
