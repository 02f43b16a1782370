"""Report writers: .preport, .microbe_stat, read stats.

Output surface mirroring step_format_output (reference:
bin/megapath_nano.py:3275-3888): the species-level profile (.preport), the
per-assembly main table (.microbe_stat), and per-read tables. TSV formats
keep the reference's column names so downstream consumers can switch over.
"""

from __future__ import annotations

import numpy as np

MICROBE_STAT_COLS = [
    "assembly_id", "tax_id", "species_tax_id", "genus_tax_id",
    "total_number_of_read", "total_read_bp", "total_aligned_bp",
    "average_read_length", "assembly_length", "average_depth",
    "covered_bp", "covered_percent", "noise_span_bp", "noise_span_percent",
    "adjusted_covered_percent", "adjusted_average_depth",
    "adjusted_total_aligned_bp", "average_identity", "average_edit_dist",
    "average_alignment_score",
]


def species_abundance(stat: np.ndarray) -> list[tuple[int, int]]:
    """Aggregate adjusted_total_aligned_bp per species_tax_id, descending —
    the .preport content (megapath_nano.py:3655)."""
    agg: dict[int, int] = {}
    for row in stat:
        sp = int(row["species_tax_id"])
        agg[sp] = agg.get(sp, 0) + int(row["adjusted_total_aligned_bp"])
    return sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))


def write_preport(path: str, stat: np.ndarray,
                  tax_names: dict[int, str] | None = None) -> None:
    tax_names = tax_names or {}
    with open(path, "w") as f:
        f.write("species_tax_id\tname\tadjusted_abundance\n")
        for sp, ab in species_abundance(stat):
            f.write(f"{sp}\t{tax_names.get(sp, str(sp))}\t{ab}\n")


def write_microbe_stat(path: str, stat: np.ndarray,
                       assembly_names: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\t".join(MICROBE_STAT_COLS) + "\n")
        order = np.argsort(-stat["adjusted_total_aligned_bp"], kind="stable")
        for row in stat[order]:
            vals = []
            for col in MICROBE_STAT_COLS:
                v = row[col]
                if col == "assembly_id":
                    vals.append(assembly_names[int(v)]
                                if int(v) < len(assembly_names) else str(int(v)))
                elif isinstance(v, np.floating):
                    vals.append(f"{float(v):.6f}")
                else:
                    vals.append(str(int(v)))
            f.write("\t".join(vals) + "\n")


def write_read_stat(path: str, categories: dict[str, dict]) -> None:
    """Totals per category (read_stat, megapath_nano.py:3235-3269):
    categories maps name -> {'reads': n, 'bp': n}."""
    with open(path, "w") as f:
        f.write("category\tnumber_of_read\ttotal_read_bp\n")
        for name, d in categories.items():
            f.write(f"{name}\t{d['reads']}\t{d['bp']}\n")
