"""AMR consensus report: per-antibiotic merge across databases.

Reproduces merge_results (reference: bin/megapath_nano_amr.py:164-224):
each database contributes (drug -> gene[identity]) entries; drugs are
canonicalized (strip plural/'antibiotic', uppercase — :99-107) and the final
table has one row per antibiotic with one column per database listing the
supporting genes, written as results.csv (:208-209).
"""

from __future__ import annotations

import csv
from collections import defaultdict

from megapath_nano_tpu.amr.db import canonical_drug
from megapath_nano_tpu.amr.scan import AMRHit


def merge_results(hits_by_db: dict[str, list[AMRHit]]) -> dict:
    """-> {antibiotic: {db: [gene(identity%)...]}} canonicalized."""
    table: dict[str, dict[str, list[str]]] = defaultdict(
        lambda: defaultdict(list))
    for db_name, hits in hits_by_db.items():
        for hit in hits:
            label = f"{hit.gene}({hit.identity * 100:.1f}%)"
            for drug in hit.drugs or ["UNKNOWN"]:
                canon = canonical_drug(drug)
                if canon:
                    table[canon][db_name].append(label)
    return {drug: dict(dbs) for drug, dbs in table.items()}


def write_results_csv(path: str, merged: dict,
                      db_names: list[str]) -> None:
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["antibiotic"] + db_names)
        for drug in sorted(merged):
            row = [drug]
            for db in db_names:
                row.append(";".join(merged[drug].get(db, [])))
            writer.writerow(row)
