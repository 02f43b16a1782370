"""AMR gene databases: sequences + (gene, drug/class) metadata.

The reference scans consensus sequences with five external tools/DBs —
ResFinder, RGI/CARD, AMRFinder, BLASTn vs MEGARes, BLASTn/p vs CBMAR
(reference: bin/megapath_nano_amr.py:48-70). The framework models each as an
AMRGeneDB (gene FASTA + per-gene drug annotations) scanned by the same
minimizer/DP engine, reproducing their database matching with identity and
coverage thresholds (90% / 60%, megapath_nano_amr.py:246-247).

Loaders parse the common public header formats; synthetic DBs are used in
tests. prepare scripts live in db_preparation (megapath_nano_tpu/db/).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from megapath_nano_tpu.index.minimizer import MinimizerIndex


@dataclass
class AMRGeneDB:
    name: str                              # e.g. "resfinder", "card"
    gene_names: list[str]
    sequences: list[np.ndarray]
    drugs: list[list[str]]                 # per gene: associated drug names
    classes: list[str] = field(default_factory=list)  # per gene drug class
    _index: MinimizerIndex | None = None

    def index(self, *, k: int = 15, w: int = 5) -> MinimizerIndex:
        if self._index is None:
            self._index = MinimizerIndex.build(self.sequences,
                                               self.gene_names, k=k, w=w)
        return self._index

    @staticmethod
    def from_fasta(name: str, path: str,
                   header_parser=None) -> "AMRGeneDB":
        """Load genes from FASTA; header_parser(header) -> (gene, [drugs]).
        Default parser: resfinder-style `gene_variant_accession` headers with
        no drug info (drugs attached via a phenotype table)."""
        from megapath_nano_tpu.io.fastq import read_fastq

        batch = read_fastq(path)
        genes, seqs = [], []
        for i in range(batch.num_reads):
            genes.append(batch.ids[i])
            seqs.append(batch.read(i))
        if header_parser:
            parsed = [header_parser(g) for g in genes]
            gene_names = [p[0] for p in parsed]
            drugs = [p[1] for p in parsed]
        else:
            gene_names = genes
            drugs = [[] for _ in genes]
        return AMRGeneDB(name, gene_names, seqs, drugs)

    def save(self, path: str) -> None:
        import json
        import os

        import numpy as np_

        os.makedirs(path, exist_ok=True)
        flat = (np_.concatenate(self.sequences) if self.sequences
                else np_.zeros(0, np_.int8))
        offsets = np_.zeros(len(self.sequences) + 1, np_.int64)
        np_.cumsum([len(s) for s in self.sequences], out=offsets[1:])
        np_.savez_compressed(os.path.join(path, "amrdb.npz"),
                             seq=flat, offsets=offsets)
        with open(os.path.join(path, "amrdb.json"), "w") as f:
            json.dump({"name": self.name, "gene_names": self.gene_names,
                       "drugs": self.drugs, "classes": self.classes}, f)

    @staticmethod
    def load(path: str) -> "AMRGeneDB":
        import json
        import os

        import numpy as np_

        z = np_.load(os.path.join(path, "amrdb.npz"))
        with open(os.path.join(path, "amrdb.json")) as f:
            meta = json.load(f)
        seqs = [z["seq"][s:e] for s, e in zip(z["offsets"][:-1],
                                              z["offsets"][1:])]
        return AMRGeneDB(meta["name"], meta["gene_names"], seqs,
                         meta["drugs"], meta.get("classes", []))

    def attach_phenotypes(self, table: dict[str, list[str]]) -> None:
        """Attach drug lists by gene-name lookup (ResFinder phenotype.txt
        style)."""
        for i, g in enumerate(self.gene_names):
            base = g.split("_")[0]
            self.drugs[i] = table.get(g, table.get(base, self.drugs[i]))


_CANON_STRIP = re.compile(r"s?\b")


def canonical_drug(name: str) -> str:
    """Drug-name canonicalization matching the reference
    (megapath_nano_amr.py:99-107): strip trailing plural 's', drop the word
    'antibiotic', uppercase, trim whitespace."""
    x = name.strip()
    x = re.sub(r"\bantibiotics?\b", "", x, flags=re.I)
    x = x.strip().rstrip(";,")
    if x.lower().endswith("s") and not x.lower().endswith("ss"):
        x = x[:-1]
    return x.upper().strip()
