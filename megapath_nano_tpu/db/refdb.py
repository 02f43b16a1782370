"""Reference database: target genomes + assembly/taxonomy metadata + index.

The framework's equivalent of the reference's genomes/ + db/ layout
(reference: bin/lib/assembly_metadata.py:107-222 loads assembly_length,
assembly_path, assembly_tax_id, sequence_summary flat files; db_preparation/
builds them from RefSeq). Here a RefDB bundles:

  - numeric target sequences (concatenated + offsets)
  - per-sequence: name, assembly index
  - per-assembly: name, length, tax_id, species_tax_id, genus_tax_id
  - tax_id -> name table
  - the minimizer index over all sequences

Persistence is a directory of .npz + .json — cheap to build from FASTA with
`RefDB.build`, no SQLite required (name lookups are in-memory dicts).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from megapath_nano_tpu.align.pipeline import SequenceMeta
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.taxon.abundance import AssemblyInfo


@dataclass
class RefDB:
    index: MinimizerIndex
    seq_assembly: np.ndarray          # (n_seqs,) int32 → assembly idx
    assembly_names: list[str]
    assembly_lengths: np.ndarray      # (n_assemblies,) int64
    assembly_tax: np.ndarray          # (n_assemblies, 3) int64 tax/species/genus
    tax_names: dict[int, str] = field(default_factory=dict)

    @property
    def assembly_info(self) -> AssemblyInfo:
        return AssemblyInfo(
            length=self.assembly_lengths,
            tax_id=self.assembly_tax[:, 0],
            species_tax_id=self.assembly_tax[:, 1],
            genus_tax_id=self.assembly_tax[:, 2],
        )

    @property
    def sequence_meta(self) -> SequenceMeta:
        sa = self.seq_assembly
        return SequenceMeta(
            assembly_idx=sa,
            assembly_names=self.assembly_names,
            tax_id=self.assembly_tax[sa, 0],
            species_tax_id=self.assembly_tax[sa, 1],
            genus_tax_id=self.assembly_tax[sa, 2],
        )

    @staticmethod
    def build(
        sequences: list[np.ndarray],
        seq_names: list[str],
        seq_assembly: list[int],
        assembly_names: list[str],
        assembly_tax: list[tuple[int, int, int]],
        tax_names: dict[int, str] | None = None,
        *,
        k: int = 15,
        w: int = 10,
    ) -> "RefDB":
        index = MinimizerIndex.build(sequences, seq_names, k=k, w=w)
        sa = np.asarray(seq_assembly, np.int32)
        n_asm = len(assembly_names)
        lengths = np.zeros(n_asm, np.int64)
        for i, s in enumerate(sequences):
            lengths[sa[i]] += len(s)
        return RefDB(
            index=index,
            seq_assembly=sa,
            assembly_names=list(assembly_names),
            assembly_lengths=lengths,
            assembly_tax=np.asarray(assembly_tax, np.int64).reshape(n_asm, 3),
            tax_names=tax_names or {},
        )

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        idx = self.index
        np.savez_compressed(
            os.path.join(path, "refdb.npz"),
            keys=idx.keys, positions=idx.positions,
            seq_lengths=idx.seq_lengths, seq_data=idx.seq_data,
            seq_offsets=idx.seq_offsets, seq_assembly=self.seq_assembly,
            assembly_lengths=self.assembly_lengths,
            assembly_tax=self.assembly_tax,
        )
        with open(os.path.join(path, "refdb.json"), "w") as f:
            json.dump({
                "k": idx.k, "w": idx.w,
                "seq_names": idx.seq_names,
                "assembly_names": self.assembly_names,
                "tax_names": {str(k): v for k, v in self.tax_names.items()},
            }, f)

    @staticmethod
    def load(path: str) -> "RefDB":
        z = np.load(os.path.join(path, "refdb.npz"))
        with open(os.path.join(path, "refdb.json")) as f:
            meta = json.load(f)
        index = MinimizerIndex(
            k=meta["k"], w=meta["w"], keys=z["keys"],
            positions=z["positions"], seq_lengths=z["seq_lengths"],
            seq_names=meta["seq_names"], seq_data=z["seq_data"],
            seq_offsets=z["seq_offsets"])
        return RefDB(
            index=index, seq_assembly=z["seq_assembly"],
            assembly_names=meta["assembly_names"],
            assembly_lengths=z["assembly_lengths"],
            assembly_tax=z["assembly_tax"],
            tax_names={int(k): v for k, v in meta["tax_names"].items()},
        )
