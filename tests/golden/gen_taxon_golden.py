#!/usr/bin/env python3
"""Generate taxon-math golden fixtures from the reference's OWN pandas code.

Imports /root/reference/bin/megapath_nano.py (align_list_to_best_align_list,
align_list_to_align_stat_by_assembly_id, summary_stat_2) and
lib/reassignment.py (Reassign) and records their outputs on synthetic
align_lists into tests/golden/taxon_golden.json. The repo's numpy
implementations (taxon/abundance.py, taxon/best_align.py, taxon/reassign.py)
are asserted equal to these fixtures by tests/test_taxon_parity.py.

The reference needs pybedtools + bioconvert at import time; neither is
installed here, and the only use on these code paths is interval
sort/merge/subtract with exact bedtools semantics, so minimal faithful
stubs are registered first. The pandas dataflow under test is entirely the
reference's own.

Run from the repo root:  python tests/golden/gen_taxon_golden.py
"""

import json
import os
import random
import sys
import tempfile
import types

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "taxon_golden.json")


# ---------------------------------------------------------------- stubs

class _StubBedTool:
    """Interval container with bedtools sort/merge/subtract semantics
    (merge joins overlapping AND bookended intervals per chrom; subtract
    removes overlapping portions of each a-interval)."""

    _registry: dict = {}          # fn -> stub (for annotate(files=fn))

    def __init__(self, arg=None, from_string=False, rows=None):
        if rows is not None:
            self.rows = rows
        elif from_string:
            self.rows = []
            for line in (arg or "").strip().splitlines():
                f = line.split()
                if len(f) >= 3:
                    self.rows.append((f[0], int(f[1]), int(f[2]),
                                      *f[3:4]))
        else:
            self.rows = []
        fd, self.fn = tempfile.mkstemp(prefix="stub_bed_")
        os.close(fd)
        _StubBedTool._registry[self.fn] = self

    @classmethod
    def from_dataframe(cls, df):
        rows = [tuple(r) for r in df.itertuples(index=False)]
        rows = [(str(r[0]), int(r[1]), int(r[2]), *r[3:])
                for r in rows]
        return cls(rows=rows)

    def annotate(self, files):
        """bedtools annotate: append the fraction of each interval covered
        by the (union of the) file's intervals on the same chrom."""
        other = _StubBedTool._registry[files]
        merged = other.merge()
        by_chrom: dict = {}
        for r in merged.rows:
            by_chrom.setdefault(r[0], []).append((r[1], r[2]))
        out = []
        for r in self.rows:
            chrom, s, e = r[0], int(r[1]), int(r[2])
            cov = 0
            for bs, be in by_chrom.get(chrom, []):
                cov += max(0, min(e, be) - max(s, bs))
            frac = cov / max(e - s, 1)
            out.append((*r, frac))
        return _StubBedTool(rows=out)

    def sort(self):
        return _StubBedTool(rows=sorted(self.rows,
                                        key=lambda r: (r[0], r[1], r[2])))

    def merge(self):
        out = []
        for chrom in sorted({r[0] for r in self.rows}):
            ivs = sorted((r[1], r[2]) for r in self.rows if r[0] == chrom)
            cs, ce = None, None
            for s, e in ivs:
                if cs is None:
                    cs, ce = s, e
                elif s <= ce:            # overlap or bookended
                    ce = max(ce, e)
                else:
                    out.append((chrom, cs, ce))
                    cs, ce = s, e
            if cs is not None:
                out.append((chrom, cs, ce))
        return _StubBedTool(rows=out)

    def subtract(self, other):
        by_chrom: dict = {}
        for r in other.rows:
            by_chrom.setdefault(r[0], []).append((r[1], r[2]))
        out = []
        for r in self.rows:
            chrom, s, e = r[0], r[1], r[2]
            extra = r[3:]
            pieces = [(s, e)]
            for bs, be in sorted(by_chrom.get(chrom, [])):
                nxt = []
                for ps, pe in pieces:
                    if be <= ps or bs >= pe:
                        nxt.append((ps, pe))
                        continue
                    if ps < bs:
                        nxt.append((ps, bs))
                    if be < pe:
                        nxt.append((be, pe))
                pieces = nxt
            out.extend((chrom, ps, pe, *extra) for ps, pe in pieces)
        return _StubBedTool(rows=out)

    def count(self):
        return len(self.rows)

    def to_dataframe(self):
        if not self.rows:
            return pd.DataFrame(columns=["chrom", "start", "end"])
        width = max(len(r) for r in self.rows)
        cols = ["chrom", "start", "end", "name", "score", "strand",
                "thickStart"][:width]
        return pd.DataFrame([r[:width] for r in self.rows], columns=cols)

    def __eq__(self, other):       # reference writes `noise_bed != None`
        return other is not None and self is other

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return id(self)


def _register_stubs():
    pbt = types.ModuleType("pybedtools")
    pbt_bed = types.ModuleType("pybedtools.bedtool")
    pbt.BedTool = _StubBedTool
    pbt_bed.BedTool = _StubBedTool
    pbt.bedtool = pbt_bed
    sys.modules["pybedtools"] = pbt
    sys.modules["pybedtools.bedtool"] = pbt_bed
    bc = types.ModuleType("bioconvert")
    bc_s2p = types.ModuleType("bioconvert.sam2paf")
    bc_s2p.SAM2PAF = object
    bc.sam2paf = bc_s2p
    sys.modules["bioconvert"] = bc
    sys.modules["bioconvert.sam2paf"] = bc_s2p


# ------------------------------------------------------- synthetic inputs

ASSEMBLIES = [  # assembly_id, length, tax, species, genus
    ("GCF_A1", 48_000, 711, 7001, 701),
    ("GCF_A2", 61_000, 712, 7001, 701),
    ("GCF_B1", 80_000, 721, 7002, 701),
    ("GCF_C1", 35_000, 731, 7003, 702),
]
SEQS = [  # sequence_id, length, assembly_id
    ("NC_A1a", 30_000, "GCF_A1"), ("NC_A1b", 18_000, "GCF_A1"),
    ("NC_A2a", 61_000, "GCF_A2"),
    ("NC_B1a", 50_000, "GCF_B1"), ("NC_B1b", 30_000, "GCF_B1"),
    ("NC_C1a", 35_000, "GCF_C1"),
]


def make_align_df(rng, n_reads=60, rows_per_read=(1, 4), unique_best=True):
    rows = []
    seq_by_asm = {}
    for sid, slen, aid in SEQS:
        seq_by_asm.setdefault(aid, []).append((sid, slen))
    asm_ids = [a[0] for a in ASSEMBLIES]
    for rid in range(n_reads):
        read_id = f"read{rid:04d}"
        read_len = int(rng.integers(500, 8000))
        n = int(rng.integers(rows_per_read[0], rows_per_read[1] + 1))
        chosen = rng.choice(len(asm_ids), size=n, replace=False)
        scores = rng.integers(100, 4000, size=n)
        if unique_best:
            scores = np.sort(scores)[::-1]
            scores[1:] = np.minimum(scores[1:], scores[0] - 1)
        for k, ci in enumerate(chosen):
            aid = asm_ids[ci]
            sid, slen = seq_by_asm[aid][
                int(rng.integers(0, len(seq_by_asm[aid])))]
            span = int(min(rng.integers(200, read_len + 1), slen - 1))
            sfrom = int(rng.integers(0, slen - span))
            score = int(scores[k])
            match = int(span * (0.8 + 0.15 * rng.random()))
            rows.append(dict(
                read_id=read_id, read_length=read_len,
                read_from=0, read_to=span,
                strand="+" if rng.random() < 0.5 else "-",
                sequence_id=sid, sequence_length=slen,
                sequence_from=sfrom, sequence_to=sfrom + span,
                match=match, mapq=60, edit_dist=span - match,
                alignment_score=score, assembly_id=aid,
                tax_id=0, species_tax_id=0, genus_tax_id=0,
                alignment_score_tiebreaker=float(rng.random())))
    df = pd.DataFrame(rows)
    tax = {a[0]: a[2:] for a in ASSEMBLIES}
    df["tax_id"] = df["assembly_id"].map(lambda a: tax[a][0])
    df["species_tax_id"] = df["assembly_id"].map(lambda a: tax[a][1])
    df["genus_tax_id"] = df["assembly_id"].map(lambda a: tax[a][2])
    return df


def make_metadata(tmpdir):
    with open(os.path.join(tmpdir, "assembly_length"), "w") as f:
        for aid, ln, *_ in ASSEMBLIES:
            f.write(f"{aid}\t{ln}\n")
    with open(os.path.join(tmpdir, "assembly_path"), "w") as f:
        for aid, *_ in ASSEMBLIES:
            f.write(f"{aid}\t/dev/null/{aid}.fna\n")
    with open(os.path.join(tmpdir, "assembly_tax_id"), "w") as f:
        for aid, _ln, t, s, g in ASSEMBLIES:
            f.write(f"{aid}\t{t}\t{s}\t{g}\t11\n")
    with open(os.path.join(tmpdir, "sequence_summary"), "w") as f:
        for sid, slen, aid in SEQS:
            f.write(f"{sid}\t{slen}\t{aid}\n")


def df_records(df, cols):
    out = []
    for r in df[cols].itertuples(index=False):
        out.append([x.item() if hasattr(x, "item") else x for x in r])
    return out


STAT_COLS = ["assembly_id", "total_number_of_read", "total_read_bp",
             "total_aligned_bp", "match", "edit_dist", "alignment_score",
             "assembly_length", "tax_id", "species_tax_id", "genus_tax_id",
             "covered_bp", "noise_span_bp", "average_read_length",
             "average_depth", "covered_percent", "noise_span_percent",
             "adjusted_covered_percent", "average_identity",
             "average_edit_dist", "average_alignment_score",
             "adjusted_average_depth", "adjusted_total_aligned_bp"]


def main():
    _register_stubs()
    sys.path.insert(0, "/root/reference/bin")
    import megapath_nano as ref

    class _Log:
        def print_missing_data(self, *a, **k):
            pass

        def print(self, *a, **k):
            pass

    tmpdir = tempfile.mkdtemp(prefix="taxon_golden_meta_")
    make_metadata(tmpdir)
    from lib.assembly_metadata import AssemblyMetadata
    meta = AssemblyMetadata(assembly_folder=tmpdir)
    log = _Log()

    fixtures = {"assemblies": [list(a) for a in ASSEMBLIES],
                "sequences": [list(s) for s in SEQS], "cases": {}}

    align_cols = list(make_align_df(np.random.default_rng(0)).columns)

    # Case A: unique-best align list, no noise — stat + best list
    rng = np.random.default_rng(101)
    df_a = make_align_df(rng, n_reads=80, unique_best=True)
    stat_a = ref.align_list_to_align_stat_by_assembly_id(
        assembly_metadata=meta, log=log, align_list=df_a)
    best_a = ref.align_list_to_best_align_list(
        assembly_metadata=meta, log=log, align_list=df_a)
    fixtures["cases"]["unique_no_noise"] = {
        "align_list": df_records(df_a, align_cols),
        "align_cols": align_cols,
        "stat": df_records(stat_a.sort_values("assembly_id"), STAT_COLS),
        "stat_cols": STAT_COLS,
        "best": df_records(
            best_a.sort_values("read_id"),
            ["read_id", "assembly_id", "sequence_id", "alignment_score"]),
    }

    # Case B: with a noise bed — adjusted columns exercise noise_span_bp
    noise_rows = [("GCF_A1,NC_A1a", 0, 12_000), ("GCF_B1,NC_B1a", 10_000,
                                                 30_000)]
    # reference noise beds are (sequence_id, start, end, assembly_id)
    noise_bed = _StubBedTool(rows=[
        (sid.split(",")[1], s, e, sid.split(",")[0])
        for sid, s, e in noise_rows])
    stat_b = ref.align_list_to_align_stat_by_assembly_id(
        assembly_metadata=meta, log=log, align_list=df_a,
        noise_bed=noise_bed)
    fixtures["cases"]["unique_with_noise"] = {
        "noise_bed": [[sid.split(",")[1], s, e, sid.split(",")[0]]
                      for sid, s, e in noise_rows],
        "stat": df_records(stat_b.sort_values("assembly_id"), STAT_COLS),
        "stat_cols": STAT_COLS,
    }

    # Case C: forced ties; random.random patched to 1.0 so the tie winner
    # is the max relative-abundance assembly (deterministic)
    rng = np.random.default_rng(202)
    df_c = make_align_df(rng, n_reads=70, unique_best=True)
    tie_rows = []
    for rid in range(70, 90):
        read_id = f"read{rid:04d}"
        score = int(rng.integers(500, 3000))
        for aid, sid, slen in [("GCF_A1", "NC_A1a", 30_000),
                               ("GCF_B1", "NC_B1a", 50_000)]:
            span = 1000
            sfrom = int(rng.integers(0, slen - span))
            tie_rows.append(dict(
                read_id=read_id, read_length=1200, read_from=0,
                read_to=span, strand="+", sequence_id=sid,
                sequence_length=slen, sequence_from=sfrom,
                sequence_to=sfrom + span, match=900, mapq=60,
                edit_dist=100, alignment_score=score, assembly_id=aid,
                tax_id=0, species_tax_id=0, genus_tax_id=0,
                alignment_score_tiebreaker=float(rng.random())))
    df_c = pd.concat([df_c, pd.DataFrame(tie_rows)], ignore_index=True)
    tax = {a[0]: a[2:] for a in ASSEMBLIES}
    df_c["tax_id"] = df_c["assembly_id"].map(lambda a: tax[a][0])
    df_c["species_tax_id"] = df_c["assembly_id"].map(lambda a: tax[a][1])
    df_c["genus_tax_id"] = df_c["assembly_id"].map(lambda a: tax[a][2])
    orig_random = random.random
    random.random = lambda: 1.0
    try:
        best_c = ref.align_list_to_best_align_list(
            assembly_metadata=meta, log=log, align_list=df_c)
    finally:
        random.random = orig_random
    fixtures["cases"]["tied_unit_random"] = {
        "align_list": df_records(df_c, align_cols),
        "align_cols": align_cols,
        "best": df_records(
            best_c.sort_values("read_id"),
            ["read_id", "assembly_id", "sequence_id", "alignment_score"]),
    }

    # Case D: reassignment (lib/reassignment.py Reassign). sequence_name
    # maps sequence -> "Genus species" binomial; species X explains Y.
    from lib.reassignment import Reassign
    seq_names = {
        "NC_A1a": "Escherichia coli strain K12",
        "NC_A1b": "Escherichia coli plasmid p1",
        "NC_A2a": "Escherichia coli strain O157",
        "NC_B1a": "Klebsiella pneumoniae strain X",
        "NC_B1b": "Klebsiella pneumoniae plasmid",
        "NC_C1a": "Proteus mirabilis strain Z",
    }
    rng = np.random.default_rng(303)
    rows = []
    # 60 reads solidly E. coli (40 unique to A + 20 shared A/B),
    # species B has NO unique reads -> A explains B
    for rid in range(40):
        rows.append(("u%03d" % rid, "NC_A1a", "GCF_A1",
                     int(rng.integers(1000, 3000))))
    for rid in range(40, 60):
        s = int(rng.integers(1000, 3000))
        rows.append(("m%03d" % rid, "NC_A1a", "GCF_A1", s))
        rows.append(("m%03d" % rid, "NC_B1a", "GCF_B1",
                     max(100, s - int(rng.integers(0, 200)))))
    # a couple of Proteus uniques to keep a third species present
    for rid in range(60, 70):
        rows.append(("p%03d" % rid, "NC_C1a", "GCF_C1",
                     int(rng.integers(800, 2000))))
    df_d = pd.DataFrame(rows, columns=["read_id", "sequence_id",
                                       "assembly_id", "alignment_score"])
    for col, val in [("read_length", 1500), ("read_from", 0),
                     ("read_to", 1000), ("strand", "+"),
                     ("sequence_length", 30000), ("sequence_from", 0),
                     ("sequence_to", 1000), ("match", 900), ("mapq", 60),
                     ("edit_dist", 100), ("tax_id", 0),
                     ("species_tax_id", 0), ("genus_tax_id", 0),
                     ("alignment_score_tiebreaker", 0.5)]:
        df_d[col] = val
    db_dir = tempfile.mkdtemp(prefix="taxon_golden_db_")
    with open(os.path.join(db_dir, "sequence_name"), "w") as f:
        for sid, name in seq_names.items():
            f.write(f"{sid}\t{name}\n")
    cwd = os.getcwd()
    work = tempfile.mkdtemp(prefix="taxon_golden_work_")
    os.chdir(work)            # Reassign writes pickle/csv into cwd
    # pandas>=3 wants tuple keys for get_group on list-of-one groupbys;
    # the reference passes scalars — shim for compatibility, not semantics
    from pandas.core.groupby.generic import DataFrameGroupBy
    orig_get_group = DataFrameGroupBy.get_group

    def _get_group(self, name, *a, **k):
        try:
            return orig_get_group(self, name, *a, **k)
        except KeyError:
            return orig_get_group(self, (name,), *a, **k)

    DataFrameGroupBy.get_group = _get_group
    try:
        out_d = Reassign(df_d.copy(), db_folder=db_dir, error_rate=0.05,
                         ratio=0.05, threads=2, AS_threshold=0.0)
    finally:
        DataFrameGroupBy.get_group = orig_get_group
        os.chdir(cwd)
    fixtures["cases"]["reassign"] = {
        "align_list": df_records(
            df_d, ["read_id", "sequence_id", "assembly_id",
                   "alignment_score"]),
        "sequence_names": seq_names,
        "result": df_records(
            out_d.sort_values(["read_id", "name"]),
            ["read_id", "name", "sequence_id", "alignment_score"]),
    }

    # Case E: select_alignment_by_bed — the overlap-fraction selection the
    # noise stack's ON-paths run through (steps 11/13/15 and the noise
    # statistics; reference :666-717, called at :2259 with max_overlap=50,
    # can_equal_to_max=True). The bed is crafted so alignment overlap
    # fractions land below / exactly AT / above the 50% gate, pinning the
    # boundary semantics (<= keeps).
    rng = np.random.default_rng(404)
    df_e = make_align_df(rng, n_reads=50, unique_best=True)
    sel_rows = [
        ("NC_A1a", 0, 6_000, "GCF_A1"),
        ("NC_A1a", 10_000, 18_000, "GCF_A1"),
        ("NC_A1b", 2_000, 7_000, "GCF_A1"),
        ("NC_A2a", 0, 40_000, "GCF_A2"),
        ("NC_B1a", 25_000, 26_000, "GCF_B1"),
    ]
    # plant alignments with exact fractions 0.5 and 0.25 against the first
    # noise interval [0, 6000) of NC_A1a
    exact_rows = []
    for i, (sfrom, sto) in enumerate([(4000, 8000),     # ov 2000/4000 = 0.5
                                      (5000, 9000),     # ov 1000/4000 = .25
                                      (1000, 5000),     # ov 4000/4000 = 1.0
                                      (5999, 9999)]):   # ov 1/4000
        exact_rows.append(dict(
            read_id=f"sel{i:02d}", read_length=4500, read_from=0,
            read_to=4000, strand="+", sequence_id="NC_A1a",
            sequence_length=30_000, sequence_from=sfrom, sequence_to=sto,
            match=3600, mapq=60, edit_dist=200, alignment_score=2000,
            assembly_id="GCF_A1", tax_id=0, species_tax_id=0,
            genus_tax_id=0, alignment_score_tiebreaker=0.5))
    df_e = pd.concat([df_e, pd.DataFrame(exact_rows)], ignore_index=True)
    sel_bed = _StubBedTool(rows=sel_rows)
    work_e = tempfile.mkdtemp(prefix="taxon_golden_sel_")
    kept_e = ref.select_alignment_by_bed(
        temp_dir_name=work_e, align_list=df_e, bed=sel_bed,
        max_overlap=50, can_equal_to_max=True)
    # the inverse selection (> 50%) — the noise statistics' noise set
    noise_e = ref.select_alignment_by_bed(
        temp_dir_name=work_e, align_list=df_e, bed=sel_bed,
        max_overlap=100, can_equal_to_max=True, min_overlap=50,
        can_equal_to_min=False)
    key_cols = ["read_id", "sequence_id", "sequence_from", "sequence_to"]
    fixtures["cases"]["noise_select"] = {
        "align_list": df_records(df_e, align_cols),
        "align_cols": align_cols,
        "noise_bed": [list(r) for r in sel_rows],
        "max_overlap": 50,
        "kept": df_records(
            kept_e.sort_values(key_cols), key_cols),
        "noise": df_records(
            noise_e.sort_values(key_cols), key_cols),
    }

    with open(OUT, "w") as f:
        json.dump(fixtures, f, indent=1)
    print(f"wrote {OUT}")
    for name, case in fixtures["cases"].items():
        keys = {k: (len(v) if isinstance(v, list) else "-")
                for k, v in case.items()}
        print(f"  {name}: {keys}")


if __name__ == "__main__":
    main()
