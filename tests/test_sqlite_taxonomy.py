"""SQLite taxonomy DB: reference ncbi_taxonomy.db schema parity
(build + chunked-IN queries, megapath_nano.py:783-915 semantics)."""

import sqlite3

from megapath_nano_tpu.db.sqlite_taxonomy import TaxonomyDB, build_taxonomy_db
from megapath_nano_tpu.db.taxdump import Taxonomy


def _toy_taxonomy():
    # 1 root ← 1224 phylum ← 561 genus ← 562 species ← 83333 strain
    parent = {1: 1, 1224: 1, 561: 1224, 562: 561, 83333: 562,
              570: 1224, 573: 570}
    rank = {1: "no rank", 1224: "phylum", 561: "genus", 562: "species",
            83333: "strain", 570: "genus", 573: "species"}
    names = {1: "root", 1224: "Proteobacteria", 561: "Escherichia",
             562: "Escherichia coli", 83333: "Escherichia coli K-12",
             570: "Klebsiella", 573: "Klebsiella pneumoniae"}
    return Taxonomy(parent, rank, names)


def test_build_and_query(tmp_path):
    db_path = str(tmp_path / "ncbi_taxonomy.db")
    rows = [
        {"accession": "GCF_000005845.2", "tax_id": 83333,
         "species_tax_id": 562, "organism_name": "Escherichia coli K-12",
         "assembly_level": "Complete Genome", "ftp_path": "ftp://x"},
        {"accession": "GCF_000240185.1", "tax_id": 573,
         "species_tax_id": 573, "organism_name": "Klebsiella pneumoniae"},
    ]
    build_taxonomy_db(db_path, taxonomy=_toy_taxonomy(), assembly_rows=rows,
                      sequence_names={"NC_000913.3": "E. coli K-12 chrom",
                                      "NC_016845.1": "K. pneumoniae chrom"})
    db = TaxonomyDB.open(db_path)
    assert db.get_tax_names([562, 573]) == {
        562: "Escherichia coli", 573: "Klebsiella pneumoniae"}
    assert db.get_sequence_names(["NC_000913.3"]) == {
        "NC_000913.3": "E. coli K-12 chrom"}
    info = db.get_assembly_info(["GCF_000005845.2"])
    assert info == [{"assembly_id": "GCF_000005845.2", "tax_id": 83333,
                     "species_tax_id": 562,
                     "organism_name": "Escherichia coli K-12"}]
    assert db.species_lineage(83333) == [83333, 562, 561, 1224, 1]
    db.close()


def test_reference_schema_tables(tmp_path):
    """All six reference tables exist with the reference's column names."""
    db_path = str(tmp_path / "t.db")
    build_taxonomy_db(db_path, taxonomy=_toy_taxonomy())
    conn = sqlite3.connect(db_path)
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"assembly_summary", "sequence_name", "ranks", "names", "nodes",
            "source"} <= tables
    cols = [r[1] for r in conn.execute("PRAGMA table_info(assembly_summary)")]
    assert cols[:8] == ["assembly_id", "bioproject", "biosample",
                        "wgs_master", "refseq_category", "taxid",
                        "species_taxid", "organism_name"]
    # ranks mirror the genAssemblyMetadata height ladder (genus=11 species=4)
    h = dict(conn.execute("SELECT rank, height FROM ranks"))
    assert h["genus"] == 11 and h["species"] == 4
    conn.close()


def test_chunked_in_over_999(tmp_path):
    """IN-lists above SQLite's 999-variable limit are transparently
    chunked (read_db parity, megapath_nano.py:789)."""
    db_path = str(tmp_path / "big.db")
    parent = {i: 1 for i in range(2, 1502)}
    parent[1] = 1
    rank = {i: "species" for i in parent}
    names = {i: f"sp{i}" for i in parent}
    build_taxonomy_db(db_path, taxonomy=Taxonomy(parent, rank, names))
    db = TaxonomyDB.open(db_path)
    got = db.get_tax_names(range(2, 1502))
    assert len(got) == 1500
    assert got[700] == "sp700"
    db.close()
