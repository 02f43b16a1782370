"""Steps 4-7: placement-to-assembly, assembly selection, align-assembly-set,
raw stat (reference megapath_nano.py:1313-1567), wired through
TaxonProfiler.profile behind the --assembly_selection gate (off by default,
:4987)."""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.assembly_selection import (
    good_align_list, run_assembly_selection)
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def _worlds(seed=21, glen=15000):
    """Species set: one representative per species. Assembly set: a second
    assembly per species; species 7001's alternative is an exact copy of
    the read source, the representative is a diverged mutant."""
    rng = np.random.default_rng(seed)
    true_genome = random_sequence(rng, glen)       # species 7001, strain B
    repr_genome = mutate(rng, true_genome, sub_rate=0.12, ins_rate=0.02,
                         del_rate=0.02)            # species 7001, strain A
    other_genome = random_sequence(rng, glen)      # species 7002 repr
    other_alt = mutate(rng, other_genome, sub_rate=0.01, ins_rate=0.0,
                       del_rate=0.0)               # species 7002 alt
    main_db = RefDB.build(
        [repr_genome, other_genome], ["spA_repr", "spB_repr"], [0, 1],
        ["asmA1", "asmB1"], [(71, 7001, 701), (72, 7002, 701)])
    assembly_db = RefDB.build(
        [true_genome, other_alt], ["spA_alt", "spB_alt"], [0, 1],
        ["asmA2", "asmB2"], [(73, 7001, 701), (74, 7002, 701)])
    reads = []
    for _ in range(30):
        s = int(rng.integers(0, glen - 1500))
        reads.append(mutate(rng, true_genome[s:s + 1200], sub_rate=0.03,
                            ins_rate=0.015, del_rate=0.015))
    return main_db, assembly_db, reads


def test_good_align_list_ratio():
    from megapath_nano_tpu.align.records import ALIGN_DTYPE, AlignList
    d = np.zeros(3, ALIGN_DTYPE)
    d["read_id"] = [0, 0, 1]
    d["alignment_score"] = [100, 79, 50]
    al = AlignList(d)
    out = good_align_list(al, 0.8)
    assert len(out) == 2  # 79 < 0.8*100 dropped; 50 is read 1's best


def test_run_assembly_selection_picks_true_strain():
    main_db, assembly_db, reads = _worlds()
    prof = TaxonProfiler(main_db, ProfileOptions(
        emit_cigars=False, align=AlignParams(backend="jnp")))
    species_align = prof.aligner.map_reads(reads, emit_cigars=False)
    assert len(species_align), "reads must map to the diverged representative"
    res = run_assembly_selection(reads, species_align, main_db, assembly_db,
                                 min_average_depth=0.5,
                                 align_params=AlignParams(backend="jnp"))
    # species 7001 must choose the assembly-set strain (exact source)
    assert 7001 in res.assembly_list
    chosen = res.assembly_list[7001]
    assert res.assembly_names[chosen] == "asmA2"
    # the merged list must contain alignments to the chosen new assembly
    asm_ids = set(int(a) for a in res.align_list.data["assembly_id"])
    assert chosen in asm_ids
    # candidate count covers both species' alternative assemblies
    assert res.n_assembly_candidates >= 1
    # best list: one row per read
    rids = res.best_align_list.data["read_id"]
    assert len(rids) == len(np.unique(rids))


def test_profiler_gate_off_keeps_align_list_and_selects_from_species_set():
    main_db, assembly_db, reads = _worlds()
    prof = TaxonProfiler(main_db, ProfileOptions(emit_cigars=False,
                       align=AlignParams(backend="jnp")),
                         assembly_db=assembly_db)
    res = prof.profile(reads)
    # gate off: no assembly-set ids may appear
    if len(res.align_list):
        assert res.align_list.data["assembly_id"].max() < 2
    # off branch still picks a per-species assembly from species-set stats
    assert res.selected_assembly_list.get(7001) == 0
    assert res.assembly_names == ["asmA1", "asmB1"]


@pytest.mark.slow
def test_profiler_gate_on_runs_steps_4_to_7():
    main_db, assembly_db, reads = _worlds()
    prof = TaxonProfiler(
        main_db,
        ProfileOptions(emit_cigars=False, assembly_selection=True,
                       align=AlignParams(backend="jnp")),
        assembly_db=assembly_db)
    res = prof.profile(reads)
    # step 5 chose the exact-match strain from the assembly set
    assert res.selected_assembly_list.get(7001) == 2  # asmA2 appended at 2
    assert res.assembly_names[2] == "asmA2"
    # step 6 merged list aligns reads against the chosen assembly
    asm_of_best = set(int(a) for a in res.best.data["assembly_id"])
    assert 2 in asm_of_best
    # step 7 raw stat exists and covers the chosen assembly
    assert res.raw_stat is not None and len(res.raw_stat)
    assert 2 in set(int(a) for a in res.raw_stat["assembly_id"])
    # abundance table attributes the species to the chosen strain
    top = res.stat[np.argmax(res.stat["total_number_of_read"])]
    assert int(top["assembly_id"]) == 2
    assert int(top["species_tax_id"]) == 7001


def test_write_reports_includes_raw_stat_and_selection(tmp_path):
    main_db, assembly_db, reads = _worlds()
    prof = TaxonProfiler(
        main_db,
        ProfileOptions(emit_cigars=False, assembly_selection=True,
                       align=AlignParams(backend="jnp")),
        assembly_db=assembly_db)
    res = prof.profile(reads)
    paths = prof.write_reports(res, str(tmp_path), prefix="t")
    assert "raw_stat" in paths
    body = open(paths["raw_stat"]).read()
    assert "asmA2" in body
    sel = open(paths["assembly_selection"]).read()
    assert "7001\tasmA2" in sel
