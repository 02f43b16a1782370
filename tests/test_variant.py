"""Variant subsystem: candidate extraction finds implanted SNVs, the model
learns to separate het/hom on synthetic tensors, ensemble math, VCF output."""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence
from megapath_nano_tpu.variant.candidates import (POSITIONS, ROWS, CHANNELS,
                                                  candidate_tensor,
                                                  extract_candidates)
from megapath_nano_tpu.variant.ensemble import ensemble_merge
from megapath_nano_tpu.variant.caller import call_variants, write_vcf
from megapath_nano_tpu.variant.model import (VariantModel,
                                             gt21_label_for_snv)


@pytest.fixture(scope="module")
def snv_world():
    rng = np.random.default_rng(0)
    ref = random_sequence(rng, 8000)
    donor = ref.copy()
    snv_positions = [1500, 3000, 4500, 6000]
    for p in snv_positions:
        donor[p] = (donor[p] + 1 + rng.integers(0, 3)) % 4
    refdb = RefDB.build([ref], ["chr1"], [0], ["ref"], [(1, 1, 1)])
    reads = []
    for _ in range(100):
        s = int(rng.integers(0, 7200))
        reads.append(mutate(rng, donor[s: s + 800], sub_rate=0.01,
                            ins_rate=0.005, del_rate=0.005))
    prof = TaxonProfiler(refdb, ProfileOptions(align=AlignParams(backend="jnp")))
    res = prof.profile(reads)
    return rng, ref, donor, snv_positions, reads, res


def test_candidates_find_snvs(snv_world):
    rng, ref, donor, snvs, reads, res = snv_world
    cands = extract_candidates(res.best, reads, 0, ref, min_af=0.25,
                               min_depth=4)
    found = {c.position for c in cands}
    for p in snvs:
        assert any(abs(p - f) <= 1 for f in found), f"SNV at {p} missed"
    # sequencing errors at 1% shouldn't bury us in false candidates
    assert len(cands) < 40
    t = candidate_tensor(cands[0], ref)
    assert t.shape == (POSITIONS, ROWS, CHANNELS)
    assert np.isfinite(t).all() and t.max() <= 1.0 + 1e-6


def test_model_learns_synthetic_separation():
    rng = np.random.default_rng(1)
    n = 256
    x = rng.random((n, POSITIONS, ROWS, CHANNELS)).astype(np.float32) * 0.1
    zyg = rng.integers(0, 3, n)
    # plant a strong signal for the zygosity label in row 7
    for i in range(n):
        x[i, POSITIONS // 2, 7, 0] = [0.02, 0.5, 0.95][zyg[i]]
    labels = {
        "gt21": rng.integers(0, 10, n),
        "zygosity": zyg,
        "var_len_1": np.zeros(n, np.int64),
        "var_len_2": np.zeros(n, np.int64),
    }
    for i in range(n):
        x[i, 0, 0, 0] = labels["gt21"][i] / 10.0  # learnable gt21 signal
    model = VariantModel(seed=0, hidden=32)
    first = model.train_step(x, labels)
    last = model.train_steps(x, labels, 150)
    assert last < first * 0.5, (first, last)
    probs = model.predict(x)
    acc = (np.argmax(probs["zygosity"], axis=1) == zyg).mean()
    assert acc > 0.9, acc


def test_ensemble_majority_vote():
    key = (0, 100)
    a = {key: {"zygosity": np.array([0.9, 0.1, 0.0])}}
    b = {key: {"zygosity": np.array([0.1, 0.9, 0.0])}}
    c = {(0, 200): {"zygosity": np.array([0.0, 1.0, 0.0])}}
    merged = ensemble_merge([a, b, c], min_votes=2)
    assert key in merged
    assert (0, 200) not in merged          # only 1 vote
    np.testing.assert_allclose(merged[key]["zygosity"], [0.5, 0.5, 0.0])


def test_end_to_end_calling_with_trained_model(snv_world, tmp_path):
    rng, ref, donor, snvs, reads, res = snv_world
    # train a tiny model on tensors labeled from truth: hom-alt at SNVs,
    # hom-ref elsewhere
    cands = extract_candidates(res.best, reads, 0, ref, min_af=0.10,
                               min_depth=4, min_alt_count=2)
    x = np.stack([candidate_tensor(c, ref) for c in cands]).astype(np.float32)
    is_snv = np.array([any(abs(c.position - p) <= 1 for p in snvs)
                       for c in cands])
    labels = {
        "gt21": np.array([
            gt21_label_for_snv(c.ref_base, int(donor[c.position]) % 4, False)
            if s else gt21_label_for_snv(c.ref_base, c.ref_base, False)
            for c, s in zip(cands, is_snv)]),
        "zygosity": np.where(is_snv, 2, 0),
        "var_len_1": np.zeros(len(cands), np.int64),
        "var_len_2": np.zeros(len(cands), np.int64),
    }
    model = VariantModel(seed=2, hidden=32)
    model.train_steps(x, labels, 300)

    calls = call_variants(res.best, reads, 0, ref, [model], min_af=0.10)
    called = {c.position for c in calls}
    for p in snvs:
        assert any(abs(p - q) <= 1 for q in called), f"SNV {p} not called"
    # writes syntactically plausible VCF
    vcf = tmp_path / "out.vcf"
    write_vcf(str(vcf), calls, ["chr1"])
    lines = open(vcf).read().splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == len(calls)
    assert all(len(l.split("\t")) == 10 for l in body)


def test_overlap_variant_filter_reference_semantics():
    """Overlap-variant post-filter (reference clair/post_processing/
    overlap_variant.py, invoked runClair-ensemble.sh:219-224): a deletion
    span covering the next variant's start conflicts; higher quality wins,
    ties keep the later call; SNVs at distinct positions never conflict."""
    from megapath_nano_tpu.variant.overlap import (
        filter_overlapping_calls, filter_overlapping_records)

    # record level: (chrom, pos1, ref, [alts], qual)
    # deletion ACGT->A at pos 100 spans [99, 103); SNP at 102 conflicts
    recs = [("c", 100, "ACGT", ["A"], 30.0),
            ("c", 103, "G", ["T"], 20.0)]
    assert filter_overlapping_records(recs) == [recs[0]]
    # higher-quality later variant wins
    recs2 = [("c", 100, "ACGT", ["A"], 10.0),
             ("c", 103, "G", ["T"], 20.0)]
    assert filter_overlapping_records(recs2) == [recs2[1]]
    # tie keeps the later call (reference variant_to_output_for)
    recs3 = [("c", 100, "ACGT", ["A"], 20.0),
             ("c", 103, "G", ["T"], 20.0)]
    assert filter_overlapping_records(recs3) == [recs3[1]]
    # beyond the deletion span: both survive
    recs4 = [("c", 100, "ACGT", ["A"], 30.0),
             ("c", 104, "G", ["T"], 20.0)]
    assert filter_overlapping_records(recs4) == recs4
    # deletion vs deletion conflict
    recs5 = [("c", 100, "ACGT", ["A"], 30.0),
             ("c", 102, "GTA", ["G"], 40.0)]
    assert filter_overlapping_records(recs5) == [recs5[1]]
    # pure SNVs at different positions: no-op
    recs6 = [("c", 100, "A", ["G"], 5.0), ("c", 101, "C", ["T"], 6.0)]
    assert filter_overlapping_records(recs6) == recs6
    # different chromosomes never conflict
    recs7 = [("c1", 100, "ACGT", ["A"], 30.0),
             ("c2", 101, "G", ["T"], 1.0)]
    assert filter_overlapping_records(recs7) == recs7

    # call-level wrapper: SNV-only sets pass through unchanged
    from megapath_nano_tpu.variant.caller import VariantCall

    calls = [VariantCall(0, 10, 1, "A", "1/1", 30.0, 20, 0.9),
             VariantCall(0, 11, 2, "T", "0/1", 25.0, 18, 0.4)]
    assert filter_overlapping_calls(calls) == calls
