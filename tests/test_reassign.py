"""Reassignment: a spurious species with no unique support gets absorbed by
the dominant species sharing its reads."""

import numpy as np

from megapath_nano_tpu.align.records import ALIGN_DTYPE, AlignList
from megapath_nano_tpu.taxon.reassign import reassign


def _mk(rows):
    """rows: (read_id, species, score)"""
    d = np.zeros(len(rows), ALIGN_DTYPE)
    for i, (rid, sp, score) in enumerate(rows):
        d[i]["read_id"] = rid
        d[i]["read_length"] = 500
        d[i]["species_tax_id"] = sp
        d[i]["alignment_score"] = score
        d[i]["sequence_id"] = sp
        d[i]["assembly_id"] = sp
    return AlignList(d, [], [], [])


def test_spurious_species_absorbed():
    rows = []
    # species 100: 50 unique reads
    for r in range(50):
        rows.append((r, 100, 900))
    # 10 shared reads hit both 100 and 200; species 200 has NO unique reads
    for r in range(50, 60):
        rows.append((r, 100, 900))
        rows.append((r, 200, 850))
    res = reassign(_mk(rows))
    assert 100 in res.explains and 200 in res.explains[100]
    # the species-200 rows of shared reads were relabeled to 100
    relabeled = res.align_list.data[res.reassigned_mask]
    assert len(relabeled) == 10
    assert (relabeled["species_tax_id"] == 100).all()
    # nothing else changed
    assert (res.align_list.data["species_tax_id"] != 200).all()


def test_real_species_not_absorbed():
    rows = []
    # two real species, each with solid unique support, sharing a few reads
    for r in range(40):
        rows.append((r, 100, 900))
    for r in range(40, 80):
        rows.append((r, 200, 900))
    for r in range(80, 85):
        rows.append((r, 100, 880))
        rows.append((r, 200, 870))
    res = reassign(_mk(rows))
    # neither explains the other: both have ample unique counts
    assert 200 not in res.explains.get(100, set())
    assert 100 not in res.explains.get(200, set())
    assert not res.reassigned_mask.any()


def test_as_threshold_blocks_low_scores():
    rows = []
    for r in range(50):
        rows.append((r, 100, 900))
    for r in range(50, 60):
        rows.append((r, 100, 100))    # i's score is LOW on shared reads
        rows.append((r, 200, 850))
    res = reassign(_mk(rows), as_threshold=0.5)
    # AS_i (100) < 0.5 * AS_j (425) → reassignment blocked
    assert not res.reassigned_mask.any()


def test_empty():
    res = reassign(AlignList(np.zeros(0, ALIGN_DTYPE), [], [], []))
    assert len(res.align_list) == 0
