"""Adapter trimming (porechop-equivalent step 0)."""

import numpy as np

from megapath_nano_tpu.io.adapters import (DEFAULT_ADAPTERS, Adapter,
                                           trim_adapters)
from megapath_nano_tpu.utils.dna import decode, encode, random_sequence

LSK = DEFAULT_ADAPTERS[0]


def _mk(rng, n=800):
    return random_sequence(rng, n)


def test_start_adapter_trimmed():
    rng = np.random.default_rng(0)
    body = _mk(rng)
    read = np.concatenate([encode(LSK.start_seq), body])
    res = trim_adapters([read], ["r0"])
    assert res.n_start_trimmed == 1
    assert len(res.reads) == 1
    # trimmed read is the body minus the extra_end_trim margin
    assert abs(len(res.reads[0]) - len(body)) <= 4
    assert np.array_equal(res.reads[0][10:50], body[12:52]) or \
        np.array_equal(res.reads[0], body[2:])


def test_end_adapter_trimmed():
    rng = np.random.default_rng(1)
    body = _mk(rng)
    read = np.concatenate([body, encode(LSK.end_seq)])
    res = trim_adapters([read], ["r0"])
    assert res.n_end_trimmed == 1
    assert len(res.reads[0]) <= len(body)
    assert len(res.reads[0]) >= len(body) - 4


def test_middle_adapter_splits():
    rng = np.random.default_rng(2)
    a, b = _mk(rng, 700), _mk(rng, 700)
    read = np.concatenate([a, encode(LSK.start_seq), b])
    res = trim_adapters([read], ["chimera"])
    assert res.n_split == 1
    assert len(res.reads) == 2
    assert res.names == ["chimera_1", "chimera_2"]
    assert (res.source == 0).all()
    assert len(res.reads[0]) <= len(a) and len(res.reads[1]) <= len(b)
    assert len(res.reads[0]) >= len(a) - 20


def test_clean_reads_untouched():
    rng = np.random.default_rng(3)
    reads = [_mk(rng) for _ in range(20)]
    res = trim_adapters(reads)
    assert res.n_start_trimmed == res.n_end_trimmed == res.n_split == 0
    assert len(res.reads) == 20
    for a, b in zip(res.reads, reads):
        assert np.array_equal(a, b)


def test_mutated_adapter_still_found():
    # 2 substitutions on the 28-mer (~7%): scaled score 78.6 >= 75 threshold
    rng = np.random.default_rng(4)
    adapter = encode(LSK.start_seq).copy()
    for i in (5, 19):
        adapter[i] = (adapter[i] + 1) % 4
    read = np.concatenate([adapter, _mk(rng)])
    res = trim_adapters([read], ["r0"])
    assert res.n_start_trimmed == 1


def test_custom_adapter_and_short_split_drop():
    rng = np.random.default_rng(5)
    custom = Adapter("X", start_seq="ACGTACGTACGTACGTACGTACGTAC")
    a, b = _mk(rng, 400), _mk(rng, 700)   # left part too short to keep
    read = np.concatenate([a, encode(custom.start_seq), b])
    res = trim_adapters([read], ["r"], adapters=(custom,),
                        min_split_size=500)
    assert res.n_split == 1
    assert len(res.reads) == 1 and res.names == ["r_2"]
    assert res.n_dropped == 1
