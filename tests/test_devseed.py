"""Device-seeded fused dispatch: exactness vs the host-seeded path.

The devseed path (align/device_seed.py) moves sketching + hash lookup +
anchor grouping on-device so only 2-bit packed reads cross the link. It is
the default (AlignParams.device_seed — see docs/PERF.md) but must stay
output-identical to the host-seeded fused path, including when a static cap
overflows: every cap truncates a read-id-major suffix, the counts row
carries the minimum affected read id, and ONLY that suffix re-runs through
the exact host-seeded path (partial redo).
"""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp

COLS = ("read_id", "read_length", "read_from", "read_to", "strand",
        "sequence_id", "sequence_from", "sequence_to", "match", "edit_dist",
        "alignment_score", "mapq", "assembly_id", "tax_id")


def _world(seed=5, n_genomes=4, glen=25000, n_reads=96, read_len=700):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, glen) for _ in range(n_genomes)]
    index = MinimizerIndex.build(genomes,
                                 [f"g{i}" for i in range(n_genomes)])
    reads = []
    for _ in range(n_reads):
        g = int(rng.integers(0, n_genomes))
        s = int(rng.integers(0, glen - read_len))
        read = mutate(rng, genomes[g][s: s + read_len], sub_rate=0.04,
                      ins_rate=0.02, del_rate=0.02)
        if rng.integers(0, 2):
            read = revcomp(read)
        reads.append(read)
    return index, reads


def _map(index, reads, device_seed, slice_size=None, **kw):
    params = AlignParams(backend="jnp", device_seed=device_seed, **kw)
    aligner = MinimizerAligner(index, params=params)
    return aligner.map_reads(reads, emit_cigars=False, slice_size=slice_size)


def _assert_equal(a, b):
    assert len(a) == len(b)
    for col in COLS:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


def test_devseed_matches_host_single_slice():
    index, reads = _world()
    host = _map(index, reads, device_seed=False)
    dev = _map(index, reads, device_seed=True)
    assert len(host) > 0
    _assert_equal(dev, host)


@pytest.mark.slow
def test_devseed_matches_host_pipelined():
    """Sliced async pipeline (the production profiler path)."""
    index, reads = _world(seed=9, n_reads=160)
    host = _map(index, reads, device_seed=False, slice_size=64)
    dev = _map(index, reads, device_seed=True, slice_size=64)
    assert len(host) > 0
    _assert_equal(dev, host)


def test_devseed_overflow_falls_back_exactly(monkeypatch):
    """Tiny static caps force the counts-row overflow on every slice; the
    partial redo (host-seeded re-run of the affected read-id suffix, async
    trailing waves in the pipelined path) must still produce output
    identical to the host path, and the overflow telemetry must record the
    redone reads."""
    tiny = staticmethod(lambda slice_n, read_max, occ=0.0: (64, 64, 64))
    monkeypatch.setattr(MinimizerAligner, "_devseed_caps", tiny)

    index, reads = _world(seed=13, n_reads=96)
    host = _map(index, reads, device_seed=False, slice_size=32)
    dev_al = MinimizerAligner(index, params=AlignParams(backend="jnp",
                                                        device_seed=True))
    dev = dev_al.map_reads(reads, emit_cigars=False, slice_size=32)
    assert len(host) > 0
    _assert_equal(dev, host)
    st = dev_al.overflow_stats
    assert st["overflow_slices"] >= 1 and st["reads_redone"] >= 1

    # single-slice fallback too
    host1 = _map(index, reads[:32], device_seed=False)
    dev1 = _map(index, reads[:32], device_seed=True)
    _assert_equal(dev1, host1)


def test_devseed_partial_redo_is_partial():
    """With caps sized so only the tail of a slice overflows, the device
    rows below the cutoff are used as-is and only the suffix is redone —
    reads_redone must be strictly less than the slice size while output
    stays identical to the host path."""
    index, reads = _world(seed=21, n_reads=64)
    host = _map(index, reads, device_seed=False)
    # find caps that overflow midway: run once to get real counts, then
    # shrink out_cap below n_keep via devseed_out_per_read
    al = MinimizerAligner(index, params=AlignParams(
        backend="jnp", device_seed=True, devseed_out_per_read=1))
    # force a small out_cap by monkey-free param: out_cap floor is 2048, so
    # instead shrink g_max via _devseed_caps wrapper
    orig = MinimizerAligner._devseed_caps

    def mid(slice_n, read_max, occ=0.0):
        w, a, g = orig(slice_n, read_max, occ)
        return w, a // 4, g            # anchor plane overflows mid-slice
    MinimizerAligner._devseed_caps = staticmethod(mid)
    try:
        caps_a = mid(64, 1024)[1]
        # only meaningful if the anchor count actually exceeds the cap
        dev = al.map_reads(reads, emit_cigars=False)
        st = al.overflow_stats
        if st["overflow_slices"]:
            assert 0 < st["reads_redone"] < len(reads), st
        _assert_equal(dev, host)
        del caps_a
    finally:
        MinimizerAligner._devseed_caps = orig


def test_devseed_cutoff_semantics():
    from megapath_nano_tpu.align.device_seed import NO_RID

    index, _ = _world(n_genomes=2, glen=8000, n_reads=1)
    al = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    ok = np.array([10, 20, 30, 40, NO_RID])
    assert al._devseed_cutoff(ok, 96) == 96
    assert al.overflow_stats["overflow_slices"] == 0
    bad = np.array([10, 20, 30, 40, 7])
    assert al._devseed_cutoff(bad, 96) == 7
    assert al.overflow_stats == {"slices": 2, "overflow_slices": 1,
                                 "reads_redone": 89}


def test_devseed_cap_sizing():
    """wtot/g_max are pow2 (stable compiled shapes); a_max is a wtot/16
    multiple (pow2 only incidentally at occ=0); all track the documented
    density model: winner slots >= slice_n*read_max/4, chain groups >=
    2*slice_n (the extension runs at out_cap after post-chain compaction)."""
    for slice_n, read_max in [(256, 1024), (2048, 1024), (2048, 4096)]:
        wtot, a_max, g_max = MinimizerAligner._devseed_caps(slice_n, read_max)
        for v in (wtot, g_max):
            assert v & (v - 1) == 0, "wtot/g_max must be powers of two"
        gran = max(wtot // 16, 4096)
        assert a_max % gran == 0, "a_max must be a gran multiple"
        assert wtot >= slice_n * read_max // 4
        assert a_max >= wtot // 2
        assert g_max >= 2 * slice_n


def test_devseed_gate_requirements():
    index, _ = _world(n_genomes=2, glen=8000, n_reads=1)
    on = MinimizerAligner(index, params=AlignParams(backend="jnp",
                                                    device_seed=True))
    off = MinimizerAligner(index, params=AlignParams(backend="jnp",
                                                     device_seed=False))
    assert on._devseed_ok(1024)
    assert not off._devseed_ok(1024)       # opt-in
    assert not on._devseed_ok(2 ** 16)     # rid must fit uint16
