"""Size-gate logic for the fused/device-seeded dispatch paths.

The gates guard exactness at scale: hashes must fit 30 bits, identity keys
int32, rid/seq ids the uint16 result columns, and the packed reference
int32 addressing (megapath_nano_tpu/align/pipeline.py _devseed_ok and the
fused-path gates). These tests drive the gate logic with synthetic index
shapes — including past-the-cliff sizes that cannot be allocated in CI —
via lightweight stand-ins."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner


class _FakeIndex:
    """Just enough surface for the gate checks."""

    def __init__(self, *, n_seqs, seq_data_size, n_keys=100, k=15):
        self.k = k
        self.w = 10
        self.seq_names = [f"s{i}" for i in range(n_seqs)]
        self.keys = np.zeros(n_keys, np.uint64)
        self.seq_data = np.zeros(1, np.int8)   # placeholder; size faked
        self._size = seq_data_size
        self.seq_lengths = np.ones(n_seqs, np.int64)
        self.seq_offsets = np.arange(n_seqs + 1, dtype=np.int64)

    @property
    def fake_size(self):
        return self._size


def _aligner(idx, **kw):
    al = MinimizerAligner.__new__(MinimizerAligner)
    al.index = idx
    al.params = AlignParams(device_seed=True, **kw)
    al.meta = None
    al._seq_data_dev = None
    return al


def test_devseed_gate_small_index_ok():
    idx = _FakeIndex(n_seqs=100, seq_data_size=10 ** 6)
    al = _aligner(idx)
    # patch the size the gate reads
    idx.seq_data = np.zeros(8, np.int8)
    assert al._devseed_ok(2048)


def test_devseed_gate_rejects_large_seq_data():
    idx = _FakeIndex(n_seqs=100, seq_data_size=0)
    al = _aligner(idx)

    class _Big:
        size = 2 ** 31 - 2 ** 10      # past the 2**31 - 2**16 cliff
    idx.seq_data = _Big()
    assert not al._devseed_ok(2048)


def test_devseed_gate_rejects_many_sequences():
    idx = _FakeIndex(n_seqs=2 ** 15, seq_data_size=10 ** 6)
    idx.seq_data = np.zeros(8, np.int8)
    al = _aligner(idx)
    assert not al._devseed_ok(2048)     # seq ids must fit 15 bits


def test_devseed_gate_rejects_large_slice():
    idx = _FakeIndex(n_seqs=100, seq_data_size=10 ** 6)
    idx.seq_data = np.zeros(8, np.int8)
    al = _aligner(idx)
    assert not al._devseed_ok(2 ** 16)  # rid must fit uint16


def test_devseed_gate_rejects_k_over_15():
    idx = _FakeIndex(n_seqs=100, seq_data_size=10 ** 6, k=17)
    idx.seq_data = np.zeros(8, np.int8)
    al = _aligner(idx)
    assert not al._devseed_ok(2048)     # 30-bit hash precondition


def test_devseed_identity_key_gate():
    # slice_n * 2^(seq_bits+1) must fit int32: craft a case that fails
    idx = _FakeIndex(n_seqs=2 ** 14 + 1, seq_data_size=10 ** 6)
    idx.seq_data = np.zeros(8, np.int8)
    al = _aligner(idx)
    # seq_bits = 15 -> slice 40000 needs 40000 * 2^16 > 2^31
    assert not al._devseed_ok(40000)
    # while a modest slice at the same seq_bits passes
    assert al._devseed_ok(2048)


def test_caps_scale_with_slice():
    w1, a1, g1 = MinimizerAligner._devseed_caps(256, 1024)
    w2, a2, g2 = MinimizerAligner._devseed_caps(2048, 1024)
    assert w2 >= w1 and g2 >= g1
    assert w1 >= 256 * 1024 // 4       # winner slots cover density model
