"""ONT simulator: error model realism + profile fitting (the NanoSim
read_analysis equivalent)."""

import numpy as np

from megapath_nano_tpu.sim.simulator import (ErrorProfile, R104, R941,
                                             fit_profile, simulate_reads)
from megapath_nano_tpu.utils.dna import random_sequence


def test_simulate_linear_and_circular():
    rng = np.random.default_rng(0)
    g = random_sequence(rng, 20000)
    reads, truth = simulate_reads(g, 30, seed=1, max_length=3000)
    assert len(reads) == 30
    for r, (s, e, strand) in zip(reads, truth):
        assert 200 * 0.5 <= len(r) <= 3100 + 80   # junk ends allowed
    creads, ctruth = simulate_reads(g, 10, seed=2, circular=True,
                                    max_length=3000)
    assert any(e > len(g) for _, e, _ in ctruth) or len(creads) == 10


def test_per_read_error_variability_and_quals():
    rng = np.random.default_rng(3)
    g = random_sequence(rng, 30000)
    prof = ErrorProfile(junk_head_max=0, junk_tail_max=0)
    reads, truth, quals = simulate_reads(g, 40, prof, seed=4,
                                         max_length=2000, with_quals=True)
    assert len(quals) == 40
    for r, q in zip(reads, quals):
        assert len(q) == len(r)
        assert 2 <= q.min() and q.max() <= 45


def test_r104_cleaner_than_r941():
    rng = np.random.default_rng(5)
    g = random_sequence(rng, 5000)

    def mean_identity(profile, seed):
        prof = ErrorProfile(**{**profile.__dict__, "junk_head_max": 0,
                               "junk_tail_max": 0, "min_length": 4000,
                               "read_rate_shape": 1000.0})
        reads, truth = simulate_reads(g, 10, prof, seed=seed,
                                      max_length=4500)
        # crude identity proxy: length conservation
        return np.mean([abs(len(r) - (e - s)) / (e - s)
                        for r, (s, e, _) in zip(reads, truth)])

    assert mean_identity(R104, 1) <= mean_identity(R941, 1) + 0.01


def test_profile_json_roundtrip(tmp_path):
    p = ErrorProfile(sub_rate=0.011, ins_run_mean=1.7)
    p.save(str(tmp_path / "prof.json"))
    q = ErrorProfile.load(str(tmp_path / "prof.json"))
    assert q == p


def test_fit_profile_recovers_rates():
    """Simulate with known rates, map, fit — the estimated rates must land
    near the truth (read_analysis capability)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
    from megapath_nano_tpu.index.minimizer import MinimizerIndex

    rng = np.random.default_rng(9)
    g = random_sequence(rng, 40000)
    prof = ErrorProfile(sub_rate=0.02, ins_rate=0.01, del_rate=0.02,
                        junk_head_max=0, junk_tail_max=0,
                        read_rate_shape=1000.0,    # ~deterministic rates
                        length_log_mean=7.0, length_log_sigma=0.1)
    reads, truth = simulate_reads(g, 60, prof, seed=11, max_length=1500)
    idx = MinimizerIndex.build([g], ["chr"])
    al = MinimizerAligner(idx, params=AlignParams(backend="jnp"))
    res = al.map_reads(reads, emit_cigars=True)
    fitted = fit_profile(res, reads, {0: g})
    assert abs(fitted.sub_rate - 0.02) < 0.012, fitted.sub_rate
    assert abs(fitted.del_rate - prof.del_rate * 1.1) < 0.02, fitted.del_rate
    assert 0.003 < fitted.ins_rate < 0.03, fitted.ins_rate
    assert 6.5 < fitted.length_log_mean < 7.5
