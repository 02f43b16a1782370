"""ONT read simulator — the NanoSim-equivalent used by noise projection.

The reference vendors NanoSim (reference: bin/tools/nanosim/simulator.py,
~712 LoC, with trained error profiles in nanosim_profiles/) and invokes it
from step_noise_projection (megapath_nano.py:2685-2697) to simulate 10k reads
from high-abundance assemblies. This simulator reproduces the capability with
a parametric ONT error model (substitution/insertion/deletion rates +
homopolymer-biased deletions + lognormal read lengths) in vectorized numpy;
profiles are simple dataclasses rather than trained model files.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from megapath_nano_tpu.utils.dna import revcomp


@dataclass
class ErrorProfile:
    """Parametric ONT error profile (R9.4.1-flavored defaults)."""

    sub_rate: float = 0.03
    ins_rate: float = 0.02
    del_rate: float = 0.03
    homopolymer_del_boost: float = 2.0     # extra deletion odds in homopolymers
    length_log_mean: float = 8.5           # lognormal read length (~5 kb)
    length_log_sigma: float = 0.6
    min_length: int = 200


def simulate_reads(
    genome: np.ndarray,
    n_reads: int,
    profile: ErrorProfile | None = None,
    *,
    seed: int = 0,
    circular: bool = False,
    max_length: int | None = None,
) -> tuple[list[np.ndarray], list[tuple[int, int, int]]]:
    """Returns (reads, truth) with truth entries (start, end, strand).

    Linear/circular modes mirror NanoSim's (simulator.py:42-43,649)."""
    p = profile or ErrorProfile()
    rng = np.random.default_rng(seed)
    g_len = len(genome)
    reads, truth = [], []
    for _ in range(n_reads):
        length = int(np.clip(rng.lognormal(p.length_log_mean,
                                           p.length_log_sigma),
                             p.min_length, max_length or g_len))
        length = min(length, g_len)
        if circular:
            start = int(rng.integers(0, g_len))
            idx = (start + np.arange(length)) % g_len
            frag = genome[idx]
            end = start + length
        else:
            start = int(rng.integers(0, max(g_len - length, 1)))
            frag = genome[start: start + length]
            end = start + length
        read = _apply_errors(rng, frag, p)
        strand = int(rng.integers(0, 2))
        if strand:
            read = revcomp(read)
        reads.append(read)
        truth.append((start, end, strand))
    return reads, truth


def _apply_errors(rng: np.random.Generator, frag: np.ndarray,
                  p: ErrorProfile) -> np.ndarray:
    n = len(frag)
    # homopolymer mask: base equals previous base
    homo = np.zeros(n, bool)
    homo[1:] = frag[1:] == frag[:-1]
    del_rate = np.where(homo, min(p.del_rate * p.homopolymer_del_boost, 0.9),
                        p.del_rate)
    r = rng.random(n)
    deleted = r < del_rate
    r2 = rng.random(n)
    substituted = (~deleted) & (r2 < p.sub_rate)
    inserted = rng.random(n) < p.ins_rate

    out = []
    subs = rng.integers(1, 4, n)
    ins_bases = rng.integers(0, 4, n)
    for i in range(n):
        if inserted[i]:
            out.append(int(ins_bases[i]))
        if deleted[i]:
            continue
        if substituted[i] and frag[i] < 4:
            out.append((int(frag[i]) + int(subs[i])) % 4)
        else:
            out.append(int(frag[i]))
    return np.asarray(out, dtype=np.int8)
