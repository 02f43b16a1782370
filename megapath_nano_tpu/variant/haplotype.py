"""Haplotype-based realignment: de Bruijn candidate haplotypes + full-read
realignment (the reference's Illumina realignment path).

Wraps the native dBG builder (cpp/mpn_debruijn.cc, the
debruijn_graph.cpp:387 get_consensus equivalent) and read realigner
(cpp/mpn_realigner.cc, the realigner.cpp:854 realign_reads equivalent), as
driven by reference bin/realignment/realign_illumina_reads.py:29-49.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from megapath_nano_tpu.native.lib import MpnRealignResult, load_native_lib

CIGAR_OPS = "MIDNSHP=X"


def build_haplotypes(
    ref_window: np.ndarray,
    reads: list[np.ndarray],
    quals: list[np.ndarray] | None = None,
    *,
    min_k: int = 11,
    max_k: int = 31,
    min_qual: int = 10,
    min_edge_weight: int = 2,
    max_paths: int = 256,
) -> list[np.ndarray]:
    """Candidate haplotypes spanning the reference window."""
    lib = load_native_lib()
    ref_window = np.ascontiguousarray(ref_window, np.int8)
    n = len(reads)
    flat = (np.concatenate([np.asarray(r, np.int8) for r in reads])
            if n else np.zeros(0, np.int8))
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offsets[1:])
    qflat = None
    if quals is not None:
        qflat = np.concatenate([np.asarray(q, np.int8) for q in quals]) \
            if n else np.zeros(0, np.int8)
    cap = (len(ref_window) * 2 + 200) * max_paths
    hap_out = np.zeros(cap, np.int8)
    hap_off = np.zeros(max_paths + 1, np.int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_haps = lib.mpn_dbg_haplotypes(
        ref_window.ctypes.data_as(i8p), len(ref_window),
        flat.ctypes.data_as(i8p), offsets.ctypes.data_as(i64p),
        qflat.ctypes.data_as(i8p) if qflat is not None else None,
        n, min_k, max_k, min_qual, min_edge_weight, max_paths,
        hap_out.ctypes.data_as(i8p), hap_off.ctypes.data_as(i64p), cap)
    if n_haps <= 0:
        return []
    return [hap_out[hap_off[i]: hap_off[i + 1]].copy()
            for i in range(n_haps)]


@dataclass
class HapRealignment:
    hap_index: int
    ref_pos: int
    score: int
    cigar: list[tuple[int, str]]


def realign_to_haplotypes(
    reads: list[np.ndarray],
    ref_window: np.ndarray,
    haplotypes: list[np.ndarray],
    *,
    band: int = 128,
) -> list[HapRealignment]:
    """Realign reads via the best candidate haplotype, projected onto the
    reference window. hap_index -1 = unplaced."""
    lib = load_native_lib()
    n = len(reads)
    if n == 0 or not haplotypes:
        return [HapRealignment(-1, -1, 0, []) for _ in range(n)]
    flat = np.concatenate([np.asarray(r, np.int8) for r in reads])
    off = np.zeros(n + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=off[1:])
    hflat = np.concatenate([np.asarray(h, np.int8) for h in haplotypes])
    hoff = np.zeros(len(haplotypes) + 1, np.int64)
    np.cumsum([len(h) for h in haplotypes], out=hoff[1:])
    co = np.zeros(n + 1, np.int64)
    np.cumsum([2 * len(r) + 8 for r in reads], out=co[1:])
    cigar_buf = np.zeros(int(co[-1]), np.uint32)
    results = (MpnRealignResult * n)()
    ref_window = np.ascontiguousarray(ref_window, np.int8)

    i8p = ctypes.POINTER(ctypes.c_int8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.mpn_realign_reads(
        flat.ctypes.data_as(i8p), off.ctypes.data_as(i64p), n,
        ref_window.ctypes.data_as(i8p), len(ref_window),
        hflat.ctypes.data_as(i8p), hoff.ctypes.data_as(i64p),
        len(haplotypes), band, results,
        cigar_buf.ctypes.data_as(u32p), co.ctypes.data_as(i64p))
    out = []
    for i in range(n):
        r = results[i]
        cig = [(int(c) >> 4, CIGAR_OPS[int(c) & 0xF])
               for c in cigar_buf[co[i]: co[i] + r.cigar_len]]
        out.append(HapRealignment(r.hap_index, r.ref_pos, r.score, cig))
    return out
