"""Generate SSW golden parity fixtures by running the reference libssw.

The reference implementation (read-only at /root/reference) is compiled into a
temp directory and driven via ctypes as a TEST ORACLE ONLY — its outputs
(scores, positions, CIGARs) are stored as data in ssw_golden.json; no reference
code enters this repository. Run manually:

    python tests/golden/gen_ssw_golden.py
"""

import ctypes
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REF_SSW_DIR = "/root/reference/bin/realignment/realign"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ssw_golden.json")


class SAlign(ctypes.Structure):
    _fields_ = [
        ("score1", ctypes.c_uint16),
        ("score2", ctypes.c_uint16),
        ("ref_begin1", ctypes.c_int32),
        ("ref_end1", ctypes.c_int32),
        ("read_begin1", ctypes.c_int32),
        ("read_end1", ctypes.c_int32),
        ("ref_end2", ctypes.c_int32),
        ("cigar", ctypes.POINTER(ctypes.c_uint32)),
        ("cigarLen", ctypes.c_int32),
    ]


def compile_reference_ssw(tmpdir: str) -> ctypes.CDLL:
    so = os.path.join(tmpdir, "libssw_ref.so")
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared", "-msse2",
         os.path.join(REF_SSW_DIR, "ssw.c"), "-o", so],
        check=True,
    )
    lib = ctypes.CDLL(so)
    lib.ssw_init.restype = ctypes.c_void_p
    lib.ssw_init.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int32, ctypes.c_int8,
    ]
    lib.ssw_align.restype = ctypes.POINTER(SAlign)
    lib.ssw_align.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8), ctypes.c_int32,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint16,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.init_destroy.argtypes = [ctypes.c_void_p]
    lib.align_destroy.argtypes = [ctypes.POINTER(SAlign)]
    return lib


def score_matrix(match, mismatch, n=5):
    mat = np.full((n, n), -mismatch, dtype=np.int8)
    np.fill_diagonal(mat, match)
    mat[n - 1, :] = 0
    mat[:, n - 1] = 0
    return mat


def ref_align(lib, read, ref, match, mismatch, gap_open, gap_ext, mask_len):
    mat = score_matrix(match, mismatch)
    i8p = ctypes.POINTER(ctypes.c_int8)
    read = np.ascontiguousarray(read, dtype=np.int8)
    ref = np.ascontiguousarray(ref, dtype=np.int8)
    prof = lib.ssw_init(read.ctypes.data_as(i8p), len(read),
                        mat.ctypes.data_as(i8p), 5, 2)
    # flag=2 + filters=0: return begin positions and CIGAR (the mode pyssw.py
    # uses, reference bin/realignment/pyssw.py:138)
    res = lib.ssw_align(prof, ref.ctypes.data_as(i8p), len(ref),
                        gap_open, gap_ext, 2, 0, 0, mask_len)
    r = res.contents
    cigar = [int(r.cigar[i]) for i in range(r.cigarLen)]
    out = {
        "score1": int(r.score1), "score2": int(r.score2),
        "ref_begin1": int(r.ref_begin1), "ref_end1": int(r.ref_end1),
        "read_begin1": int(r.read_begin1), "read_end1": int(r.read_end1),
        "ref_end2": int(r.ref_end2), "cigar": cigar,
    }
    lib.align_destroy(res)
    lib.init_destroy(prof)
    return out


def make_cases(rng):
    """Random (read, ref) pairs covering short/long, clean/noisy, with Ns."""
    cases = []
    params_list = [
        dict(match=4, mismatch=6, gap_open=8, gap_extend=2),   # realigner params
        dict(match=2, mismatch=2, gap_open=3, gap_extend=1),   # classic ssw defaults
        dict(match=2, mismatch=4, gap_open=4, gap_extend=2),   # minimap2-ish
    ]
    for trial in range(60):
        params = params_list[trial % len(params_list)]
        ref_len = int(rng.integers(80, 2000))
        ref = rng.integers(0, 4, size=ref_len, dtype=np.int8)
        start = int(rng.integers(0, max(ref_len - 60, 1)))
        span = int(rng.integers(40, min(400, ref_len - start)))
        read = ref[start: start + span].copy()
        # mutate
        err = rng.random() * 0.15
        out = []
        for b in read:
            r = rng.random()
            if r < err / 3:
                continue
            if r < 2 * err / 3:
                out.append(int(rng.integers(0, 4)))
            if r < err:
                out.append((int(b) + int(rng.integers(1, 4))) % 4)
            else:
                out.append(int(b))
        read = np.asarray(out, dtype=np.int8)
        if rng.random() < 0.2 and len(read) > 10:  # sprinkle Ns
            idx = rng.integers(0, len(read), size=max(1, len(read) // 50))
            read[idx] = 4
        # soft-clip-like flanks
        if rng.random() < 0.3:
            flank = rng.integers(0, 4, size=int(rng.integers(5, 30)),
                                 dtype=np.int8)
            read = np.concatenate([flank, read])
        if len(read) < 5:
            continue
        mask_len = max(len(read) // 2, 15)
        cases.append((read, ref, params, mask_len))
    # tiny adversarial cases
    for read_s, ref_s in [
        ([0, 1, 2, 3, 0, 1, 2, 3], [0, 1, 2, 3, 0, 1, 2, 3]),
        ([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
        ([2] * 30, [2] * 10 + [3] * 10 + [2] * 10),
    ]:
        cases.append((np.array(read_s, dtype=np.int8),
                      np.array(ref_s, dtype=np.int8),
                      dict(match=2, mismatch=2, gap_open=3, gap_extend=1), 15))
    return cases


def main():
    rng = np.random.default_rng(20260817)
    with tempfile.TemporaryDirectory() as tmpdir:
        lib = compile_reference_ssw(tmpdir)
        fixtures = []
        for read, ref, params, mask_len in make_cases(rng):
            expected = ref_align(lib, read, ref, params["match"],
                                 params["mismatch"], params["gap_open"],
                                 params["gap_extend"], mask_len)
            fixtures.append({
                "read": read.tolist(), "ref": ref.tolist(),
                "params": params, "mask_len": int(mask_len),
                "expected": expected,
            })
    with open(OUT, "w") as f:
        json.dump(fixtures, f)
    print(f"wrote {len(fixtures)} fixtures to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
