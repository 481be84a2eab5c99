"""ctypes wrapper for the native CIGAR/MD decoder (samemit.c).

Batched translation of device-backtrace op columns into CIGAR and MD:Z
strings — the host-side half of SAM record emission. Falls back to the
numpy implementation (pipeline/backtrace.py cigar_md_from_packed) when the
native build is unavailable; both produce identical strings (tested).
"""

import ctypes
from typing import List, Tuple

import numpy as np

from bowtie2_tpu.native import _build

_lib = ctypes.CDLL(_build("samemit", "samemit.c"))
_lib.cigar_md_batch.restype = ctypes.c_int
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_lib.cigar_md_batch.argtypes = [
    _u8p, ctypes.c_int64, ctypes.c_int64,
    _i32p, _i32p, _i32p, _i32p, _i32p, _i8p, ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
]


def cigar_md_batch(ops: np.ndarray, cols: np.ndarray,
                   read_start: np.ndarray, read_end: np.ndarray,
                   read_len: np.ndarray, bound: np.ndarray,
                   reads: np.ndarray) -> Tuple[List[str], List[str]]:
    """Decode CIGAR+MD for n records.

    ops: (S, Bc) uint8 device backtrace output; cols: (n,) column per
    record; reads: (n, Lmax) int8 oriented codes. Returns (cigars, mds).
    """
    n = int(cols.size)
    if n == 0:
        return [], []
    ops = np.ascontiguousarray(ops)
    reads = np.ascontiguousarray(reads, dtype=np.int8)
    Lmax = reads.shape[1]
    cigar_stride = 8 * Lmax // 2 + 64
    md_stride = 4 * Lmax + 64
    cig = ctypes.create_string_buffer(n * cigar_stride)
    md = ctypes.create_string_buffer(n * md_stride)
    bad = _lib.cigar_md_batch(
        ops, ops.shape[0], ops.shape[1],
        np.ascontiguousarray(cols, np.int32),
        np.ascontiguousarray(read_start, np.int32),
        np.ascontiguousarray(read_end, np.int32),
        np.ascontiguousarray(read_len, np.int32),
        np.ascontiguousarray(bound, np.int32),
        reads, Lmax, n, cig, cigar_stride, md, md_stride)
    if bad:
        raise RuntimeError(f"cigar_md_batch: {bad} records overflowed")
    raw_c, raw_m = cig.raw, md.raw
    cigars = []
    mds = []
    for r in range(n):
        o = r * cigar_stride
        cigars.append(raw_c[o:raw_c.index(b"\0", o)].decode("ascii"))
        o = r * md_stride
        mds.append(raw_m[o:raw_m.index(b"\0", o)].decode("ascii"))
    return cigars, mds
