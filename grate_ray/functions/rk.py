"""RK-number decode (T12): the packed 30-bit int-or-float ×0.01 encoding
of the BIFF cell records (/root/reference/xls/structs.go:64-107; public
MS-XLS spec §2.5.122), vectorized with numpy bit ops.

An RK word is 32 bits: bit0 = divide-by-100 flag, bit1 = integer flag;
the top 30 bits are either a signed integer or the high 30 bits of an
IEEE-754 double (low 34 bits zero).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def decode_rk(words: np.ndarray) -> np.ndarray:
    """uint32 RK words → float64 values (both int- and float-mode)."""
    w = words.astype(np.uint32)
    mul100 = (w & np.uint32(1)) != 0
    is_int = (w & np.uint32(2)) != 0
    # int mode: top 30 bits as a signed integer
    payload = (w >> np.uint32(2)).astype(np.int64)
    neg = payload >= (1 << 29)
    ints = np.where(neg, payload - (1 << 30), payload).astype(np.float64)
    # float mode: top 30 bits are the high bits of a double
    fbits = (w.astype(np.uint64) & np.uint64(0xFFFFFFFC)) << np.uint64(32)
    floats = fbits.view(np.float64)
    vals = np.where(is_int, ints, floats)
    return np.where(mul100, vals / 100.0, vals)


def encode_rk_int(values: np.ndarray, mul100: np.ndarray | bool = False) -> np.ndarray:
    """Integer-mode RK words for test/derivation use (30-bit signed)."""
    v = values.astype(np.int64)
    if np.any((v < -(1 << 29)) | (v >= (1 << 29))):
        raise ValueError("value out of 30-bit RK range")
    payload = np.where(v < 0, v + (1 << 30), v).astype(np.uint32)
    w = (payload << np.uint32(2)) | np.uint32(2)
    if np.any(mul100):
        w = w | np.where(np.asarray(mul100, dtype=bool), np.uint32(1), np.uint32(0))
    return w


def decode_rk_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    w = col.to_numpy(zero_copy_only=False).astype(np.uint32)
    return pa.array(decode_rk(w))
