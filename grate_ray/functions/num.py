"""Numeric kernels shared by the oracle-checked pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sql_round(col: pa.ChunkedArray | pa.Array, ndigits: int = 2) -> pa.Array:
    """Round half AWAY FROM ZERO — bit-for-bit DuckDB ``round(x, n)``
    parity (``trunc(x*10^n + copysign(0.5, x)) / 10^n``). Arrow's
    ``pc.round`` and numpy round half to even, which lands on the other
    side of the boundary whenever a float money sum sits exactly on a
    .xx5 (common with 2-decimal inputs)."""
    x = col.to_numpy(zero_copy_only=False).astype(np.float64)
    s = 10.0**ndigits
    return pa.array(np.trunc(x * s + np.copysign(0.5, x)) / s)
