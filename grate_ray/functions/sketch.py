"""Mergeable sketches: HyperLogLog approximate distinct count.

The guide's sketch pattern: each ``map_batches`` batch emits ONE serialized
sketch row; a tiny second stage merges them — sketches are designed to be
mergeable, so the wide step ships kilobytes instead of keys. (The
reference's only aggregations are streaming counters, SURVEY.md §2.5;
sketches are the scale-path generalization a 10^10-event metrics rollup
needs when exact distinct-key counts would themselves be a shuffle.)

Standard HLL with m=2^p registers, crc32-based 64-bit hashing, and the
usual small-range (linear counting) correction. Deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _hash64(values: list[str]) -> np.ndarray:
    """Low 8 md5 bytes little-endian per value — bit-identical to
    DuckDB's md5_number_lower(), making the ENTIRE sketch (registers,
    ranks, harmonic estimate, linear-counting correction) exactly
    SQL-mirrorable like the rest of the hashing family. (crc32
    combinations are too correlated for HLL register ranks — measured
    18% bias on sequential keys; md5 is as unbiased as the blake2b it
    replaced.)"""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5((v or "").encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def hll_idx_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: idx = top p bits, rank = position
    of the first set bit among the remaining 64-p (capped at 64-p+1)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    ranks = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for bit in range(64 - p):
        is_set = (rest >> np.uint64(63 - bit)) & np.uint64(1)
        newly = (~found) & (is_set == 1)
        ranks[newly] = bit + 1
        found |= newly
    return idx, ranks


def hll_from_values(values: list[str], p: int = 12) -> np.ndarray:
    """m=2^p uint8 registers from a value list."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not values:
        return regs
    idx, ranks = hll_idx_ranks(_hash64(values), p)
    np.maximum.at(regs, idx, ranks)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> float:
    """Distributed approximate distinct: one sketch row per batch, merged
    on the driver (kilobytes total — no key shuffle)."""

    def batch_sketch(t: pa.Table) -> pa.Table:
        regs = hll_from_values(t[col].to_pylist(), p=p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(batch_sketch, batch_format="pyarrow").take_all()
    sketches = [np.frombuffer(r["sketch"], dtype=np.uint8) for r in rows]
    return hll_estimate(hll_merge(sketches))


# --- count-min sketch (mergeable heavy-hitter counts) -------------------------


class CountMin:
    """Count-min sketch: d rows × w counters, query returns an
    OVERESTIMATE-only approximate count (error ≤ 2N/w with prob
    1 − 2^−d). Mergeable by elementwise addition, so each batch emits a
    fixed-size partial and the exchange ships d·w counters instead of
    keys — the bounded-memory full-stream alternative to sampling for
    hot-key detection."""

    __slots__ = ("d", "w", "table")

    def __init__(self, d: int = 4, w: int = 4096, table: np.ndarray | None = None):
        self.d = d
        self.w = w
        self.table = (
            np.zeros((d, w), dtype=np.int64) if table is None else table
        )

    # odd multipliers from splitmix-style constants; per-row hash =
    # ((a_i * fp) >> 33) % w over the md5-low64 key fingerprint
    _A = np.array(
        [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
         0xD6E8FEB86659FD93, 0xA5A3B195353C5E37, 0xC2B2AE3D27D4EB4F],
        dtype=np.uint64,
    )

    def _rows(self, keys: list[str]) -> np.ndarray:
        """(d, n) column indices for the key list."""
        fp = _hash64(keys)
        idx = np.empty((self.d, len(fp)), dtype=np.int64)
        for i in range(self.d):
            mixed = (self._A[i] * fp) >> np.uint64(33)
            idx[i] = (mixed % np.uint64(self.w)).astype(np.int64)
        return idx

    def add(self, keys: list[str], counts: np.ndarray | None = None) -> None:
        if not keys:
            return
        c = (
            np.ones(len(keys), dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )
        idx = self._rows(keys)
        for i in range(self.d):
            np.add.at(self.table[i], idx[i], c)

    def query(self, keys: list[str]) -> np.ndarray:
        if not keys:
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(keys)
        est = self.table[0][idx[0]]
        for i in range(1, self.d):
            est = np.minimum(est, self.table[i][idx[i]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.d, self.w) == (other.d, other.w)
        return CountMin(self.d, self.w, self.table + other.table)

    def to_row(self) -> dict:
        return {"d": self.d, "w": self.w, "t": self.table.reshape(-1)}

    @classmethod
    def from_row(cls, row: dict) -> "CountMin":
        d, w = int(row["d"]), int(row["w"])
        return cls(d, w, np.asarray(row["t"], dtype=np.int64).reshape(d, w))


def windowed_approx_distinct(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    val_col: str = "user_id",
    minutes: int = 60,
    p: int = 8,
    slide: int = 1,
) -> ray.data.Dataset:
    """Approximate distinct values PER TUMBLING WINDOW — the sketch-per-
    group pattern: each batch pre-reduces to at most (windows × m)
    register rows (window, idx, max rank) instead of shipping values;
    ONE keyed hop co-locates each window; the per-window byte-max merge,
    harmonic estimate and linear-counting correction run vectorized
    ACROSS windows per block. md5 hashing keeps the whole thing exactly
    SQL-mirrorable even though the answer is an approximation.

    ``slide > 1`` turns the windows ROLLING (trailing): an event at hour
    h contributes to windows h..h+slide−1, so window w estimates the
    distinct values over its last ``slide`` hours (the DAU/WAU rolling-
    retention shape). The expansion happens in the partial kernel BEFORE
    hashing dedup, so the per-batch payload is still register rows —
    never slide× the events. Emits (w timestamp, approx_distinct@6dp)."""
    import pyarrow.compute as pc

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    m = 1 << p
    us = minutes * 60 * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("w", pa.int64()),
                pa.field("idx", pa.int64()),
                pa.field("reg", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        vals = t[val_col].to_numpy(zero_copy_only=False)
        # one md5 per UNIQUE value (str(v) ≡ CAST(v AS VARCHAR))
        uniq, codes = np.unique(vals, return_inverse=True)
        idx_u, rank_u = hll_idx_ranks(_hash64([str(v) for v in uniq]), p)
        idx, rank = idx_u[codes], rank_u[codes].astype(np.int64)
        if slide > 1:  # trailing windows: event hour h → windows h..h+s-1
            offs = np.arange(slide, dtype=np.int64) * us
            w = (w[:, None] + offs[None, :]).reshape(-1)
            idx = np.repeat(idx, slide)
            rank = np.repeat(rank, slide)
        key = w * m + idx  # composite numeric key (idx < m)
        order = np.argsort(key, kind="stable")
        ks, rs = key[order], rank[order]
        change = np.empty(len(ks), dtype=bool)
        change[0] = True
        change[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(change)
        regs = np.maximum.reduceat(rs, starts)
        kk = ks[starts]
        return pa.table(
            {
                "w": pa.array(kk // m),
                "idx": pa.array(kk % m),
                "reg": pa.array(regs),
            },
            schema=schema,
        )

    alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("w", pa.timestamp("us")),
                pa.field("approx_distinct", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        w = t["w"].to_numpy(zero_copy_only=False)
        idx = t["idx"].to_numpy(zero_copy_only=False)
        reg = t["reg"].to_numpy(zero_copy_only=False)
        key = w * m + idx
        order = np.argsort(key, kind="stable")
        ks, rs, ws = key[order], reg[order], w[order]
        change = np.empty(len(ks), dtype=bool)
        change[0] = True
        change[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(change)
        regs = np.maximum.reduceat(rs, starts)  # merged register per (w,idx)
        wk = ws[starts]
        wchange = np.empty(len(wk), dtype=bool)
        wchange[0] = True
        wchange[1:] = wk[1:] != wk[:-1]
        wstarts = np.flatnonzero(wchange)
        npresent = np.diff(np.append(wstarts, len(wk))).astype(np.int64)
        sp = np.add.reduceat(np.exp2(-regs.astype(np.float64)), wstarts)
        denom = sp + (m - npresent)
        est = alpha * m * m / denom
        zeros = m - npresent
        lin = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)), est)
        out = np.where((est <= 2.5 * m) & (zeros > 0), lin, est)
        return pa.table(
            {
                "w": pa.array(wk[wstarts].astype("datetime64[us]")),
                "approx_distinct": pa.array(np.round(out, 6)),
            },
            schema=schema,
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["w"])
        .map_batches(estimate, batch_format="pyarrow", batch_size=None)
    )
