"""Hash partitioning + salted-key skew handling.

The partition column is the engine's only required wide (shuffle) key in
steady state (SURVEY.md §7.3). The hash is deterministic crc32 so layouts
are stable across processes/runs (resume depends on this) — the analogue of
the reference's md5 output sharding
(/root/reference/cmd/grate2tsv/main.go:186-188).

Skew: a Zipf-hot ``conv_id`` would funnel a large share of events into one
partition (the reference's version of this problem is "one huge file stalls
one worker", /root/reference/cmd/grate2tsv/main.go:116-133). Salting splits
hot conversations into ``num_salts`` sub-shards for a first partial LWW
reduce, then a second tiny reduce per real partition — exact because LWW is
an associative reduction (stages/merge.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def crc32_of_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized-enough deterministic hash: dictionary-encode, crc32 the
    few unique strings in Python, scatter via take."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    hashes = np.array(
        [zlib.crc32(u.encode("utf-8")) if u is not None else 0 for u in uniq],
        dtype=np.uint32,
    )
    idx = d.indices.to_numpy(zero_copy_only=False)
    return hashes[idx]


def add_partition_column(
    t: pa.Table, num_partitions: int, col: str = "conv_id", out: str = "part"
) -> pa.Table:
    part = (crc32_of_strings(t[col]) % np.uint32(num_partitions)).astype(np.int32)
    return t.append_column(out, pa.array(part))


def add_salted_partition_column(
    t: pa.Table,
    num_partitions: int,
    num_salts: int,
    hot_keys: frozenset[str],
    col: str = "conv_id",
    out: str = "spart",
) -> pa.Table:
    """spart = part * num_salts + salt; salt spreads only hot keys.

    Salt is derived from ``lsn`` (deterministic, uniform) so re-runs place
    the same event in the same sub-shard.
    """
    part = (crc32_of_strings(t[col]) % np.uint32(num_partitions)).astype(np.int64)
    salt = np.zeros(t.num_rows, dtype=np.int64)
    if hot_keys and num_salts > 1:
        is_hot = pc.is_in(
            t[col], value_set=pa.array(sorted(hot_keys))
        ).to_numpy(zero_copy_only=False)
        lsn = t["lsn"].to_numpy(zero_copy_only=False)
        salt[is_hot] = lsn[is_hot] % num_salts
    spart = part * num_salts + salt
    return t.append_column(out, pa.array(spart.astype(np.int32)))


def spart_to_part(t: pa.Table, num_salts: int, spart: str = "spart", out: str = "part") -> pa.Table:
    part = (t[spart].to_numpy(zero_copy_only=False) // num_salts).astype(np.int32)
    t = t.drop_columns([spart])
    return t.append_column(out, pa.array(part))


def find_hot_keys(
    ds,
    col: str = "conv_id",
    threshold_frac: float = 0.05,
    sample_mod: int = 64,
    top_per_batch: int = 128,
) -> frozenset[str]:
    """Detect hot keys from per-batch partial counts over the WHOLE log
    (no full shuffle, no prefix bias): each batch keeps a deterministic
    ``lsn % sample_mod == 0`` hash sample — uniform across the stream, so a
    conversation that becomes hot only in the log's tail is still seen —
    and emits (key, partial_count) for its ``top_per_batch`` heaviest
    sampled keys; a tiny driver-side groupby-sum aggregates the partials.
    Keys holding ≥ ``threshold_frac`` of sampled events are 'hot'.

    Driver-side data is bounded at top_per_batch × num_batches rows
    regardless of log size (a truly hot key dominates most batches, so the
    per-batch cap cannot hide it). Falls back to counting every row when
    the dataset has no ``lsn`` column."""

    def partial_counts(t: pa.Table) -> pa.Table:
        if "lsn" in t.column_names and sample_mod > 1:
            t = t.filter(
                pc.equal(
                    pc.bit_wise_and(t["lsn"], pa.scalar(sample_mod - 1, pa.int64())),
                    0,
                )
            )
        vc = t[col].combine_chunks().value_counts()
        keys, ns = vc.field("values"), vc.field("counts")
        if len(ns) > top_per_batch:
            order = pc.select_k_unstable(
                pa.table({"n": ns}), top_per_batch, [("n", "descending")]
            )
            keys, ns = keys.take(order), ns.take(order)
        return pa.table({col: keys, "n": ns})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return frozenset()
    totals = partials.groupby(col)["n"].sum()
    cutoff = threshold_frac * totals.sum()
    return frozenset(totals[totals >= cutoff].index.tolist())


def find_hot_keys_cms(
    ds,
    col: str = "conv_id",
    threshold_frac: float = 0.05,
    d: int = 4,
    w: int = 4096,
) -> frozenset[str]:
    """Hot-key detection over the FULL stream with bounded memory and no
    sampling: two passes.

    1. every batch emits one fixed-size count-min partial (d·w counters
       — sketches merge by addition, so the driver folds kilobytes per
       batch regardless of key cardinality or log size);
    2. a second pass streams each batch's DISTINCT keys through the
       merged sketch and keeps those whose estimate clears the
       threshold. Count-min only OVERESTIMATES, so no hot key can be
       missed (rare near-threshold cold keys may slip in — salting a
       cold key is a no-op, so false positives are harmless here).

    Unlike the sampled ``find_hot_keys``, a key needs no single-batch or
    sampled presence: its weight accumulates exactly across the whole
    log inside the sketch."""
    from ..functions.sketch import CountMin

    def sketch_partial(t: pa.Table) -> pa.Table:
        cm = CountMin(d, w)
        vc = t[col].combine_chunks().value_counts()
        cm.add(
            vc.field("values").to_pylist(),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "t": pa.array([cm.table.reshape(-1)]),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    merged = CountMin(d, w)
    total = 0
    for part in ds.map_batches(sketch_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for trow, n in zip(part["t"].to_pylist(), part["n"].to_pylist()):
            merged = merged.merge(CountMin.from_row({"d": d, "w": w, "t": trow}))
            total += int(n)
    if total == 0:
        return frozenset()
    cutoff = threshold_frac * total

    def probe(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[col].combine_chunks()).to_pylist()
        est = merged.query(keys)
        hot = [k for k, e in zip(keys, est) if e >= cutoff]
        return pa.table({col: pa.array(hot, pa.string())})

    hits = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    if hits.empty:
        return frozenset()
    return frozenset(hits[col].tolist())


def heavy_hitters(
    ds,
    col: str = "conv_id",
    threshold_frac: float = 0.01,
    d: int = 4,
    w: int = 8192,
):
    """EXACT heavy hitters with sketch pruning: the count-min pass
    yields a candidate superset (overestimate-only ⇒ no hot key can be
    missed); a second filtered pass counts ONLY the candidates exactly
    (broadcast `is_in` probe + per-batch partial counts + a tiny
    combine) and keeps keys with ≥ threshold_frac of all rows. The
    result is provably exact — false-positive candidates fall out of
    the final exact filter — while nothing driver-side scales beyond
    the sketch and the (small) candidate relation.

    Emits (col, n_events) rows, one per heavy hitter."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    import pandas as pd

    total = ds.count()
    if total == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({col: pa.array([], pa.string()),
                      "n_events": pa.array([], pa.int64())})
        )
    cand = find_hot_keys_cms(ds, col, threshold_frac, d, w)
    if not cand:
        import ray.data

        return ray.data.from_arrow(
            pa.table({col: pa.array([], pa.string()),
                      "n_events": pa.array([], pa.int64())})
        )
    ref = pa.array(sorted(cand), pa.string())

    def part(t: pa.Table) -> pa.Table:
        x = t.filter(pc.is_in(t[col], value_set=ref))
        vc = x[col].combine_chunks().value_counts()
        return pa.table({col: vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    out_schema = pa.schema(
        [pa.field(col, pa.string()), pa.field("n_events", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        vals = t[col].to_numpy(zero_copy_only=False).astype(object)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(vals, return_inverse=True)
        sums = np.bincount(inv, weights=n).astype(np.int64)
        keep = sums >= threshold_frac * total
        return pa.table(
            {
                col: pa.array(uniq[keep], pa.string()),
                "n_events": pa.array(sums[keep]),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .repartition(8, keys=[col])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
