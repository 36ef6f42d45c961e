"""Semi-structured (JSON string) column operators.

The events table carries ``props`` as a JSON text column — the usual
shape of tracking payloads landed from a CDC feed. Extraction follows
the simdjson-style two-tier pattern: a VECTORIZED regex fast path for
the flat ``{"key": <int>}`` case (``pc.extract_regex``, no per-row
Python), with a per-row ``json.loads`` fallback ONLY for rows the fast
path misses (nested objects, whitespace variants, quoted numbers) — so
the hot path stays Arrow-native and the slow path is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def json_extract_int_np(
    col: pa.ChunkedArray | pa.Array, key: str
) -> tuple[np.ndarray, np.ndarray]:
    """Extract an integer field from a JSON-text column as an
    ``(int64 values, bool validity)`` pair — never a NaN-in-float
    representation, so payloads beyond 2^53 keep full precision.
    Invalid positions hold 0 in the values array.

    Semantics (deliberately stricter than ``CAST(json_extract(...) AS
    BIGINT)``): quoted numbers (``"3"``) and floats (``3.5``) are NULL
    here — only JSON *integers* count; the SQL mirrors in the oracle
    registry apply the same integer-only predicate rather than the
    coercing CAST."""
    import json
    import re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # anchored to the FIRST top-level key with a clean integer + delimiter:
    # floats ("3.5"), quoted numbers, and objects where the key appears
    # later (or nested first) all fail the match and take the exact
    # json.loads fallback — the fast path can never return a wrong value
    pat = rf'^\s*\{{\s*"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)\s*[,}}]'
    hit = pc.extract_regex(pc.fill_null(col, ""), pattern=pat)
    v = pc.struct_field(hit, "v")
    valid = pc.is_valid(v).to_numpy(zero_copy_only=False).copy()
    vals = (
        pc.fill_null(pc.cast(v, pa.int64()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=True)
    )
    missing = np.flatnonzero(~valid)
    if len(missing):
        raw = col.to_numpy(zero_copy_only=False)
        for i in missing.tolist():
            s = raw[i]
            if s is None:
                continue
            try:
                got = json.loads(s).get(key)
            except (ValueError, AttributeError):
                continue
            if (
                isinstance(got, int)
                and not isinstance(got, bool)
                and -(2**63) <= got < 2**63
            ):
                vals[i] = got
                valid[i] = True
    return vals, valid


def json_extract_int(
    col: pa.ChunkedArray | pa.Array, key: str
) -> pa.Array:
    """Arrow-array wrapper over :func:`json_extract_int_np`: int64 with
    a real null bitmap (not NaN-in-float), so > 2^53 payloads survive."""
    vals, valid = json_extract_int_np(col, key)
    return pa.array(vals, pa.int64(), mask=~valid)


def props_rollup(sf_dir: str, key: str = "k") -> ray.data.Dataset:
    """Per-event-type rollup of a JSON payload field: count, mean and
    max of ``props[key]``. Combiner-first (per-batch partial sums); the
    JSON decode never leaves the batch."""
    from ..context import configure_shuffle
    from .num import sql_round

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    part_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s", pa.float64()),
            pa.field("mx", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        k, ok = json_extract_int_np(t["props"], key)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        et, kv = et[ok], k[ok]
        if len(et) == 0:
            return part_schema.empty_table()
        uniq, inv = np.unique(et, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, kv)
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(np.bincount(inv, weights=kv.astype(np.float64))),
                "mx": pa.array(mx),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Max, Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Max("mx", alias_name="mx"),
        )
    )

    out_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("avg_k", pa.float64()),
            pa.field("max_k", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"].cast(pa.int64()),
                "avg_k": sql_round(pa.array(s / n), 6),
                "max_k": t["mx"].cast(pa.int64()),
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")


def props_value_corr(sf_dir: str, key: str = "k") -> ray.data.Dataset:
    """Correlation between the extracted JSON payload field and the
    value column, per event type — the JSON-extraction × statistics
    composition. One pass of raw cross-moment sums per batch (sample ≡
    population correlation, the n's cancel), one tiny keyed hop; the
    oracle mirrors the identical sum formula."""
    from ..context import configure_shuffle
    from .num import sql_round

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props", "value"]
    )

    part_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("sx", pa.float64()),
            pa.field("sy", pa.float64()),
            pa.field("sxx", pa.float64()),
            pa.field("syy", pa.float64()),
            pa.field("sxy", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ki, kok = json_extract_int_np(t["props"], key)
        k = ki.astype(np.float64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ok = kok & ~np.isnan(v)
        et, k, v = et[ok], k[ok], v[ok]
        if len(et) == 0:
            return part_schema.empty_table()
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sx": pa.array(np.bincount(inv, weights=k)),
                "sy": pa.array(np.bincount(inv, weights=v)),
                "sxx": pa.array(np.bincount(inv, weights=k * k)),
                "syy": pa.array(np.bincount(inv, weights=v * v)),
                "sxy": pa.array(np.bincount(inv, weights=k * v)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    out_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("corr_kv", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (sxy - sx * sy / n) / np.sqrt(
                (sxx - sx * sx / n) * (syy - sy * sy / n)
            )
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"].cast(pa.int64()),
                "corr_kv": sql_round(pa.array(corr), 6),
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")
