"""Relational demo pipelines over the TPC-H-ish tables.

Not part of the CDC core, but they demonstrate the engine's generic
query-processing idioms at scale (SURVEY.md §2.5/§2.4/§2.6):

- partial aggregation inside ``map_batches`` before the (tiny) groupby —
  the combiner pattern every wide aggregate should use;
- broadcast hash join: the small side is ``ray.put`` once and probed
  per batch inside an actor pool — no shuffle;
- top-k: per-batch local prune then a driver-side final heap — never a
  global sort.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def lineitem_agg_pushdown(sf_dir: str) -> ray.data.Dataset:
    """Q1-style rollup with in-batch partial aggregation: each batch emits
    ≤ |groups| rows, so the shuffle moves partials, not base rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        df = t.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_price=("l_extendedprice", "sum"),
                revenue=("revenue", "sum"),
                n=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("revenue", alias_name="revenue"),
        Sum("n", alias_name="n"),
    )

    # float sums depend on addition order; round so the value matches the
    # oracle's sequential sum bit-for-bit at 2 decimals
    def rounded(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_price", "revenue"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.round(t[c], ndigits=2))
        return t

    return agg.map_batches(rounded, batch_format="pyarrow")


def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join: customer→nation maps are small dimension state, put
    once in the object store, probed per batch in an actor pool (the
    reference's shared-string-table lookup pattern, SURVEY.md §2.4)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    n2name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    ref = ray.put((c2n, n2name))

    class Probe:
        def __init__(self, ref):
            self.c2n, self.n2name = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            cust = t["o_custkey"].to_pylist()
            names = [self.n2name.get(self.c2n.get(c)) for c in cust]
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "o_totalprice": t["o_totalprice"],
                }
            )

    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    joined = ds.map_batches(Probe, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4))
    agg = joined.groupby("n_name").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price")
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_price"),
            "total_price",
            pc.round(t["total_price"], ndigits=2),
        ),
        batch_format="pyarrow",
    )


def orders_anti_join_segment(sf_dir: str, segment: str = "BUILDING") -> ray.data.Dataset:
    """Anti-join via broadcast key set: orders whose customer is NOT in the
    given market segment. The key set is `ray.put` once and the filter is a
    vectorized `pc.is_in` per batch — no shuffle (guide: semi/anti joins
    broadcast the key set)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"]
    key_ref = ray.put(keys.combine_chunks())

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        mask = pc.invert(pc.is_in(t["o_custkey"], value_set=ks))
        return t.filter(mask)

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(anti, batch_format="pyarrow")


def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """Distinct values of a column: per-batch partial distinct inside
    map_batches, then a tiny groupby — never ships duplicate rows
    (the combiner pattern applied to `unique`)."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"].combine_chunks().unique()})

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.drop_columns(["_c"]), batch_format="pyarrow")
    )


def top_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k by total price without a global sort: per-batch prune to k,
    tiny final merge on the driver. Deterministic tie-break by key."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def local(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k)
    out["rank"] = range(1, len(out) + 1)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
