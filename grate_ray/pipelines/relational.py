"""Relational demo pipelines over the TPC-H-ish tables.

Not part of the CDC core, but they demonstrate the engine's generic
query-processing idioms at scale (SURVEY.md §2.5/§2.4/§2.6):

- partial aggregation inside ``map_batches`` before the (tiny) groupby —
  the combiner pattern every wide aggregate should use;
- fact⋈fact edges as distributed hash joins; ONLY genuinely tiny
  dimensions (nation: 25 rows) are broadcast, probed with vectorized
  ``pc.index_in`` — never a per-row Python dict lookup;
- top-k: per-batch local prune, single-block final rank — lazy end to
  end, never a global sort, never a driver materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.num import sql_round


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
            t = t.set_column(i, c, sql_round(t[c], 2))
        return t

    return agg.map_batches(rounded, batch_format="pyarrow")


def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation rollup with each side treated at its
    true size: the fact-sized orders⋈customer edge is a DISTRIBUTED hash
    join (customer scales with the data — it must never become a driver
    dict), while the 25-row nation map is the genuine broadcast-small-side
    (the reference's shared-string-table lookup pattern, SURVEY.md §2.4),
    probed per batch with a vectorized ``pc.index_in`` take."""
    import pyarrow.parquet as pq

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    ref = ray.put(
        (nation["n_nationkey"].combine_chunks(), nation["n_name"].combine_chunks())
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def tag_nation(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        nkeys, nnames = ray.get(ref)
        idx = pc.index_in(t["c_nationkey"], value_set=nkeys)
        return pa.table(
            {"n_name": nnames.take(idx), "o_totalprice": t["o_totalprice"]}
        )

    from ray.data.aggregate import Count, Sum

    agg = joined.map_batches(tag_nation, batch_format="pyarrow").groupby(
        "n_name"
    ).aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price")
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_price"),
            "total_price",
            sql_round(t["total_price"], 2),
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


def top_orders(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k by total price without a global sort: per-batch prune to k
    (only n_blocks×k rows ever move), single-block final prune + rank —
    a lazy Dataset end to end like every sibling pipeline, no driver
    materialization. Deterministic tie-break by key."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def local(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    def final(t: pa.Table) -> pa.Table:
        t = local(t)
        import numpy as np

        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
