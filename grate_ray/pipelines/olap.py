"""OLAP reporting shapes over the TPC-H-ish tables (batch 2).

Complements ``relational.py``'s join/top-k/aggregate demos with the
remaining classic report shapes — full Q1 pricing summary, Q6 selective
scan, Q7 nation-pair volume, Q15 top supplier, Q18 large-volume
customers — each expressed combiner-first so every exchange moves
partial rows, not base rows, and every filter is pushed into the
parquet read (row-group pruning; filtered rows never leave storage).

Scale notes per op are in the docstrings; the shared rules:
- genuinely tiny dimensions (nation, supplier at bench scale) broadcast
  via ``ray.put`` and probe with vectorized ``pc.index_in``;
- fact⋈fact edges use the distributed hash join;
- "winner" sets (having-filter survivors, argmax rows) are provably
  small → broadcast back instead of a second shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.num import sql_round


def _broadcast_table(path: str, columns: list[str]) -> "ray.ObjectRef":
    """Read a dimension table fully and ``ray.put`` it ONCE; every task
    reads the same object-store copy (never re-shipped per batch)."""
    t = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(path, columns=columns).to_arrow_refs()
        ]
    )
    return ray.put(t.combine_chunks())


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1, full fidelity: per (returnflag, linestatus) sums of
    qty / base price / discounted price / charge, the three averages and
    the row count, over ``l_shipdate <= 2001-09-01`` (pushed into the
    read). Each batch collapses to ≤|groups| partial rows (6 sums + a
    count) before the exchange, so the shuffle moves O(blocks × 6) rows;
    averages are derived from the summed partials at the end — never a
    second pass."""
    import pyarrow.dataset as pads

    from ..context import configure_shuffle

    configure_shuffle(16)
    cut = np.datetime64("2001-09-01").astype("datetime64[us]")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
        filter=pads.field("l_shipdate") <= pa.scalar(cut),
    )

    part_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("l_linestatus", pa.string()),
            pa.field("s_qty", pa.float64()),
            pa.field("s_price", pa.float64()),
            pa.field("s_disc_price", pa.float64()),
            pa.field("s_charge", pa.float64()),
            pa.field("s_disc", pa.float64()),
            pa.field("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        rf = t["l_returnflag"].to_numpy(zero_copy_only=False)
        ls = t["l_linestatus"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        disc_price = price * (1.0 - disc)
        charge = disc_price * (1.0 + tax)
        key = np.char.add(np.char.add(rf.astype("U8"), "\x1f"), ls.astype("U8"))
        uniq, inv = np.unique(key, return_inverse=True)
        firsts = np.full(len(uniq), -1, dtype=np.int64)
        firsts[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
        return pa.table(
            {
                "l_returnflag": pa.array(rf[firsts], pa.string()),
                "l_linestatus": pa.array(ls[firsts], pa.string()),
                "s_qty": pa.array(np.bincount(inv, weights=qty)),
                "s_price": pa.array(np.bincount(inv, weights=price)),
                "s_disc_price": pa.array(np.bincount(inv, weights=disc_price)),
                "s_charge": pa.array(np.bincount(inv, weights=charge)),
                "s_disc": pa.array(np.bincount(inv, weights=disc)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("s_qty", alias_name="s_qty"),
            Sum("s_price", alias_name="s_price"),
            Sum("s_disc_price", alias_name="s_disc_price"),
            Sum("s_charge", alias_name="s_charge"),
            Sum("s_disc", alias_name="s_disc"),
            Sum("n", alias_name="n"),
        )
    )

    out_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("l_linestatus", pa.string()),
            pa.field("sum_qty", pa.float64()),
            pa.field("sum_base_price", pa.float64()),
            pa.field("sum_disc_price", pa.float64()),
            pa.field("sum_charge", pa.float64()),
            pa.field("avg_qty", pa.float64()),
            pa.field("avg_price", pa.float64()),
            pa.field("avg_disc", pa.float64()),
            pa.field("count_order", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": sql_round(t["s_qty"], 2),
                "sum_base_price": sql_round(t["s_price"], 2),
                "sum_disc_price": sql_round(t["s_disc_price"], 2),
                "sum_charge": sql_round(t["s_charge"], 2),
                "avg_qty": sql_round(
                    pa.array(t["s_qty"].to_numpy(zero_copy_only=False) / n), 6
                ),
                "avg_price": sql_round(
                    pa.array(t["s_price"].to_numpy(zero_copy_only=False) / n), 6
                ),
                "avg_disc": sql_round(
                    pa.array(t["s_disc"].to_numpy(zero_copy_only=False) / n), 6
                ),
                "count_order": t["n"],
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")


def revenue_band(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6 shape: forecast-revenue scan — ONE selective filtered
    sum, all three predicates pushed into the parquet read so non-1997 /
    out-of-band row groups are pruned at storage. Per-batch partial sums
    → a single global Sum; only O(blocks) scalars move."""
    import pyarrow.dataset as pads

    lo = np.datetime64("1997-01-01").astype("datetime64[us]")
    hi = np.datetime64("1998-01-01").astype("datetime64[us]")
    flt = (
        (pads.field("l_shipdate") >= pa.scalar(lo))
        & (pads.field("l_shipdate") < pa.scalar(hi))
        & (pads.field("l_discount") >= 0.04)
        & (pads.field("l_discount") <= 0.06)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=flt,
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = (
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * t["l_discount"].to_numpy(zero_copy_only=False)
        ).sum() if t.num_rows else 0.0
        return pa.table({"revenue": pa.array([float(rev)], pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("revenue")
    out = pa.table(
        {"revenue": sql_round(pa.array([float(total or 0.0)], pa.float64()), 2)}
    )
    return ray.data.from_arrow(out)


def volume_shipping(sf_dir: str, nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> ray.data.Dataset:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    ship year. supplier and customer (→nation name) BROADCAST once —
    both are dimension-sized — so the only exchange is the fact⋈fact
    lineitem⋈orders hash join; each joined batch then collapses to
    ≤ 2 × |years| partial rows before the final tiny groupby."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    nation = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_arrow_refs()
        ]
    )
    name_of = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    keys_ab = {k for k, v in name_of.items() if v in (nation_a, nation_b)}

    supp_ref = _broadcast_table(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"]
    )
    cust_ref = _broadcast_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_nationkey"]
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    pre_schema = pa.schema(
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("s_nat", pa.int32()),
            pa.field("volume", pa.float64()),
            pa.field("l_year", pa.int32()),
        ]
    )

    def tag_supplier(t: pa.Table) -> pa.Table:
        """Resolve supplier nation via the broadcast map and drop
        lineitems whose supplier is outside the pair BEFORE the join."""
        if t.num_rows == 0:
            return pre_schema.empty_table()
        supp = ray.get(supp_ref)
        idx = pc.index_in(
            t["l_suppkey"].combine_chunks(),
            value_set=supp["s_suppkey"].combine_chunks(),
        )
        s_nat = (
            supp["s_nationkey"]
            .to_numpy(zero_copy_only=False)[idx.to_numpy(zero_copy_only=False)]
            .astype(np.int32)
        )
        keep = np.isin(s_nat, np.fromiter(keys_ab, dtype=np.int32))
        vol = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        year = (
            t["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        ).astype(np.int32)
        return pa.table(
            {
                "l_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
                "s_nat": pa.array(s_nat[keep]),
                "volume": pa.array(vol[keep]),
                "l_year": pa.array(year[keep]),
            },
            schema=pre_schema,
        )

    from ..context import nonempty_blocks

    # most blocks filter to empty (2 of N nations survive) and Ray 2.49
    # emits them schema-less, crashing the join aggregator — drop them
    # (ref-level selection; the materialized relation is the pair-filtered
    # slice, ~2/N of lineitem)
    out_schema = pa.schema(
        [
            pa.field("supp_nation", pa.string()),
            pa.field("cust_nation", pa.string()),
            pa.field("l_year", pa.int32()),
            pa.field("revenue", pa.float64()),
        ]
    )

    tagged = nonempty_blocks(li.map_batches(tag_supplier, batch_format="pyarrow"))
    if tagged.count() == 0:
        # Ray 2.49's join crashes on a fully-empty side; an empty pair
        # slice legitimately happens at tiny scale factors
        return ray.data.from_arrow(out_schema.empty_table())
    joined = tagged.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    part_schema = pa.schema(
        [
            pa.field("supp_nation", pa.string()),
            pa.field("cust_nation", pa.string()),
            pa.field("l_year", pa.int32()),
            pa.field("volume", pa.float64()),
        ]
    )
    nat_keys = np.array(sorted(name_of), dtype=np.int32)
    nat_names = np.array([name_of[int(k)] for k in nat_keys], dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        cust = ray.get(cust_ref)
        idx = pc.index_in(
            t["o_custkey"].combine_chunks(),
            value_set=cust["c_custkey"].combine_chunks(),
        )
        c_nat = (
            cust["c_nationkey"]
            .to_numpy(zero_copy_only=False)[idx.to_numpy(zero_copy_only=False)]
            .astype(np.int32)
        )
        s_nat = t["s_nat"].to_numpy(zero_copy_only=False)
        # keep only cross-pair flows (a→b or b→a), never a→a
        keep = np.isin(c_nat, np.fromiter(keys_ab, dtype=np.int32)) & (c_nat != s_nat)
        if not keep.any():
            return part_schema.empty_table()
        s_nat, c_nat = s_nat[keep], c_nat[keep]
        vol = t["volume"].to_numpy(zero_copy_only=False)[keep]
        year = t["l_year"].to_numpy(zero_copy_only=False)[keep]
        # radix packing decodes c_nat with % 100 and year with % 10000 —
        # a key outside those ranges would silently mis-attribute revenue
        if int(max(s_nat.max(), c_nat.max())) >= 100 or int(year.max()) >= 10_000:
            raise ValueError(
                "volume_shipping radix packing requires nationkey < 100 "
                "and year < 10000; widen the radices for this input"
            )
        combo = (
            s_nat.astype(np.int64) * 1_000_000
            + c_nat.astype(np.int64) * 10_000
            + year.astype(np.int64)
        )
        uniq, inv = np.unique(combo, return_inverse=True)
        sv = np.bincount(inv, weights=vol)
        su = (uniq // 1_000_000).astype(np.int32)
        cu = ((uniq // 10_000) % 100).astype(np.int32)
        yu = (uniq % 10_000).astype(np.int32)
        return pa.table(
            {
                "supp_nation": pa.array(
                    nat_names[np.searchsorted(nat_keys, su)], pa.string()
                ),
                "cust_nation": pa.array(
                    nat_names[np.searchsorted(nat_keys, cu)], pa.string()
                ),
                "l_year": pa.array(yu),
                "volume": pa.array(sv),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("volume", alias_name="volume"))
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "supp_nation": t["supp_nation"],
                "cust_nation": t["cust_nation"],
                "l_year": t["l_year"].cast(pa.int32()),
                "revenue": sql_round(t["volume"], 2),
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")


def top_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q15 shape: supplier(s) with max revenue in 1997Q1. Partial
    revenue per suppkey inside each batch (supplier cardinality ≪ rows,
    so batches collapse hard), ONE keyed hop sums them, the global max
    is a single-scalar aggregate, and the winner filter + supplier-name
    probe run on the already-tiny aggregate. Revenue is rounded BEFORE
    the max comparison (mirroring the oracle) so float summation order
    can never flip the winner set."""
    import pyarrow.dataset as pads

    from ..context import configure_shuffle

    configure_shuffle(16)
    lo = np.datetime64("1997-01-01").astype("datetime64[us]")
    hi = np.datetime64("1997-04-01").astype("datetime64[us]")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(lo))
            & (pads.field("l_shipdate") < pa.scalar(hi))
        ),
    )

    part_schema = pa.schema(
        [pa.field("s_suppkey", pa.int64()), pa.field("revenue", pa.float64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        uniq, inv = np.unique(sk, return_inverse=True)
        return pa.table(
            {
                "s_suppkey": pa.array(uniq),
                "revenue": pa.array(np.bincount(inv, weights=rev)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    def rounded(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"].cast(pa.int64()),
                "revenue": sql_round(t["revenue"], 2),
            },
            schema=part_schema,
        )

    rounded_ds = agg.map_batches(rounded, batch_format="pyarrow")
    mx = rounded_ds.max("revenue")

    supp_ref = _broadcast_table(f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_name"])
    out_schema = pa.schema(
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_name", pa.string()),
            pa.field("total_revenue", pa.float64()),
        ]
    )

    def winners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keep = pc.equal(t["revenue"], pa.scalar(float(mx)))
        t = t.filter(keep)
        if t.num_rows == 0:
            return out_schema.empty_table()
        supp = ray.get(supp_ref)
        idx = pc.index_in(
            t["s_suppkey"].combine_chunks(),
            value_set=supp["s_suppkey"].combine_chunks(),
        )
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": supp["s_name"].take(idx),
                "total_revenue": t["revenue"],
            },
            schema=out_schema,
        )

    return rounded_ds.map_batches(winners, batch_format="pyarrow")


def large_volume_customers(sf_dir: str, threshold: float = 300.0) -> ray.data.Dataset:
    """TPC-H Q18 shape: orders whose total quantity exceeds ``threshold``
    joined back to customer names. Per-batch partial sums by orderkey,
    ONE high-cardinality keyed hop, HAVING filter leaves a provably tiny
    winner set → winners BROADCAST to a filtered probe of orders (no
    second shuffle), then the customer-name lookup probes the broadcast
    customer dimension."""
    from ..context import configure_shuffle

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    part_schema = pa.schema(
        [pa.field("o_orderkey", pa.int64()), pa.field("sum_qty", pa.float64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "o_orderkey": pa.array(uniq),
                "sum_qty": pa.array(np.bincount(inv, weights=qty)),
            },
            schema=part_schema,
        )

    from ..context import join_partitions

    def reduce_block(t: pa.Table) -> pa.Table:
        """Block-local final sum + fused HAVING. A keyed repartition plus
        this reduce beats ``groupby().aggregate(Sum)`` 3.4× at 1.5M keys
        (17.3 s vs 58.7 s on the 6M-row sf1 tiling): the hash exchange
        cost is identical, but the per-key overhead of the generic hash
        aggregator dwarfs one vectorized np reduce per block."""
        if t.num_rows == 0:
            return part_schema.empty_table()
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["sum_qty"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ok, return_inverse=True)
        tot = np.bincount(inv, weights=s)
        keep = tot > threshold
        return pa.table(
            {
                "o_orderkey": pa.array(uniq[keep]),
                "sum_qty": pa.array(tot[keep]),
            },
            schema=part_schema,
        )

    big = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["o_orderkey"])
        .map_batches(reduce_block, batch_format="pyarrow", batch_size=None)
    )
    big_parts = [
        t for t in (ray.get(r) for r in big.to_arrow_refs()) if t.num_columns
    ]
    big_tbl = (
        pa.concat_tables(big_parts).combine_chunks()
        if big_parts
        else part_schema.empty_table()
    )
    qty_of = ray.put(big_tbl)

    cust_ref = _broadcast_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_name"]
    )

    out_schema = pa.schema(
        [
            pa.field("c_name", pa.string()),
            pa.field("c_custkey", pa.int64()),
            pa.field("o_orderkey", pa.int64()),
            pa.field("o_orderdate", pa.timestamp("us")),
            pa.field("o_totalprice", pa.float64()),
            pa.field("sum_qty", pa.float64()),
        ]
    )

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        big_t = ray.get(qty_of)
        idx = pc.index_in(
            t["o_orderkey"].combine_chunks(),
            value_set=big_t["o_orderkey"].combine_chunks(),
        )
        mask = pc.is_valid(idx)
        t = t.filter(mask)
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = idx.filter(mask)
        cust = ray.get(cust_ref)
        cidx = pc.index_in(
            t["o_custkey"].combine_chunks(),
            value_set=cust["c_custkey"].combine_chunks(),
        )
        return pa.table(
            {
                "c_name": cust["c_name"].take(cidx),
                "c_custkey": t["o_custkey"].cast(pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "sum_qty": big_t["sum_qty"].take(idx),
            },
            schema=out_schema,
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return orders.map_batches(probe, batch_format="pyarrow")


def shipping_delay_stats(sf_dir: str) -> ray.data.Dataset:
    """Order-to-ship latency profile per order priority: mean and
    population stddev of (l_shipdate − o_orderdate) in days. The
    orders⋈lineitem edge is a DISTRIBUTED hash join (both are facts);
    each joined batch collapses to per-priority moment partials before
    the tiny final groupby."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    part_schema = pa.schema(
        [
            pa.field("o_orderpriority", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s", pa.float64()),
            pa.field("ss", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        days = (
            (ship.astype("datetime64[D]") - od.astype("datetime64[D]"))
            .astype(np.int64)
            .astype(np.float64)
        )
        prio = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(prio, return_inverse=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(uniq, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(np.bincount(inv, weights=days)),
                "ss": pa.array(np.bincount(inv, weights=days * days)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )

    out_schema = pa.schema(
        [
            pa.field("o_orderpriority", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("mean_days", pa.float64()),
            pa.field("sd_days", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        ss = t["ss"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = ss / n - mean * mean
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n": t["n"].cast(pa.int64()),
                "mean_days": sql_round(pa.array(mean), 6),
                "sd_days": sql_round(pa.array(np.sqrt(np.maximum(var, 0.0))), 6),
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")


def returned_items(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """TPC-H Q10 shape (returned-item report): revenue lost to returned
    lineitems per customer, top-k by revenue. The returnflag filter is
    pushed into the lineitem read; lineitem⋈orders is a DISTRIBUTED
    fact⋈fact hash join; the customer attributes probe from ONE
    broadcast copy (dimension-sized at bench scale); per-batch partial
    sums key by custkey so the final exchange moves one row per
    (block, customer). Top-k finish = block prune → single-block rank."""
    import pyarrow.dataset as pads

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust_ref = _broadcast_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_name", "c_acctbal"]
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    part_schema = pa.schema(
        [
            pa.field("c_custkey", pa.int64()),
            pa.field("revenue", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        uniq, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "c_custkey": pa.array(uniq),
                "revenue": pa.array(np.bincount(inv, weights=rev)),
            },
            schema=part_schema,
        )

    def merge_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rv = t["revenue"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ck, return_inverse=True)
        sums = np.bincount(inv, weights=rv)
        order = np.lexsort((uniq, -np.round(sums, 2)))[:k]
        return pa.table(
            {
                "c_custkey": pa.array(uniq[order]),
                "revenue": pa.array(sums[order]),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("c_custkey", pa.int64()),
            pa.field("c_name", pa.string()),
            pa.field("c_acctbal", pa.float64()),
            pa.field("revenue", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        t = merge_topk(t)
        if t.num_rows == 0:
            return out_schema.empty_table()
        cust = ray.get(cust_ref)
        idx = pc.index_in(
            t["c_custkey"].combine_chunks(),
            value_set=cust["c_custkey"].combine_chunks(),
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": cust["c_name"].take(idx),
                "c_acctbal": cust["c_acctbal"].take(idx),
                "revenue": sql_round(t["revenue"], 2),
            },
            schema=out_schema,
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["c_custkey"])
        .map_batches(merge_topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def small_qty_revenue(sf_dir: str, frac: float = 0.5) -> ray.data.Dataset:
    """TPC-H Q17 shape (small-quantity-order revenue): yearly-equivalent
    revenue of lineitems whose quantity is below ``frac`` x their part's
    average. Pass 1 is a combiner-first per-part mean (exchange:
    one (block, part) row); the per-part thresholds come back as ONE
    broadcast (parts are dimension-sized); pass 2 re-scans lineitem and
    filters against the broadcast — no join shuffle anywhere."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle

    configure_shuffle(16)
    cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    part_schema = pa.schema(
        [
            pa.field("l_partkey", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("s", pa.float64()),
        ]
    )

    def qty_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(pk, return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(uniq),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(np.bincount(inv, weights=q)),
            },
            schema=part_schema,
        )

    means = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )
    blocks = [ray.get(r) for r in means.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]  # empties carry no schema
    mt = pa.concat_tables(blocks).combine_chunks()
    pk = mt["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    thresh = frac * (
        mt["s"].to_numpy(zero_copy_only=False)
        / mt["n"].to_numpy(zero_copy_only=False)
    )
    order = np.argsort(pk)
    thresh_ref = ray.put((pk[order], np.round(thresh[order], 6)))

    out_schema = pa.schema(
        [pa.field("n_items", pa.int64()), pa.field("avg_yearly", pa.float64())]
    )

    def below(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "s": pa.array([0.0])}
            )
        keys, th = ray.get(thresh_ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        hit = q < th[np.searchsorted(keys, p)]
        return pa.table(
            {
                "n": pa.array([int(hit.sum())], pa.int64()),
                "s": pa.array([float(e[hit].sum())]),
            }
        )

    totals = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        .map_batches(below, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "n_items": pa.array(
                        [int(pc.sum(t["n"]).as_py() or 0)], pa.int64()
                    ),
                    # 2dp: the sum is ~1e9-scale, so float summation
                    # order costs ~1e-5 — 6dp would be order-dependent
                    "avg_yearly": sql_round(
                        pa.array([float(pc.sum(t["s"]).as_py() or 0.0) / 7.0]), 2
                    ),
                },
                schema=out_schema,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    return totals


def disjunct_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q19 shape (disjunctive predicate revenue): revenue of
    lineitems matching ANY of three (brand, size-range, qty-range)
    clauses. Part attributes probe from ONE broadcast copy; the OR-of-
    ANDs evaluates as three vectorized boolean masks per batch; each
    batch collapses to one (n, sum) scalar row — the exchange moves
    O(blocks) rows."""
    from ..context import configure_shuffle

    configure_shuffle(8)
    part_ref = _broadcast_table(
        f"{sf_dir}/part.parquet", ["p_partkey", "p_brand", "p_size"]
    )

    out_schema = pa.schema(
        [pa.field("n_items", pa.int64()), pa.field("revenue", pa.float64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "s": pa.array([0.0])}
            )
        part = ray.get(part_ref)
        idx = pc.index_in(
            t["l_partkey"].combine_chunks(),
            value_set=part["p_partkey"].combine_chunks(),
        ).to_numpy(zero_copy_only=False)
        brand = part["p_brand"].to_numpy(zero_copy_only=False)[idx]
        size = part["p_size"].to_numpy(zero_copy_only=False)[idx]
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        hit = (
            ((brand == "Brand#1") & (size >= 1) & (size <= 15) & (q >= 1) & (q <= 11))
            | ((brand == "Brand#2") & (size >= 1) & (size <= 25) & (q >= 10) & (q <= 20))
            | ((brand == "Brand#3") & (size >= 1) & (size <= 35) & (q >= 20) & (q <= 30))
        )
        rev = e[hit] * (1.0 - d[hit])
        return pa.table(
            {
                "n": pa.array([int(hit.sum())], pa.int64()),
                "s": pa.array([float(rev.sum())]),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "n_items": pa.array(
                        [int(pc.sum(t["n"]).as_py() or 0)], pa.int64()
                    ),
                    "revenue": sql_round(
                        pa.array([float(pc.sum(t["s"]).as_py() or 0.0)]), 2
                    ),
                },
                schema=out_schema,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def idle_customers(sf_dir: str, big_order: float = 400_000.0) -> ray.data.Dataset:
    """TPC-H Q22 shape (global-average filter + anti join): per market
    segment, the count and total balance of customers whose balance
    beats the positive-balance average AND who never placed a
    large (> ``big_order``) order. The global average is one
    combiner-first scalar pass; the large-order custkey set ships as
    ONE broadcast distinct relation (bounded by |customers|,
    dimension-sized here) probed with a sorted-membership search — the
    anti join never shuffles the fact; the totalprice predicate is
    pushed into the orders read."""
    import pyarrow.dataset as pads

    from ..context import configure_shuffle

    configure_shuffle(8)
    cust_cols = ["c_custkey", "c_acctbal", "c_mktsegment"]

    # pass 1: positive-balance average (tiny combiner relation)
    def bal_partial(t: pa.Table) -> pa.Table:
        b = t["c_acctbal"].to_numpy(zero_copy_only=False)
        b = b[b > 0.0]
        return pa.table(
            {"n": pa.array([len(b)], pa.int64()), "s": pa.array([float(b.sum())])}
        )

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
            )
            .map_batches(bal_partial, batch_format="pyarrow")
            .to_arrow_refs()
        ]
    )
    n = int(pc.sum(parts["n"]).as_py() or 0)
    avg = round(float(pc.sum(parts["s"]).as_py() or 0.0) / max(n, 1), 6)

    # pass 2: distinct ordering customers, broadcast once
    def distinct_cust(t: pa.Table) -> pa.Table:
        u = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"c": pa.array(u.astype(np.int64))})

    ordered = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey"],
                filter=pads.field("o_totalprice") > big_order,
            )
            .map_batches(distinct_cust, batch_format="pyarrow")
            .to_arrow_refs()
        ]
    )
    ordered_ref = ray.put(
        np.unique(ordered["c"].to_numpy(zero_copy_only=False))
    )

    part_schema = pa.schema(
        [
            pa.field("c_mktsegment", pa.string()),
            pa.field("n_cust", pa.int64()),
            pa.field("total_bal", pa.float64()),
        ]
    )

    def segment_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        have = ray.get(ordered_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(have, ck)
        in_orders = (pos < len(have)) & (have[np.minimum(pos, len(have) - 1)] == ck)
        keep = (bal > avg) & ~in_orders
        if not keep.any():
            return part_schema.empty_table()
        seg, bal = seg[keep], bal[keep]
        uniq, inv = np.unique(seg, return_inverse=True)
        return pa.table(
            {
                "c_mktsegment": pa.array(uniq, pa.string()),
                "n_cust": pa.array(np.bincount(inv).astype(np.int64)),
                "total_bal": pa.array(np.bincount(inv, weights=bal)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cust_cols)
        .map_batches(segment_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("total_bal", alias_name="total_bal"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_cust": t["n_cust"].cast(pa.int64()),
                "total_bal": sql_round(t["total_bal"], 2),
            },
            schema=part_schema,
        ),
        batch_format="pyarrow",
    )


def nation_profit(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q9 shape (profit by supplier nation x order year, sans
    partsupp): revenue = extendedprice x (1 - discount) of each lineitem,
    attributed to its supplier's nation and its order's year. The
    lineitem⋈orders edge is the one DISTRIBUTED fact⋈fact hash join;
    supplier→nation attributes probe from a broadcast; per-batch
    partials key by (nation, year) so the final exchange is
    dimension-bounded."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    supp_ref = _broadcast_table(
        f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"]
    )
    nation_ref = _broadcast_table(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_name"]
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    part_schema = pa.schema(
        [
            pa.field("nation", pa.string()),
            pa.field("o_year", pa.int32()),
            pa.field("profit", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        supp = ray.get(supp_ref)
        nat = ray.get(nation_ref)
        sidx = pc.index_in(
            t["l_suppkey"].combine_chunks(),
            value_set=supp["s_suppkey"].combine_chunks(),
        ).to_numpy(zero_copy_only=False)
        snat = supp["s_nationkey"].to_numpy(zero_copy_only=False)[sidx]
        nidx = pc.index_in(
            pa.array(snat), value_set=nat["n_nationkey"].combine_chunks()
        ).to_numpy(zero_copy_only=False)
        names = nat["n_name"].to_numpy(zero_copy_only=False).astype(object)[nidx]
        year = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        ).astype(np.int64)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        # factorize (nation, year) without truncating string casts
        ns, ni = np.unique(names, return_inverse=True)
        ys, yi = np.unique(year, return_inverse=True)
        ny = len(ys)
        uniq, inv = np.unique(ni * ny + yi, return_inverse=True)
        return pa.table(
            {
                "nation": pa.array(ns[uniq // ny], pa.string()),
                "o_year": pa.array((ys[uniq % ny]).astype(np.int32)),
                "profit": pa.array(np.bincount(inv, weights=rev)),
            },
            schema=part_schema,
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["nation", "o_year"])
        .aggregate(Sum("profit", alias_name="profit"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "nation": t["nation"],
                "o_year": t["o_year"].cast(pa.int32()),
                "profit": sql_round(t["profit"], 2),
            },
            schema=part_schema,
        ),
        batch_format="pyarrow",
    )


def market_basket(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Pairwise frequent-itemset mining over orders (the market-basket
    co-occurrence report): the k part pairs bought together in the most
    orders. Per-batch (order, part) dedup → ONE order-keyed hop (each
    order's items land whole) → per-block triangular pair expansion
    (orders hold a handful of items, so pairs grow linearly in rows) →
    a pair-keyed count hop → block-pruned top-k. No global sort; the
    pair relation is the only fact-sized exchange and it is
    support-ordered only at the final single block."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    op_schema = pa.schema(
        [pa.field("l_orderkey", pa.int64()), pa.field("l_partkey", pa.int64())]
    )

    def dedup_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return op_schema.empty_table()
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pu, pi = np.unique(p, return_inverse=True)
        _, first = np.unique(o * len(pu) + pi, return_index=True)
        return pa.table(
            {"l_orderkey": pa.array(o[first]), "l_partkey": pa.array(p[first])},
            schema=op_schema,
        )

    pair_schema = pa.schema(
        [
            pa.field("part_a", pa.int64()),
            pa.field("part_b", pa.int64()),
            pa.field("n_orders", pa.int64()),
        ]
    )

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        # block-level re-dedup (same (order, part) may arrive from many
        # source batches)
        keep = np.empty(len(o), dtype=bool)
        keep[0] = True
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        new = np.empty(len(o), dtype=bool)
        new[0] = True
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(o)))
        pa_, pb_ = [], []
        for s, ln in zip(starts, lens):  # ln is items-per-order: tiny
            if ln < 2:
                continue
            ii, jj = np.triu_indices(ln, k=1)
            pa_.append(p[s + ii])
            pb_.append(p[s + jj])
        if not pa_:
            return pair_schema.empty_table()
        aa = np.concatenate(pa_)
        bb = np.concatenate(pb_)
        big = int(max(aa.max(), bb.max())) + 1
        uniq, inv = np.unique(aa * big + bb, return_inverse=True)
        return pa.table(
            {
                "part_a": pa.array(uniq // big),
                "part_b": pa.array(uniq % big),
                "n_orders": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=pair_schema,
        )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        a = t["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a, -n))[:k]
        return pa.table(
            {
                "part_a": pa.array(a[order]),
                "part_b": pa.array(b[order]),
                "n_orders": pa.array(n[order]),
            },
            schema=pair_schema,
        )

    def pair_reduce(t: pa.Table) -> pa.Table:
        # ~1.2M distinct pairs at sf0.1: the generic hash aggregator is
        # 3-4x slower than a keyed repartition + one vectorized block
        # reduce above ~100k groups (BASELINE.md guidance) — reduce here
        if t.num_rows == 0:
            return pair_schema.empty_table()
        a = t["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
        big = int(max(a.max(), b.max())) + 1
        uniq, inv = np.unique(a * big + b, return_inverse=True)
        return pa.table(
            {
                "part_a": pa.array(uniq // big),
                "part_b": pa.array(uniq % big),
                "n_orders": pa.array(np.bincount(inv, weights=n).astype(np.int64)),
            },
            schema=pair_schema,
        )

    return (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["l_orderkey"])
        .map_batches(pairs_block, batch_format="pyarrow", batch_size=None)
        .repartition(join_partitions(32), keys=["part_a", "part_b"])
        .map_batches(pair_reduce, batch_format="pyarrow", batch_size=None)
        .map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def orders_rfm(
    sf_dir: str,
    asof: str = "2001-12-31",
    recency_cut_days: tuple[int, int] = (365, 1095),
    freq_cuts: tuple[int, int] = (9, 12),
    money_cuts: tuple[float, float] = (2_100_000.0, 2_900_000.0),
) -> ray.data.Dataset:
    """RFM segmentation (fixed cuts, deterministic): each customer's
    recency (days from last order to ``asof``), frequency (order count)
    and monetary total bucket into 3 bands each; output counts per
    R/F/M cell. Per-batch partials key by custkey (one row per
    (block, customer)), ONE customer-keyed hop resolves the triple,
    and the final cell count hop is 27-row-bounded."""
    from ray.data.aggregate import Max, Sum

    from ..context import configure_shuffle

    configure_shuffle(16)
    asof_us = np.datetime64(asof).astype("datetime64[us]").astype(np.int64)
    day_us = 24 * 3600 * 1_000_000

    part_schema = pa.schema(
        [
            pa.field("o_custkey", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("total", pa.float64()),
            pa.field("last_us", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tp = t["o_totalprice"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ck, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, od)
        return pa.table(
            {
                "o_custkey": pa.array(uniq),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "total": pa.array(np.bincount(inv, weights=tp)),
                "last_us": pa.array(mx),
            },
            schema=part_schema,
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("total", alias_name="total"),
            Max("last_us", alias_name="last_us"),
        )
    )

    cell_schema = pa.schema(
        [
            pa.field("r_band", pa.int32()),
            pa.field("f_band", pa.int32()),
            pa.field("m_band", pa.int32()),
            pa.field("n_customers", pa.int64()),
        ]
    )

    def cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = t["total"].to_numpy(zero_copy_only=False)
        last = t["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        rec_days = (asof_us - last) // day_us
        r = np.where(rec_days <= recency_cut_days[0], 0,
                     np.where(rec_days <= recency_cut_days[1], 1, 2))
        f = np.where(n >= freq_cuts[1], 0, np.where(n >= freq_cuts[0], 1, 2))
        m = np.where(total >= money_cuts[1], 0,
                     np.where(total >= money_cuts[0], 1, 2))
        key = r * 9 + f * 3 + m
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "r_band": pa.array((uniq // 9).astype(np.int32)),
                "f_band": pa.array(((uniq // 3) % 3).astype(np.int32)),
                "m_band": pa.array((uniq % 3).astype(np.int32)),
                "n_customers": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=cell_schema,
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        agg.map_batches(cells, batch_format="pyarrow")
        .groupby(["r_band", "f_band", "m_band"])
        .aggregate(_Sum("n_customers", alias_name="n_customers"))
        .map_batches(
            lambda t: pa.table(
                {
                    "r_band": t["r_band"].cast(pa.int32()),
                    "f_band": t["f_band"].cast(pa.int32()),
                    "m_band": t["m_band"].cast(pa.int32()),
                    "n_customers": t["n_customers"].cast(pa.int64()),
                },
                schema=cell_schema,
            ),
            batch_format="pyarrow",
        )
    )
