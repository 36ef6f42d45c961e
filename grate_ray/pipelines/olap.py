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
