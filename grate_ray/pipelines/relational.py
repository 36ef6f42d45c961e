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


def orders_semi_join_segment(
    sf_dir: str, segment: str = "BUILDING"
) -> ray.data.Dataset:
    """Semi-join via broadcast key set (the complement of
    ``orders_anti_join_segment``): orders whose customer IS in the given
    market segment — membership only, never duplicating rows the way an
    inner join against a many-row dimension would. Key set ``ray.put``
    once, vectorized ``pc.is_in`` per batch, no shuffle; at a key-set
    size where broadcast stops fitting, the same semantics fall back to
    the distributed hash join + distinct."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"]
    key_ref = ray.put(keys.combine_chunks())

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        return t.filter(pc.is_in(t["o_custkey"], value_set=ks))

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(semi, batch_format="pyarrow")


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


def grouped_topk(sf_dir: str, k: int = 3, n_parts: int = 32) -> ray.data.Dataset:
    """Per-GROUP top-k (top ``k`` events per user by value): the combiner
    pattern applied per group — every batch prunes each group to its
    local k BEFORE the shuffle (only n_blocks × groups_in_block × k rows
    move), then one keyed repartition co-locates each user and the same
    vectorized segment head-k assigns exact ranks. No per-group Python,
    no global sort; the wide step ships pre-pruned rows only."""
    import numpy as np

    from ..context import configure_shuffle

    configure_shuffle(n_parts)  # keyed repartition requires hash shuffle
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def _headk(t: pa.Table, with_rank: bool) -> pa.Table:
        if t.num_rows == 0:
            out = t
            if with_rank:
                out = out.append_column("rank", pa.array([], pa.int64()))
            return out
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))  # per user: value desc, id asc
        g = uid[order]
        starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]]))
        lens = np.diff(np.append(starts, len(g)))
        rank = np.arange(len(g)) - np.repeat(starts, lens)
        keep = rank < k
        out = t.take(pa.array(order[keep]))
        if with_rank:
            out = out.append_column(
                "rank", pa.array((rank[keep] + 1).astype(np.int64))
            )
        return out

    def prune(t: pa.Table) -> pa.Table:
        return _headk(t, with_rank=False)

    def final(t: pa.Table) -> pa.Table:
        return _headk(t, with_rank=True)

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .repartition(n_parts, keys=["user_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


_PROFILE_COLS = {
    # column → kind: 'int' renders str(v); 'float' renders %.6f; 'str' raw.
    # Rendering is injective per kind, so distinct-on-rendered == distinct,
    # and min/max reduce on NATIVE values (rendered only at the very end).
    "event_id": "int",
    "event_type": "str",
    "user_id": "int",
    "value": "float",
}


def profile_table(sf_dir: str) -> pa.Table:
    """Data profiling of the events table: one row per column with
    (n, n_null, n_distinct, min_val, max_val).

    Scale shape: stats come from ONE pass of per-batch partials (a single
    tiny row per column per batch — counts + native min/max), reduced by
    one small groupby; distinct counts come from the combiner-distinct
    pattern (per-batch unique values only, never raw rows) + one keyed
    repartition. Driver only ever sees per-column rollups."""
    from ray.data.aggregate import Max, Min, Sum

    from ..context import configure_shuffle

    configure_shuffle(16)
    cols = list(_PROFILE_COLS)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def stat_partials(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            arr = t[c]
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(int(pc.sum(pc.is_null(arr).cast(pa.int64())).as_py() or 0))
            # native min/max, carried as float64 for numerics / None for
            # strings (string min/max rides the rendered distinct relation)
            if _PROFILE_COLS[c] == "str":
                mins.append(None)
                maxs.append(None)
            else:
                mn = pc.min(arr).as_py()
                mx = pc.max(arr).as_py()
                mins.append(None if mn is None else float(mn))
                maxs.append(None if mx is None else float(mx))
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "mn": pa.array(mins, pa.float64()),
                "mx": pa.array(maxs, pa.float64()),
            }
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="n_null", alias_name="n_null"),
            Min(on="mn", alias_name="mn"),
            Max(on="mx", alias_name="mx"),
        )
        .to_pandas()
        .set_index("col")
    )

    def distinct_partials(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            arr = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            uniq = pc.drop_null(arr).unique()
            # Arrow's numeric→string cast is INJECTIVE (shortest
            # round-trip for floats), so distinct-on-rendered == native
            # distinct; a fixed-precision format would collide values
            if not pa.types.is_string(uniq.type):
                uniq = pc.cast(uniq, pa.string())
            names.append(pa.nulls(len(uniq), pa.string()).fill_null(c))
            vals.append(uniq)
        return pa.table(
            {
                "col": pa.concat_arrays([n.combine_chunks() if isinstance(n, pa.ChunkedArray) else n for n in names]),
                "val": pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]),
            }
        )

    # distinct: keyed repartition co-locates every (col, val) pair in one
    # block; per-block pandas drop_duplicates + tiny per-col rollup beats
    # Ray's HashAggregate at value-cardinality (~1s per 100k groups)
    def block_distinct(df):
        u = df.drop_duplicates()
        g = u.groupby("col")["val"]
        out = g.agg(["size", "min", "max"]).reset_index()
        out.columns = ["col", "n_distinct", "smin", "smax"]
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out

    dparts = (
        ds.map_batches(distinct_partials, batch_format="pyarrow")
        .repartition(16, keys=["col", "val"])
        .map_batches(block_distinct, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    dagg = dparts.groupby("col").agg(
        n_distinct=("n_distinct", "sum"), smin=("smin", "min"), smax=("smax", "max")
    )
    ndist = dagg[["n_distinct"]]
    # string columns: min/max are the lexicographic ends of the distinct
    # relation — matches SQL min/max over VARCHAR
    str_mm = dagg[["smin", "smax"]]

    def render(c: str, v) -> str:
        kind = _PROFILE_COLS[c]
        if kind == "str":
            return str(str_mm.loc[c, "smin" if v == "min" else "smax"])
        x = stats.loc[c, "mn" if v == "min" else "mx"]
        return f"{x:.6f}" if kind == "float" else str(int(x))

    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array([int(stats.loc[c, "n"]) for c in cols], pa.int64()),
            "n_null": pa.array(
                [int(stats.loc[c, "n_null"]) for c in cols], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(ndist.loc[c, "n_distinct"]) for c in cols], pa.int64()
            ),
            "min_val": pa.array([render(c, "min") for c in cols], pa.string()),
            "max_val": pa.array([render(c, "max") for c in cols], pa.string()),
        }
    )


def exact_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    nbins: int = 4096,
    max_pull: int = 200_000,
    ds: "ray.data.Dataset | None" = None,
    col: str = "o_totalprice",
    prefix: str = "p",
) -> pa.Table:
    """EXACT distributed quantiles (k-th smallest, k = ceil(q·n)) by
    iterative histogram refinement — the classic scale shape for exact
    order statistics without a global sort:

      1. one stats pass (min/max/count);
      2. one histogram pass per refinement level: per-batch ``bincount``
         partials (≤ nbins tiny rows per batch) → one small groupby —
         the driver only ever sees ≤ nbins counter rows;
      3. each level narrows every unresolved quantile's candidate range
         by ~nbins×; when all candidate ranges together hold ≤
         ``max_pull`` values, ONE filtered pull sorts them locally and
         reads off the exact answers.

    Correctness is independent of the (float) binning: bins only narrow
    the range, the answer is always the exact k-th smallest element.
    log_nbins(n) passes: 2 levels cover 16M rows, 3 cover 10^10."""
    import math

    import numpy as np
    from ray.data.aggregate import Count, Max, Min, Sum

    if ds is None:
        ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=[col])
    ds = ds.materialize()  # 4 refinement passes re-read the same input

    stats = ds.aggregate(Min(col), Max(col), Count())
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    n = int(stats["count()"])
    # target ranks (1-based, global): k-th smallest
    want = {f"{prefix}{int(q * 100)}": math.ceil(q * n) for q in qs}

    # candidate value range per quantile; narrowing only — the exact rank
    # is recomputed globally at the pull, so float bin-edge jitter can
    # never shift the answer (ranges are padded a hair for the same reason)
    state = {name: (lo, hi) for name in want}

    for _level in range(4):
        ranges = dict(state)

        def histo(t: pa.Table, ranges=ranges) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            names, bins, cnts = [], [], []
            for name, (rlo, rhi) in ranges.items():
                w = (rhi - rlo) / nbins or 1.0
                sel = v[(v >= rlo) & (v <= rhi)]
                b = np.clip(((sel - rlo) / w).astype(np.int64), 0, nbins - 1)
                c = np.bincount(b, minlength=nbins)
                nz = np.flatnonzero(c)
                names += [name] * len(nz)
                bins += nz.tolist()
                cnts += c[nz].tolist()
            return pa.table(
                {
                    "name": pa.array(names, pa.string()),
                    "bin": pa.array(bins, pa.int64()),
                    "cnt": pa.array(cnts, pa.int64()),
                }
            )

        hist = (
            ds.map_batches(histo, batch_format="pyarrow")
            .groupby(["name", "bin"])
            .aggregate(Sum(on="cnt", alias_name="cnt"))
            .to_pandas()
        )
        # within-range rank of each target (level 0: the range is
        # everything, so it's the global k; later levels: recomputed
        # exactly from a below-range count pass after each narrowing)
        if _level == 0:
            state_rank = dict(want)
        total_cand = 0
        new_state = {}
        for name, (rlo, rhi) in state.items():
            h = hist[hist["name"] == name].sort_values("bin")
            w = (rhi - rlo) / nbins or 1.0
            cum = h["cnt"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, state_rank[name]))
            b = int(h["bin"].iloc[pos])
            in_bin = int(h["cnt"].iloc[pos])
            pad = w * 1e-9 + 1e-9
            blo = max(rlo, rlo + b * w - pad)
            bhi = rhi if b == nbins - 1 else min(rhi, rlo + (b + 1) * w + pad)
            new_state[name] = (blo, bhi)
            total_cand += in_bin
        state = new_state
        if total_cand <= max_pull:
            break
        state_rank = _ranks_within(ds, col, state, want)

    # final exact pull of only the candidate values
    ranges = dict(state)

    def pull(t: pa.Table, ranges=ranges) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        names, vals = [], []
        for name, (rlo, rhi) in ranges.items():
            sel = v[(v >= rlo) & (v <= rhi)]
            names += [name] * len(sel)
            vals += sel.tolist()
        return pa.table(
            {"name": pa.array(names, pa.string()), "v": pa.array(vals, pa.float64())}
        )

    cand = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
    ranks = _ranks_within(ds, col, state, want)
    out_names, out_vals = [], []
    for name in sorted(state):
        vals = np.sort(cand[cand["name"] == name]["v"].to_numpy())
        k = ranks[name]
        assert 1 <= k <= len(vals), (name, k, len(vals))
        out_names.append(name)
        out_vals.append(float(vals[k - 1]))
    return pa.table(
        {"q": pa.array(out_names, pa.string()), "value": pa.array(out_vals, pa.float64())}
    )


def _ranks_within(ds, col: str, ranges: dict, want: dict) -> dict:
    """Exact global rank of each target inside its candidate range:
    k_within = k_global − count(values strictly below range_lo). One
    cheap pass of per-batch partial counts (len(ranges) rows per batch)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def below(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        names = list(ranges.keys())
        cnts = [int((v < ranges[name][0]).sum()) for name in names]
        return pa.table(
            {"name": pa.array(names, pa.string()), "below": pa.array(cnts, pa.int64())}
        )

    agg = (
        ds.map_batches(below, batch_format="pyarrow")
        .groupby("name")
        .aggregate(Sum(on="below", alias_name="below"))
        .to_pandas()
    )
    below_by = dict(zip(agg["name"], agg["below"].astype(int)))
    return {name: want[name] - int(below_by.get(name, 0)) for name in ranges}


def top_orders(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k by total price without a global sort: per-batch prune to k
    (only n_blocks×k rows ever move), single-block final prune + rank —
    a lazy Dataset end to end like every sibling pipeline, no driver
    materialization. Deterministic tie-break by key."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
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


def global_rank(
    ds: ray.data.Dataset, num_parts: int | None = None
) -> ray.data.Dataset:
    """Exact DENSE GLOBAL RANK under (conv_id, turn_idx) ordering without
    a single-node sort — the distributed ordering contract made explicit
    (rank 0 = globally smallest key). Three phases, all bounded:

    1. per-block order statistics sample → P−1 range boundaries on
       conv_id (whole conversations never straddle a range);
    2. per-range row counts → P exclusive prefix offsets on the driver
       (P values, independent of data size);
    3. one keyed repartition by range, then a block-local vectorized sort
       assigns rank = range_offset + local position.

    Emits (conv_id, turn_idx, rank). The data makes exactly one keyed
    hop; only samples and P counts ever reach the driver."""
    import numpy as np
    from ray.data.aggregate import Count

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    if num_parts is None:
        try:
            cpus = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
        except Exception:
            cpus = 8
        num_parts = max(8, 2 * cpus)

    def block_sample(t: pa.Table) -> pa.Table:
        conv = np.sort(t["conv_id"].to_numpy(zero_copy_only=False))
        if len(conv) > 8:
            pick = np.linspace(0, len(conv) - 1, 8).astype(np.int64)
            conv = conv[pick]
        return pa.table({"conv_id": pa.array(conv.astype(object), pa.string())})

    sampled = np.sort(
        ds.select_columns(["conv_id"])
        .map_batches(block_sample, batch_format="pyarrow")
        .to_pandas()["conv_id"]
        .to_numpy(dtype=object)
    )
    if len(sampled) == 0:
        boundaries = np.array([], dtype=object)
    else:
        idx = np.unique(
            (np.linspace(0, 1, num_parts + 1)[1:-1] * (len(sampled) - 1))
            .round()
            .astype(np.int64)
        )
        boundaries = np.unique(sampled[idx])

    def tag(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, conv, side="right").astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "part": pa.array(part),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    counts = (
        tagged.groupby("part")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("part")
    )
    excl = counts["n"].cumsum() - counts["n"]
    offsets = dict(zip(counts["part"].astype(int), excl.astype(int)))

    def rank_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("part", "ascending"),
                ("conv_id", "ascending"),
                ("turn_idx", "ascending"),
            ],
        )
        t = t.take(order)
        part = t["part"].to_numpy(zero_copy_only=False)
        change = np.empty(len(part), dtype=bool)
        change[0] = True
        change[1:] = part[1:] != part[:-1]
        starts = np.flatnonzero(change)
        local = np.arange(len(part), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(part)))
        )
        base = np.array([offsets[int(p)] for p in part[starts]], np.int64)
        rank = np.repeat(base, np.diff(np.append(starts, len(part)))) + local
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "rank": pa.array(rank),
            }
        )

    return tagged.repartition(
        join_partitions(num_parts), keys=["part"]
    ).map_batches(rank_block, batch_format="pyarrow", batch_size=None)


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str = "doc_id",
    val_col: str = "text",
) -> ray.data.Dataset:
    """Generalized SNAPSHOT DIFF → change events (CDC *capture* when all
    you have is two table versions, the inverse of the apply path): keys
    only in ``new`` emit I, only in ``old`` emit D (carrying the old
    value), keys in both with a different value emit U (new value);
    equal rows emit nothing.

    Shape: both sides tag a side bit in a stateless pass, ONE keyed
    co-location by key hash, and the diff is block-local vectorized
    index algebra (each key's two sides land in the same block). Null
    values compare null-safe (null == null → no change)."""
    import numpy as np
    import pandas as pd

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: t[key_col],
                    val_col: t[val_col],
                    "side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return f

    both = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                "change_op": pa.array([], pa.string()),
                val_col: pa.array([], t.schema.field(val_col).type),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        o = df[df["side"] == 0].set_index(key_col)[val_col]
        n = df[df["side"] == 1].set_index(key_col)[val_col]
        ins = n.index.difference(o.index)
        dels = o.index.difference(n.index)
        common = o.index.intersection(n.index)
        ov, nv = o.loc[common], n.loc[common]
        neq = ~((ov.isna() & nv.isna()) | (ov == nv))
        upd = common[neq.to_numpy()]
        out = pd.DataFrame(
            {
                key_col: np.concatenate(
                    [ins.to_numpy(), upd.to_numpy(), dels.to_numpy()]
                ),
                "change_op": ["I"] * len(ins) + ["U"] * len(upd)
                + ["D"] * len(dels),
                val_col: np.concatenate(
                    [
                        n.loc[ins].to_numpy(dtype=object),
                        n.loc[upd].to_numpy(dtype=object),
                        o.loc[dels].to_numpy(dtype=object),
                    ]
                )
                if len(ins) + len(upd) + len(dels)
                else np.array([], dtype=object),
            }
        )
        if not len(out):
            return empty
        return pa.table(
            {
                key_col: pa.array(out[key_col]).cast(
                    t.schema.field(key_col).type
                ),
                "change_op": pa.array(out["change_op"], pa.string()),
                val_col: pa.array(
                    out[val_col].astype(object), t.schema.field(val_col).type
                ),
            }
        )

    return both.repartition(join_partitions(32), keys=[key_col]).map_batches(
        diff, batch_format="pyarrow", batch_size=None
    )


def rollup_counts(
    ds: ray.data.Dataset, cols: tuple[str, str] = ("role", "tool")
) -> ray.data.Dataset:
    """Warehouse-style ROLLUP over two dimensions: counts at every
    aggregation level — (a, b), (a), and grand total — in ONE pass, with
    a ``grouping_id`` bitmask distinguishing a rolled-up dimension from a
    genuinely NULL value (exactly SQL's GROUPING(a, b): 0 = both grouped,
    1 = b rolled up, 3 = grand total).

    Shape: every batch emits pre-aggregated partial counts for ALL levels
    (rolled-up cells are a sentinel so Ray's hash aggregate never keys on
    None), then one tiny groupby-sum — the shuffle ships at most
    |a|·|b|·levels rows per block, never data."""
    import numpy as np
    from ray.data.aggregate import Sum

    a_col, b_col = cols
    ALL = "\x02<all>"
    NULL = "\x01<null>"

    def partials(t: pa.Table) -> pa.Table:
        import pandas as pd

        schema = pa.schema(
            [
                pa.field(a_col, pa.string()),
                pa.field(b_col, pa.string()),
                pa.field("grouping_id", pa.int64()),
                pa.field("part_n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = pd.DataFrame(
            {
                a_col: t[a_col].to_pandas().fillna(NULL),
                b_col: t[b_col].to_pandas().fillna(NULL),
            }
        )
        lvl0 = df.groupby([a_col, b_col]).size().reset_index(name="part_n")
        lvl0["grouping_id"] = 0
        lvl1 = df.groupby([a_col]).size().reset_index(name="part_n")
        lvl1[b_col] = ALL
        lvl1["grouping_id"] = 1
        top = pd.DataFrame(
            {a_col: [ALL], b_col: [ALL], "part_n": [len(df)], "grouping_id": [3]}
        )
        out = pd.concat([lvl0, lvl1, top], ignore_index=True)
        return pa.Table.from_pandas(
            out[[a_col, b_col, "grouping_id", "part_n"]], preserve_index=False
        ).cast(schema)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([a_col, b_col, "grouping_id"])
        .aggregate(Sum("part_n", alias_name="n"))
    )

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        cols_out = {}
        for c in (a_col, b_col):
            arr = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            arr = pc.if_else(
                pc.or_(pc.equal(arr, ALL), pc.equal(arr, NULL)),
                pa.nulls(t.num_rows, pa.string()),
                arr,
            )
            cols_out[c] = arr
        cols_out["grouping_id"] = t["grouping_id"]
        cols_out["n"] = pc.cast(t["n"], pa.int64())
        return pa.table(cols_out)

    return agg.map_batches(decode, batch_format="pyarrow")


def grouped_quantile(
    sf_dir: str, q: float = 0.5, n_parts: int = 32
) -> ray.data.Dataset:
    """EXACT per-group quantile (``quantile_disc`` semantics: the element
    at index ceil(q·n)−1 of the group's sorted values) of event value per
    user: ONE keyed repartition co-locates each user, then a block kernel
    computes every group's order statistic vectorized ACROSS groups —
    one sort per block plus segment index arithmetic, no per-group
    Python, no global sort. The group's values never leave their
    partition; only (user, quantile) rows emerge."""
    import math

    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def block_quantile(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("user_id", pa.int64()), pa.field("q_value", pa.float64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)  # SQL aggregates ignore NULLs
        u, v = u[keep], v[keep]
        if len(u) == 0:
            return schema.empty_table()
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        change = np.empty(len(us), dtype=bool)
        change[0] = True
        change[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(us)))
        # quantile_disc(0) must return the group MINIMUM: clamp the
        # per-group offset to >=1 so q=0 can't index into the previous
        # group (or wrap to the array tail for the first group).
        kth = starts + np.maximum(np.ceil(q * lens).astype(np.int64), 1) - 1
        return pa.table(
            {"user_id": pa.array(us[starts]), "q_value": pa.array(vs[kth])},
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["user_id"]).map_batches(
        block_quantile, batch_format="pyarrow", batch_size=None
    )


def grouped_quantile_cont(
    sf_dir: str, q: float = 0.5, n_parts: int = 32
) -> ray.data.Dataset:
    """EXACT per-group CONTINUOUS quantile (``quantile_cont`` semantics:
    linear interpolation at rank h = q·(n−1) of the group's sorted
    values) of event value per user — the interpolating companion of
    ``grouped_quantile``. Same scale shape: ONE keyed repartition
    co-locates each user, then a block kernel computes every group's
    interpolated order statistic vectorized ACROSS groups (one sort per
    block + segment index arithmetic)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def block_quantile(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("user_id", pa.int64()), pa.field("q_value", pa.float64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        u, v = u[keep], v[keep]
        if len(u) == 0:
            return schema.empty_table()
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        change = np.empty(len(us), dtype=bool)
        change[0] = True
        change[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(us)))
        h = q * (lens - 1)
        lo = np.floor(h).astype(np.int64)
        frac = h - lo
        vlo = vs[starts + lo]
        vhi = vs[starts + np.minimum(lo + 1, lens - 1)]
        return pa.table(
            {
                "user_id": pa.array(us[starts]),
                # 6dp snap mirrors the oracle's round(quantile_cont, 6)
                "q_value": sql_round(pa.array(vlo + frac * (vhi - vlo)), 6),
            },
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["user_id"]).map_batches(
        block_quantile, batch_format="pyarrow", batch_size=None
    )


def uniform_sample(sf_dir: str, n: int = 500) -> ray.data.Dataset:
    """Deterministic RNG-free uniform sample of N events: the sample is
    the n rows with the smallest md5(event_id) — a fixed uniform hash
    order every re-run (and the SQL oracle) reproduces exactly. Scale
    shape: distributed top-k by hash — each block prunes to its local n
    smallest BEFORE one single-block final prune, so only
    n_blocks × n candidate rows ever move and nothing is globally
    sorted."""
    import hashlib

    import numpy as np

    from ..context import configure_shuffle

    configure_shuffle(32)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def hash_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("h", pa.array([], pa.string()))
        ev = t["event_id"].to_numpy(zero_copy_only=False)
        # md5 hex of the decimal id — ≡ DuckDB md5(CAST(id AS VARCHAR))
        h = np.fromiter(
            (hashlib.md5(str(int(e)).encode()).hexdigest() for e in ev),
            dtype=object,
            count=len(ev),
        )
        t = t.append_column("h", pa.array(h, pa.string()))
        order = pc.sort_indices(t, sort_keys=[("h", "ascending")])
        return t.take(order[: min(n, t.num_rows)])

    pruned = ds.map_batches(hash_prune, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("h", "ascending")])
        return t.take(order[: min(n, t.num_rows)]).drop_columns(["h"])

    return pruned.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def orders_by_region(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q5-shaped three-table rollup: revenue per REGION from
    orders ⋈ customer ⋈ nation ⋈ region, each edge at its true size —
    the fact-sized orders⋈customer edge is a DISTRIBUTED hash join; the
    nation→region map (25 rows) collapses driver-side into one
    nationkey→region_name broadcast probed with vectorized ``index_in``.
    Two shuffles total (join + final rollup) regardless of fact size."""
    import pyarrow.parquet as pq

    from ..context import configure_shuffle, join_partitions
    from ..functions.num import sql_round

    configure_shuffle(32)
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rmap = {
        rk: rn
        for rk, rn in zip(
            region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()
        )
    }
    nkeys = nation["n_nationkey"].combine_chunks()
    rnames = pa.array(
        [rmap[rk] for rk in nation["n_regionkey"].to_pylist()], pa.string()
    )
    ref = ray.put((nkeys, rnames))

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

    def tag_region(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        ks, rn = ray.get(ref)
        idx = pc.index_in(t["c_nationkey"], value_set=ks)
        return pa.table(
            {"r_name": rn.take(idx), "o_totalprice": t["o_totalprice"]}
        )

    from ray.data.aggregate import Count, Sum

    agg = joined.map_batches(tag_region, batch_format="pyarrow").groupby(
        "r_name"
    ).aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue")
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("revenue"), "revenue", sql_round(t["revenue"], 2)
        ),
        batch_format="pyarrow",
    )


def value_histogram(sf_dir: str, width: float = 25.0) -> ray.data.Dataset:
    """Fixed-width histogram of event values: bin = floor(value/width).
    The combiner pattern end-to-end — each batch collapses to ≤ n_bins
    partial rows (factorize + np.bincount) BEFORE the tiny groupby sum,
    so the shuffle moves histograms, not events. At 100 TB the exchange
    is O(blocks × bins) regardless of row count."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle

    configure_shuffle(32)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("bin", pa.int64()),
                pa.field("n", pa.int64()),
                pa.field("total", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return schema.empty_table()
        b = np.floor(v / width).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {
                "bin": pa.array(uniq),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "total": pa.array(np.bincount(inv, weights=v)),
            },
            schema=schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total"), "total", sql_round(t["total"], 2)
        ),
        batch_format="pyarrow",
    )


def per_stratum_sample(sf_dir: str, n: int = 50) -> ray.data.Dataset:
    """Deterministic per-stratum sample: for every event_type, the n rows
    with the smallest md5(event_id) — RNG-free, rerun-identical, exactly
    the oracle's row_number() OVER (PARTITION BY type ORDER BY md5).
    Scale shape: each block prunes to its local n per stratum, ONE
    type-keyed hop over ≤ n_blocks × strata × n candidates, block-final
    rank. No global sort."""
    import hashlib

    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def local_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if "h" not in t.column_names:
                t = t.append_column("h", pa.array([], pa.string()))
            return t
        if "h" not in t.column_names:  # second pass reuses the carried hash
            ev = t["event_id"].to_numpy(zero_copy_only=False)
            h = np.fromiter(
                (hashlib.md5(str(int(e)).encode()).hexdigest() for e in ev),
                dtype=object,
                count=len(ev),
            )
            t = t.append_column("h", pa.array(h, pa.string()))
        order = pc.sort_indices(
            t, sort_keys=[("event_type", "ascending"), ("h", "ascending")]
        )
        t = t.take(order)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        change = np.empty(len(et), dtype=bool)
        change[0] = True
        change[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(change)
        rank = np.arange(len(et), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(et)))
        )
        return t.filter(pa.array(rank < n))

    def final(t: pa.Table) -> pa.Table:
        return local_prune(t).drop_columns(["h"])

    return (
        ds.map_batches(local_prune, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["event_type"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def group_entropy(sf_dir: str) -> ray.data.Dataset:
    """Per-user Shannon entropy (nats) of the event-type distribution — a
    behavioral-diversity feature. Combiner first: each batch collapses to
    (user, type, n) partials, ONE user-keyed hop co-locates a user's
    partials, and the block kernel finishes count-sum + entropy for every
    user at once (segment reductions, no Python loop)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas()
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    def block_entropy(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("user_id", pa.int64()), pa.field("entropy", pa.float64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas()
        # finish the count merge (a (user,type) partial may arrive from
        # several upstream blocks), vectorized across the whole block
        g = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        g = g.sort_values("user_id", kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.float64)
        change = np.empty(len(u), dtype=bool)
        change[0] = True
        change[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        tot = np.add.reduceat(cnt, starts)
        p = cnt / np.repeat(tot, lens)
        ent = -np.add.reduceat(p * np.log(p), starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "entropy": sql_round(pa.array(ent), 6),
            },
            schema=schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["user_id"])
        .map_batches(block_entropy, batch_format="pyarrow", batch_size=None)
    )


def user_type_pivot(sf_dir: str) -> ray.data.Dataset:
    """PIVOT: per user, one count column per event type (conditional
    aggregation). Combiner-first — each batch collapses to one row per
    user present (factorize users × fixed type set, 2-D bincount), the
    groupby sums partial pivots; the exchange moves O(users) rows of
    fixed width, never events."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle

    configure_shuffle(32)
    types = ["click", "error", "purchase", "signup", "view"]
    cols = [f"n_{t}" for t in types]
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("user_id", pa.int64())]
            + [pa.field(c, pa.int64()) for c in cols]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uu, uinv = np.unique(u, return_inverse=True)
        tcodes = pc.index_in(
            t["event_type"], value_set=pa.array(types)
        ).to_numpy(zero_copy_only=False)
        flat = np.zeros(len(uu) * len(types), dtype=np.int64)
        np.add.at(flat, uinv * len(types) + tcodes, 1)
        grid = flat.reshape(len(uu), len(types))
        data = {"user_id": pa.array(uu)}
        for j, c in enumerate(cols):
            data[c] = pa.array(grid[:, j])
        return pa.table(data, schema=schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


def above_avg_orders(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Correlated-subquery shape: orders strictly above their own
    customer's average price. ONE custkey-keyed hop co-locates each
    customer's orders; the block kernel computes every customer's mean
    and filters in the same pass (segment reduce + gather) — no second
    aggregate relation, no join."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def per_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("o_orderkey", pa.int64()),
                pa.field("o_custkey", pa.int64()),
                pa.field("o_totalprice", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(c, kind="stable")
        c, p, k = c[order], p[order], k[order]
        change = np.empty(len(c), dtype=bool)
        change[0] = True
        change[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(c)))
        mean = np.add.reduceat(p, starts) / lens
        keep = p > np.repeat(mean, lens)
        return pa.table(
            {
                "o_orderkey": pa.array(k[keep]),
                "o_custkey": pa.array(c[keep]),
                "o_totalprice": pa.array(p[keep]),
            },
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["o_custkey"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def max_qty_shipment(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-part argmax: for every part, the order shipping its largest
    quantity (ties → smallest orderkey) — the distributed argmax-join
    shape. Per-block local argmax FIRST (each block emits ≤ one row per
    part it sees), then one partkey-keyed hop finishes the argmax over
    block winners: the exchange moves candidates, not lineitems."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_quantity"],
    )

    def local_argmax(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("l_partkey", pa.int64()),
                pa.field("l_orderkey", pa.int64()),
                pa.field("max_qty", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        # sort (part asc, qty desc, orderkey asc): first row per part wins
        order = np.lexsort((ok, -q, pk))
        pk, ok, q = pk[order], ok[order], q[order]
        change = np.empty(len(pk), dtype=bool)
        change[0] = True
        change[1:] = pk[1:] != pk[:-1]
        return pa.table(
            {
                "l_partkey": pa.array(pk[change]),
                "l_orderkey": pa.array(ok[change]),
                "max_qty": pa.array(q[change]),
            },
            schema=schema,
        )

    def final_argmax(t: pa.Table) -> pa.Table:
        # block winners arrive as (l_partkey, l_orderkey, max_qty);
        # feed them back through the same kernel
        return local_argmax(
            t.rename_columns(["l_partkey", "l_orderkey", "l_quantity"])
        )

    return (
        ds.map_batches(local_argmax, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["l_partkey"])
        .map_batches(final_argmax, batch_format="pyarrow", batch_size=None)
    )


def grouped_mode(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-user modal event type (ties → lexicographically smallest) —
    the categorical argmax feature. Combiner-first (user,type,n)
    partials, ONE user-keyed hop, block kernel finishes the count merge
    and picks each user's winner with one sort + segment head."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        import pandas as pd

        g = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    def block_mode(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("mode_type", pa.string()),
                pa.field("n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)["n"]
            .sum()
        )
        df = df.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        head = df.groupby("user_id", as_index=False).head(1)
        import numpy as np

        return pa.table(
            {
                "user_id": pa.array(head["user_id"].to_numpy(np.int64)),
                "mode_type": pa.array(head["event_type"], pa.string()),
                "n": pa.array(head["n"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["user_id"])
        .map_batches(block_mode, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Round-4 session-2 additions: set-op coverage, statistical aggregates,
# calendar rollups, exact distincts and order-statistic features — every
# one combiner-first so the exchange moves partials, not rows.
# ---------------------------------------------------------------------------


def nation_coverage(sf_dir: str, n_parts: int = 8) -> ray.data.Dataset:
    """INTERSECT/EXCEPT-shaped coverage report: for EVERY nation, how
    many customers and suppliers it has (0 when none) — the set-algebra
    surface (nations with both = INTERSECT, customers-only = EXCEPT)
    read off one relation. Combiner-first: each side collapses to
    per-nation partial counts inside ``map_batches``; the tiny nation
    table itself seeds zero rows so coverage gaps survive the keyed sum
    (a LEFT JOIN with no join — the exchange moves O(25) rows/side)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)

    schema = pa.schema(
        [
            pa.field("n_nationkey", pa.int64()),
            pa.field("customers", pa.int64()),
            pa.field("suppliers", pa.int64()),
        ]
    )

    def partial(col: str, as_customers: bool):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return schema.empty_table()
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            keys, n = np.unique(k, return_counts=True)
            zeros = np.zeros(len(keys), dtype=np.int64)
            return pa.table(
                {
                    "n_nationkey": pa.array(keys),
                    "customers": pa.array(n if as_customers else zeros),
                    "suppliers": pa.array(zeros if as_customers else n),
                },
                schema=schema,
            )

        return fn

    def seed(t: pa.Table) -> pa.Table:
        k = t["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(k), dtype=np.int64)
        return pa.table(
            {"n_nationkey": pa.array(k), "customers": pa.array(z), "suppliers": pa.array(z)},
            schema=schema,
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey"]
    ).map_batches(partial("c_nationkey", True), batch_format="pyarrow")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]
    ).map_batches(partial("s_nationkey", False), batch_format="pyarrow")
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(seed, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        k = t["n_nationkey"].to_numpy(zero_copy_only=False)
        c = t["customers"].to_numpy(zero_copy_only=False)
        s = t["suppliers"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "n_nationkey": pa.array(keys),
                "customers": pa.array(np.bincount(inv, weights=c).astype(np.int64)),
                "suppliers": pa.array(np.bincount(inv, weights=s).astype(np.int64)),
            },
            schema=schema,
        )

    return (
        cust.union(supp)
        .union(nations)
        .repartition(join_partitions(n_parts), keys=["n_nationkey"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def corr_qty_price(sf_dir: str) -> ray.data.Dataset:
    """Per-returnflag Pearson correlation + population covariance of
    (l_quantity, l_extendedprice) — the two-variable statistical
    aggregate family (corr / covar_pop) via the moments combiner: each
    batch collapses to (n, Σx, Σy, Σxx, Σyy, Σxy) per flag, ONE tiny
    keyed hop merges the moments, and the closed-form finish runs on a
    handful of rows. The exchange moves O(blocks × flags) rows."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
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
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        keys, inv = np.unique(flag, return_inverse=True)
        k = len(keys)
        return pa.table(
            {
                "l_returnflag": pa.array(keys, pa.string()),
                "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "sx": pa.array(np.bincount(inv, weights=x, minlength=k)),
                "sy": pa.array(np.bincount(inv, weights=y, minlength=k)),
                "sxx": pa.array(np.bincount(inv, weights=x * x, minlength=k)),
                "syy": pa.array(np.bincount(inv, weights=y * y, minlength=k)),
                "sxy": pa.array(np.bincount(inv, weights=x * y, minlength=k)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("corr_qp", pa.float64()),
            pa.field("covar_qp", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("l_returnflag", as_index=False).sum()
        n = g["n"].to_numpy(np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxx, syy, sxy = g["sxx"].to_numpy(), g["syy"].to_numpy(), g["sxy"].to_numpy()
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) ** 2
        vy = syy / n - (sy / n) ** 2
        corr = cov / np.sqrt(vx * vy)
        return pa.table(
            {
                "l_returnflag": pa.array(g["l_returnflag"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "corr_qp": sql_round(pa.array(corr), 6),
                "covar_qp": sql_round(pa.array(cov), 4),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["l_returnflag"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def month_revenue(sf_dir: str) -> ray.data.Dataset:
    """Calendar rollup: per order month, order count + revenue — the
    date_trunc family. Months are computed vectorized from the raw
    timestamp (integer math on epoch-µs via numpy datetime64), partials
    collapse per batch, ONE tiny month-keyed hop finishes. The exchange
    moves O(blocks × months) rows."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    part_schema = pa.schema(
        [
            pa.field("month", pa.timestamp("us")),
            pa.field("n", pa.int64()),
            pa.field("revenue", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        us = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (
            us.astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(m, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(keys).cast(pa.timestamp("us")),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "revenue": pa.array(np.bincount(inv, weights=price)),
            },
            schema=part_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        m = t["month"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys, inv = np.unique(m, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(keys).cast(pa.timestamp("us")),
                "n": pa.array(
                    np.bincount(inv, weights=t["n"].to_numpy(zero_copy_only=False))
                    .astype(np.int64)
                ),
                "revenue": sql_round(
                    pa.array(
                        np.bincount(
                            inv, weights=t["revenue"].to_numpy(zero_copy_only=False)
                        )
                    ),
                    2,
                ),
            },
            schema=part_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["month"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def weighted_avg_price(sf_dir: str) -> ray.data.Dataset:
    """Quantity-weighted mean extended price per return flag — the
    weighted-average aggregate via the two-sum combiner (Σwx, Σw per
    batch, one tiny keyed hop, closed-form finish)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("swx", pa.float64()),
            pa.field("sw", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        w = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        keys, inv = np.unique(flag, return_inverse=True)
        return pa.table(
            {
                "l_returnflag": pa.array(keys, pa.string()),
                "swx": pa.array(np.bincount(inv, weights=w * x)),
                "sw": pa.array(np.bincount(inv, weights=w)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("wavg_price", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("l_returnflag", as_index=False).sum()
        wavg = g["swx"].to_numpy() / g["sw"].to_numpy()
        return pa.table(
            {
                "l_returnflag": pa.array(g["l_returnflag"], pa.string()),
                "wavg_price": sql_round(pa.array(wavg), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["l_returnflag"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def type_distinct_users(
    sf_dir: str, n_parts: int = 32, n_buckets: int = 64
) -> ray.data.Dataset:
    """EXACT count(distinct user) per event type via the two-level
    skew-proof distinct (same shape as window_distinct_exact): per-batch
    distinct (type, user) pairs, first hop keyed (type, hash(user) % B)
    so a hot type spreads over B blocks, per-bucket distinct counts,
    then a second tiny hop sums B rows per type. No type's full distinct
    set ever lands in one block."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    pair_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("user_id", pa.int64()),
            pa.field("bucket", pa.int64()),
        ]
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.char.add(np.char.add(et.astype("U"), "\x00"), u.astype("U20"))
        _, idx = np.unique(key, return_index=True)
        et, u = et[idx], u[idx]
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "user_id": pa.array(u),
                "bucket": pa.array(u % n_buckets),
            },
            schema=pair_schema,
        )

    bucket_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("bucket", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return bucket_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby(["event_type", "bucket"], as_index=False)["user_id"].nunique()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
                "n": pa.array(g["user_id"].to_numpy(np.int64)),
            },
            schema=bucket_schema,
        )

    out_schema = pa.schema(
        [pa.field("event_type", pa.string()), pa.field("n_users", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False)["n"].sum()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n_users": pa.array(g["n"].to_numpy(np.int64)),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["event_type", "bucket"])
        .map_batches(bucket_counts, batch_format="pyarrow", batch_size=None)
        .repartition(join_partitions(8), keys=["event_type"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def user_activity_span(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-user lifetime features: event count + first/last activity
    timestamps + exact span in µs (integer arithmetic — no float
    rounding). Min/max/count partials per batch, one keyed hop."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    part_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("first_ts", pa.int64()),
            pa.field("last_ts", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="mergesort")
        u, ts = u[order], ts[order]
        change = np.empty(len(u), dtype=bool)
        change[0] = True
        change[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n": pa.array(lens.astype(np.int64)),
                "first_ts": pa.array(np.minimum.reduceat(ts, starts)),
                "last_ts": pa.array(np.maximum.reduceat(ts, starts)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("first_ts", pa.timestamp("us")),
            pa.field("last_ts", pa.timestamp("us")),
            pa.field("span_us", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), first_ts=("first_ts", "min"), last_ts=("last_ts", "max")
        )
        first = g["first_ts"].to_numpy(np.int64)
        last = g["last_ts"].to_numpy(np.int64)
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "first_ts": pa.array(first).cast(pa.timestamp("us")),
                "last_ts": pa.array(last).cast(pa.timestamp("us")),
                "span_us": pa.array(last - first),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["user_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def first_last_event(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-user first and last event type under strict (ts, event_id)
    ordering — the arg_min/arg_max aggregate pair. Block-local argmin/
    argmax partials (one candidate row per user per batch), one keyed
    hop re-runs the same reduction over candidates only."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )

    cand_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("fts", pa.int64()),
            pa.field("feid", pa.int64()),
            pa.field("first_type", pa.string()),
            pa.field("lts", pa.int64()),
            pa.field("leid", pa.int64()),
            pa.field("last_type", pa.string()),
        ]
    )

    def reduce_block(
        u, ts, eid, et, fts=None, feid=None, ftyp=None, lts=None, leid=None, ltyp=None
    ):
        # (u, ts, eid, et) are the "first" candidates; when the last-*
        # arrays are given the rows carry separate first/last candidates
        if fts is None:
            fts, feid, ftyp = ts, eid, et
            lts, leid, ltyp = ts, eid, et
        order = np.lexsort((feid, fts, u))
        uf = u[order]
        change = np.empty(len(uf), dtype=bool)
        change[0] = True
        change[1:] = uf[1:] != uf[:-1]
        fsel = order[np.flatnonzero(change)]
        order2 = np.lexsort((leid, lts, u))
        ul = u[order2]
        change2 = np.empty(len(ul), dtype=bool)
        change2[-1] = True
        change2[:-1] = ul[1:] != ul[:-1]
        lsel = order2[np.flatnonzero(change2)]
        return pa.table(
            {
                "user_id": pa.array(u[fsel]),
                "fts": pa.array(fts[fsel]),
                "feid": pa.array(feid[fsel]),
                "first_type": pa.array(ftyp[fsel], pa.string()),
                "lts": pa.array(lts[lsel]),
                "leid": pa.array(leid[lsel]),
                "last_type": pa.array(ltyp[lsel], pa.string()),
            },
            schema=cand_schema,
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return reduce_block(u, ts, eid, et)

    out_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("first_type", pa.string()),
            pa.field("last_type", pa.string()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cand = reduce_block(
            u,
            None,
            None,
            None,
            fts=t["fts"].to_numpy(zero_copy_only=False).astype(np.int64),
            feid=t["feid"].to_numpy(zero_copy_only=False).astype(np.int64),
            ftyp=t["first_type"].to_numpy(zero_copy_only=False),
            lts=t["lts"].to_numpy(zero_copy_only=False).astype(np.int64),
            leid=t["leid"].to_numpy(zero_copy_only=False).astype(np.int64),
            ltyp=t["last_type"].to_numpy(zero_copy_only=False),
        )
        return cand.select(["user_id", "first_type", "last_type"]).cast(out_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["user_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def mad_value(sf_dir: str, n_parts: int = 16) -> ray.data.Dataset:
    """Per-type median absolute deviation of `value` (MAD — the robust
    spread statistic): one type-keyed hop co-locates each type, then the
    block kernel computes the interpolated median and the median of
    |x − median| per segment, vectorized across segments via sorted
    reduceat arithmetic. Few-group order statistics share
    grouped_quantile's documented concentration trade-off; the
    skew-proof alternative for exact global quantiles is
    exact_quantiles' histogram refinement."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    out_schema = pa.schema(
        [pa.field("event_type", pa.string()), pa.field("mad", pa.float64())]
    )

    def seg_median(sorted_vals, starts, lens):
        # interpolated median per segment over a value array already
        # sorted within segments
        mid = (lens - 1) / 2.0
        lo = starts + np.floor(mid).astype(np.int64)
        hi = starts + np.ceil(mid).astype(np.int64)
        return 0.5 * (sorted_vals[lo] + sorted_vals[hi])

    def block_mad(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        keys, inv = np.unique(et, return_inverse=True)
        order = np.lexsort((v, inv))
        gi, vs = inv[order], v[order]
        change = np.empty(len(gi), dtype=bool)
        change[0] = True
        change[1:] = gi[1:] != gi[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(gi)))
        med = seg_median(vs, starts, lens)
        dev = np.abs(vs - np.repeat(med, lens))
        order2 = np.lexsort((dev, gi))
        ds_ = dev[order2]
        mad = seg_median(ds_, starts, lens)
        return pa.table(
            {
                "event_type": pa.array(keys[gi[starts]], pa.string()),
                "mad": sql_round(pa.array(mad), 6),
            },
            schema=out_schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["event_type"]).map_batches(
        block_mad, batch_format="pyarrow", batch_size=None
    )


def type_jaccard(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Pairwise Jaccard similarity between event types over their USER
    sets — a set-similarity join with a bounded pair space (types², not
    users²). Per-batch distinct (type, user) pairs, ONE user-keyed hop
    (each user's type set lands whole in one block, so a pandas
    self-merge emits that user's type pairs locally), then partial
    pair/type counts collapse to one tiny final block for the Jaccard
    arithmetic. No all-pairs over users, ever."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    pair_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("user_id", pa.int64()),
        ]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        df = t.to_pandas().drop_duplicates()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], pa.string()),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            },
            schema=pair_schema,
        )

    cnt_schema = pa.schema(
        [
            pa.field("ta", pa.string()),
            pa.field("tb", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def block_counts(t: pa.Table) -> pa.Table:
        # all rows for a user are co-located: emit exact per-block pair
        # counts and per-type distinct-user counts (tb='' marks a type
        # count partial)
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        df = t.to_pandas().drop_duplicates()  # cross-batch duplicates collapse here
        m = df.merge(df, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"], as_index=False).size()
        types = df.groupby("event_type", as_index=False).size()
        return pa.table(
            {
                "ta": pa.array(
                    list(pairs["event_type_x"]) + list(types["event_type"]),
                    pa.string(),
                ),
                "tb": pa.array(
                    list(pairs["event_type_y"]) + [""] * len(types), pa.string()
                ),
                "n": pa.array(
                    np.concatenate(
                        [
                            pairs["size"].to_numpy(np.int64),
                            types["size"].to_numpy(np.int64),
                        ]
                    )
                    if len(pairs) or len(types)
                    else np.array([], dtype=np.int64)
                ),
            },
            schema=cnt_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("ta", pa.string()),
            pa.field("tb", pa.string()),
            pa.field("jaccard", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["ta", "tb"], as_index=False)["n"].sum()
        sizes = dict(
            zip(df[df["tb"] == ""]["ta"], df[df["tb"] == ""]["n"])
        )
        p = df[df["tb"] != ""]
        na = p["ta"].map(sizes).to_numpy(np.float64)
        nb = p["tb"].map(sizes).to_numpy(np.float64)
        nab = p["n"].to_numpy(np.float64)
        jac = nab / (na + nb - nab)
        return pa.table(
            {
                "ta": pa.array(p["ta"], pa.string()),
                "tb": pa.array(p["tb"], pa.string()),
                "jaccard": sql_round(pa.array(jac), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["user_id"])
        .map_batches(block_counts, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def month_running_share(sf_dir: str) -> ray.data.Dataset:
    """Cumulative revenue share by order month — a window over an
    AGGREGATE (the months relation is tiny, so the running sum runs in
    one final block; the heavy input collapses via the same month
    combiner as month_revenue, unrounded)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    part_schema = pa.schema(
        [pa.field("month", pa.timestamp("us")), pa.field("revenue", pa.float64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        us = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (
            us.astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keys, inv = np.unique(m, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(keys).cast(pa.timestamp("us")),
                "revenue": pa.array(
                    np.bincount(
                        inv, weights=t["o_totalprice"].to_numpy(zero_copy_only=False)
                    )
                ),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [pa.field("month", pa.timestamp("us")), pa.field("cum_share", pa.float64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("month", as_index=False)["revenue"].sum()
        df = df.sort_values("month", kind="mergesort")
        rev = df["revenue"].to_numpy(np.float64)
        share = np.cumsum(rev) / rev.sum()
        return pa.table(
            {
                "month": pa.array(df["month"]).cast(pa.timestamp("us")),
                "cum_share": sql_round(pa.array(share), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def brand_revenue(sf_dir: str, n_parts: int = 16) -> ray.data.Dataset:
    """Discounted revenue per part brand: the mid-size-dimension join
    (part: tens of thousands of rows — small enough to broadcast once
    via the object store, too big to re-ship per batch). The partkey →
    brand map is one ``ray.put`` read by every task; the probe is a
    vectorized ``pc.index_in`` against the broadcast key array, then the
    brand combiner collapses each batch before one tiny keyed hop."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    part_tbl = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        .to_arrow_refs()
    )
    import pyarrow as _pa

    parts = pa.concat_tables([ray.get(r) for r in part_tbl])
    brands_uniq = pc.unique(parts["p_brand"].combine_chunks())
    brand_code = pc.index_in(
        parts["p_brand"].combine_chunks(), value_set=brands_uniq
    ).to_numpy(zero_copy_only=False)
    ref = ray.put(
        (
            parts["p_partkey"].combine_chunks(),
            brand_code.astype(np.int32),
            brands_uniq.to_pylist(),
        )
    )

    part_schema = pa.schema(
        [pa.field("p_brand", pa.string()), pa.field("revenue", pa.float64())]
    )

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        keys, codes, names = ray.get(ref)
        idx = pc.index_in(t["l_partkey"].combine_chunks(), value_set=keys)
        idxn = idx.to_numpy(zero_copy_only=False)
        rev = (
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        valid = idxn >= 0
        bc = codes[idxn[valid]]
        sums = np.bincount(bc, weights=rev[valid], minlength=len(names))
        nz = np.flatnonzero(sums != 0.0)
        return pa.table(
            {
                "p_brand": pa.array([names[i] for i in nz], pa.string()),
                "revenue": pa.array(sums[nz]),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [pa.field("p_brand", pa.string()), pa.field("revenue", pa.float64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("p_brand", as_index=False)["revenue"].sum()
        return pa.table(
            {
                "p_brand": pa.array(df["p_brand"], pa.string()),
                "revenue": sql_round(pa.array(df["revenue"].to_numpy()), 2),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(probe, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["p_brand"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def region_top_customer(sf_dir: str) -> ray.data.Dataset:
    """Per-region top customer by account balance (ties broken by the
    smaller custkey): the distributed grouped-argmax over a broadcast
    dimension chain (customer → nation → region, both dims tiny).
    Block-local argmax keeps one candidate row per region per batch; the
    final reduction re-runs the same rule over candidates only."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    nation = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
            ).to_arrow_refs()
        ]
    )
    region = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
            ).to_arrow_refs()
        ]
    )
    nat_keys = nation["n_nationkey"].combine_chunks()
    nat_region = nation["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    reg_keys = region["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    reg_names = region["r_name"].to_numpy(zero_copy_only=False)
    reg_name_of = dict(zip(reg_keys, reg_names))

    cand_schema = pa.schema(
        [
            pa.field("r_name", pa.string()),
            pa.field("c_name", pa.string()),
            pa.field("c_acctbal", pa.float64()),
            pa.field("c_custkey", pa.int64()),
        ]
    )

    def reduce_cands(r_name, c_name, bal, ck):
        order = np.lexsort((ck, -bal, r_name))
        rs = r_name[order]
        first = np.empty(len(rs), dtype=bool)
        first[0] = True
        first[1:] = rs[1:] != rs[:-1]
        sel = order[np.flatnonzero(first)]
        return pa.table(
            {
                "r_name": pa.array(r_name[sel], pa.string()),
                "c_name": pa.array(c_name[sel], pa.string()),
                "c_acctbal": pa.array(bal[sel]),
                "c_custkey": pa.array(ck[sel]),
            },
            schema=cand_schema,
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        idx = pc.index_in(t["c_nationkey"].cast(pa.int32()), value_set=nat_keys)
        rk = nat_region[idx.to_numpy(zero_copy_only=False)]
        r_name = np.array([reg_name_of[k] for k in rk], dtype=object)
        return reduce_cands(
            r_name,
            t["c_name"].to_numpy(zero_copy_only=False),
            t["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        return reduce_cands(
            t["r_name"].to_numpy(zero_copy_only=False),
            t["c_name"].to_numpy(zero_copy_only=False),
            t["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["r_name"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def regr_price_qty(sf_dir: str) -> ray.data.Dataset:
    """Per-returnflag least-squares fit of extended price on quantity
    (regr_slope / regr_intercept) — same moments combiner as
    corr_qty_price with the regression finish: slope = cov/var(x),
    intercept = ȳ − slope·x̄."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("sx", pa.float64()),
            pa.field("sy", pa.float64()),
            pa.field("sxx", pa.float64()),
            pa.field("sxy", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        keys, inv = np.unique(flag, return_inverse=True)
        k = len(keys)
        return pa.table(
            {
                "l_returnflag": pa.array(keys, pa.string()),
                "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "sx": pa.array(np.bincount(inv, weights=x, minlength=k)),
                "sy": pa.array(np.bincount(inv, weights=y, minlength=k)),
                "sxx": pa.array(np.bincount(inv, weights=x * x, minlength=k)),
                "sxy": pa.array(np.bincount(inv, weights=x * y, minlength=k)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("l_returnflag", pa.string()),
            pa.field("slope", pa.float64()),
            pa.field("intercept", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("l_returnflag", as_index=False).sum()
        n = df["n"].to_numpy(np.float64)
        mx, my = df["sx"].to_numpy() / n, df["sy"].to_numpy() / n
        cov = df["sxy"].to_numpy() / n - mx * my
        vx = df["sxx"].to_numpy() / n - mx * mx
        slope = cov / vx
        return pa.table(
            {
                "l_returnflag": pa.array(df["l_returnflag"], pa.string()),
                "slope": sql_round(pa.array(slope), 6),
                "intercept": sql_round(pa.array(my - slope * mx), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["l_returnflag"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def hourly_profile(sf_dir: str) -> ray.data.Dataset:
    """Hour-of-day activity profile per event type (date-part family):
    the hour is integer arithmetic on epoch-µs, partials collapse per
    batch on the (type, hour) grid — at most types × 24 rows ship."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("h", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3_600_000_000) % 24
        keys, codes = np.unique(et, return_inverse=True)
        cell = codes * 24 + h
        grid, inv = np.unique(cell, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(keys[grid // 24], pa.string()),
                "h": pa.array(grid % 24),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=schema,
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas().groupby(["event_type", "h"], as_index=False)["n"].sum()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], pa.string()),
                "h": pa.array(df["h"].to_numpy(np.int64)),
                "n": pa.array(df["n"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["event_type", "h"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def part_type_counts(sf_dir: str) -> ray.data.Dataset:
    """Part-family rollup on the FIRST word of p_type (string-function
    pushdown: the split runs vectorized at the read edge, the combiner
    ships one row per family per batch): count + mean retail price."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_type", "p_retailprice"]
    )

    part_schema = pa.schema(
        [
            pa.field("family", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        fam = pc.list_element(
            pc.split_pattern(pc.fill_null(t["p_type"], ""), pattern=" "), 0
        ).to_numpy(zero_copy_only=False)
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(fam, return_inverse=True)
        return pa.table(
            {
                "family": pa.array(keys, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(np.bincount(inv, weights=price)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("family", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("avg_price", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("family", as_index=False).sum()
        return pa.table(
            {
                "family": pa.array(df["family"], pa.string()),
                "n": pa.array(df["n"].to_numpy(np.int64)),
                "avg_price": sql_round(
                    pa.array(df["s"].to_numpy() / df["n"].to_numpy()), 6
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["family"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def dup_rate_by_source(
    sf_dir: str, n_parts: int = 32, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-source exact-duplicate rate over the documents corpus: doc
    count, distinct text count, and dup_rate = 1 − distinct/n — the
    corpus-health metric an LLM-data pipeline reports per provenance.
    Distinct texts use the two-level skew-proof pattern keyed
    (source, md5(text) % B): a boilerplate-heavy source spreads over B
    buckets, per-bucket distinct counts, then a tiny per-source sum."""
    import hashlib

    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    pair_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("th", pa.int64()),
            pa.field("bucket", pa.int64()),
            pa.field("n_docs", pa.int64()),
        ]
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        df = t.to_pandas()
        df["text"] = df["text"].fillna("")
        th = df["text"].map(
            lambda s: int.from_bytes(
                hashlib.md5(s.encode()).digest()[:8], "big", signed=False
            ) >> 1
        ).to_numpy(np.int64)
        df = df.assign(th=th)
        g = df.groupby(["source", "th"], as_index=False).size()
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "th": pa.array(g["th"].to_numpy(np.int64)),
                "bucket": pa.array(g["th"].to_numpy(np.int64) % n_buckets),
                "n_docs": pa.array(g["size"].to_numpy(np.int64)),
            },
            schema=pair_schema,
        )

    bucket_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_distinct", pa.int64()),
        ]
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return bucket_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_distinct=("th", "nunique")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "n_distinct": pa.array(g["n_distinct"].to_numpy(np.int64)),
            },
            schema=bucket_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_distinct", pa.int64()),
            pa.field("dup_rate", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("source", as_index=False).sum()
        n = df["n_docs"].to_numpy(np.float64)
        d = df["n_distinct"].to_numpy(np.float64)
        return pa.table(
            {
                "source": pa.array(df["source"], pa.string()),
                "n_docs": pa.array(df["n_docs"].to_numpy(np.int64)),
                "n_distinct": pa.array(df["n_distinct"].to_numpy(np.int64)),
                "dup_rate": sql_round(pa.array(1.0 - d / n), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["source", "bucket"])
        .map_batches(bucket_counts, batch_format="pyarrow", batch_size=None)
        .repartition(join_partitions(8), keys=["source"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def ship_priority(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """TPC-H Q3 shape (shipping-priority top-k): revenue of not-yet-
    shipped lineitems for one market segment's orders. Both fact-sized
    edges run as DISTRIBUTED hash joins (customer⋈orders on custkey,
    then ⋈lineitem on orderkey); filters are pushed into the reads so
    only surviving rows enter either exchange. The top-k finish is the
    usual block-local prune → single-block rank — no global sort."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    import pyarrow.dataset as pads

    configure_shuffle(32)
    cut = np.datetime64("1998-07-01").astype("datetime64[us]")

    # row-group-prunable predicates pushed INTO the reads: filtered rows
    # never leave storage, let alone reach a join exchange
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < pa.scalar(cut),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > pa.scalar(cut),
    )

    j1 = orders.join(
        cust,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    j2 = li.join(
        j1,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    part_schema = pa.schema(
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("o_orderdate", pa.timestamp("us")),
            pa.field("o_orderpriority", pa.string()),
            pa.field("revenue", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        uniq, inv = np.unique(ok, return_inverse=True)
        firsts = np.full(len(uniq), -1, dtype=np.int64)
        firsts[inv[::-1]] = np.arange(len(ok) - 1, -1, -1)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq),
                "o_orderdate": t["o_orderdate"].take(firsts),
                "o_orderpriority": t["o_orderpriority"].take(firsts),
                "revenue": pa.array(np.bincount(inv, weights=rev)),
            },
            schema=part_schema,
        )

    def merge_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(
            o_orderdate=("o_orderdate", "first"),
            o_orderpriority=("o_orderpriority", "first"),
            revenue=("revenue", "sum"),
        )
        rev = g["revenue"].to_numpy(np.float64)
        ok = g["l_orderkey"].to_numpy(np.int64)
        order = np.lexsort((ok, -rev))[:k]
        g = g.iloc[order]
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64)),
                "o_orderdate": pa.array(
                    g["o_orderdate"].to_numpy("datetime64[us]")
                ),
                "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
                "revenue": pa.array(g["revenue"].to_numpy(np.float64)),
            },
            schema=part_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        t = merge_topk(t)
        return t.set_column(
            t.column_names.index("revenue"), "revenue", sql_round(t["revenue"], 2)
        )

    return (
        j2.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["l_orderkey"])
        .map_batches(merge_topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def late_orders_by_priority(sf_dir: str, days: int = 90) -> ray.data.Dataset:
    """TPC-H Q4 shape: orders whose slowest lineitem shipped more than
    ``days`` after the order date, counted per priority. The EXISTS
    subquery becomes a per-orderkey max-shipdate COMBINER (each lineitem
    batch collapses to one candidate row per orderkey before the
    exchange) joined distributed against orders, then a tiny rollup."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    mx_schema = pa.schema(
        [pa.field("l_orderkey", pa.int64()), pa.field("max_ship", pa.int64())]
    )

    def max_ship_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mx_schema.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, sd)
        return pa.table(
            {"l_orderkey": pa.array(uniq), "max_ship": pa.array(mx)},
            schema=mx_schema,
        )

    def max_ship_merge(t: pa.Table) -> pa.Table:
        return max_ship_partial(
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_shipdate": t["max_ship"].cast(pa.timestamp("us")),
                }
            )
        )

    mx = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        .map_batches(max_ship_partial, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["l_orderkey"])
        .map_batches(max_ship_merge, batch_format="pyarrow", batch_size=None)
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    joined = orders.join(
        mx,
        join_type="inner",
        num_partitions=join_partitions(32),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    out_schema = pa.schema(
        [pa.field("o_orderpriority", pa.string()), pa.field("n_late", pa.int64())]
    )
    lag_us = days * 86_400_000_000

    def count_late(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ms = t["max_ship"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = ms > od + lag_us
        if not late.any():
            return out_schema.empty_table()
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)[late]
        keys, n = np.unique(pri, return_counts=True)
        return pa.table(
            {"o_orderpriority": pa.array(keys, pa.string()),
             "n_late": pa.array(n.astype(np.int64))},
            schema=out_schema,
        )

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(count_late, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )


def customer_order_counts(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    zero-order customers. Orders collapse combiner-first to per-customer
    counts; the zero bucket is total customers minus customers seen in
    orders — a metadata-cheap ``count()``, not a join. The histogram
    exchange moves O(blocks × distinct counts)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    n_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()

    cnt_schema = pa.schema(
        [pa.field("o_custkey", pa.int64()), pa.field("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, n = np.unique(ck, return_counts=True)
        return pa.table(
            {"o_custkey": pa.array(uniq), "n": pa.array(n.astype(np.int64))},
            schema=cnt_schema,
        )

    hist_schema = pa.schema(
        [pa.field("c_count", pa.int64()), pa.field("custdist", pa.int64())]
    )

    def to_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        df = t.to_pandas().groupby("o_custkey", as_index=False)["n"].sum()
        keys, n = np.unique(df["n"].to_numpy(np.int64), return_counts=True)
        return pa.table(
            {"c_count": pa.array(keys), "custdist": pa.array(n.astype(np.int64))},
            schema=hist_schema,
        )

    def add_zero_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        seen = int(t["custdist"].to_numpy(zero_copy_only=False).sum())
        zeros = n_customers - seen
        if zeros > 0:
            t = pa.concat_tables(
                [
                    t,
                    pa.table(
                        {"c_count": pa.array([0], pa.int64()),
                         "custdist": pa.array([zeros], pa.int64())},
                        schema=hist_schema,
                    ),
                ]
            )
        return t

    return (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["o_custkey"])
        .map_batches(to_hist, batch_format="pyarrow", batch_size=None)
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .repartition(1)
        .map_batches(add_zero_bucket, batch_format="pyarrow", batch_size=None)
    )


def promo_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q14 shape: per ship-month share of revenue from PROMO-type
    parts. The partkey→is_promo flag broadcasts once (mid-size dimension,
    same regime as brand_revenue); each lineitem batch collapses to TWO
    sums per month before the exchange, so the shuffle moves
    O(blocks × months) rows."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
            ).to_arrow_refs()
        ]
    )
    ref = ray.put(
        (
            parts["p_partkey"].combine_chunks(),
            pc.equal(parts["p_type"].combine_chunks(), "PROMO")
            .to_numpy(zero_copy_only=False),
        )
    )

    part_schema = pa.schema(
        [
            pa.field("month", pa.timestamp("us")),
            pa.field("promo_rev", pa.float64()),
            pa.field("total_rev", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        keys, is_promo = ray.get(ref)
        idx = pc.index_in(t["l_partkey"].combine_chunks(), value_set=keys)
        promo = is_promo[idx.to_numpy(zero_copy_only=False)]
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        month = sd.astype("datetime64[M]").astype("datetime64[us]")
        uniq, inv = np.unique(month, return_inverse=True)
        total = np.bincount(inv, weights=rev, minlength=len(uniq))
        prom = np.bincount(
            inv, weights=np.where(promo, rev, 0.0), minlength=len(uniq)
        )
        return pa.table(
            {
                "month": pa.array(uniq),
                "promo_rev": pa.array(prom),
                "total_rev": pa.array(total),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("month", pa.timestamp("us")),
            pa.field("promo_share", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("month", as_index=False).sum()
        return pa.table(
            {
                "month": pa.array(df["month"].to_numpy("datetime64[us]")),
                "promo_share": sql_round(
                    pa.array(
                        df["promo_rev"].to_numpy(np.float64)
                        / df["total_rev"].to_numpy(np.float64)
                    ),
                    6,
                ),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["month"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def value_outliers(sf_dir: str, z: float = 3.0) -> ray.data.Dataset:
    """Two-pass broadcast z-score outlier count per event type: pass 1
    reduces the stream to per-type moments (tiny — one row per type),
    which broadcast back for pass 2's vectorized |value-μ| > zσ probe.
    The canonical normalize-then-filter shape where the statistics table
    never touches a shuffle."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    mom_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s1", pa.float64()),
            pa.field("s2", pa.float64()),
        ]
    )

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mom_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        et, v = et[ok], v[ok]
        if len(v) == 0:
            return mom_schema.empty_table()
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s1": pa.array(np.bincount(inv, weights=v)),
                "s2": pa.array(np.bincount(inv, weights=v * v)),
            },
            schema=mom_schema,
        )

    stats = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .take_all()  # one row per event type — tiny by construction
    )
    types = pa.array([r["event_type"] for r in stats], pa.string())
    n = np.array([r["n"] for r in stats], dtype=np.float64)
    mu = np.array([r["s1"] for r in stats]) / n
    sd = np.sqrt(np.maximum(np.array([r["s2"] for r in stats]) / n - mu * mu, 0.0))
    ref = ray.put((types, mu, sd))

    out_schema = pa.schema(
        [pa.field("event_type", pa.string()), pa.field("n_outliers", pa.int64())]
    )

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        tys, mus, sds = ray.get(ref)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = pc.index_in(t["event_type"].combine_chunks(), value_set=tys)
        idxn = idx.to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        out = ok & (np.abs(v - mus[idxn]) > z * sds[idxn])
        if not out.any():
            return out_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)[out]
        keys, cnt = np.unique(et, return_counts=True)
        return pa.table(
            {"event_type": pa.array(keys, pa.string()),
             "n_outliers": pa.array(cnt.astype(np.int64))},
            schema=out_schema,
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(_Sum("n_outliers", alias_name="n_outliers"))
    )


def value_minmax_scaled(sf_dir: str) -> ray.data.Dataset:
    """Per-type min-max normalization of event values — the shuffle-free
    feature-scaling shape: per-type extrema reduce to one tiny table
    (pass 1), broadcast back, and pass 2 rewrites every row in place with
    a vectorized (v-min)/(max-min). Deterministic bit-for-bit (no
    summation), so the oracle compare is exact."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    from ..context import configure_shuffle

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    ext = (
        ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["value"])), batch_format="pyarrow"
        )
        .groupby("event_type")
        .aggregate(Min("value", alias_name="mn"), Max("value", alias_name="mx"))
        .take_all()
    )
    types = pa.array([r["event_type"] for r in ext], pa.string())
    mn = np.array([r["mn"] for r in ext], dtype=np.float64)
    mx = np.array([r["mx"] for r in ext], dtype=np.float64)
    ref = ray.put((types, mn, mx))

    out_schema = pa.schema(
        [pa.field("event_id", pa.int64()), pa.field("scaled", pa.float64())]
    )

    def scale(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        tys, mns, mxs = ray.get(ref)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = pc.index_in(t["event_type"].combine_chunks(), value_set=tys)
        idxn = idx.to_numpy(zero_copy_only=False)
        rng = mxs[idxn] - mns[idxn]
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (v - mns[idxn]) / rng
        s = np.where(np.isnan(v) | (rng == 0), np.nan, s)
        return pa.table(
            {
                "event_id": t["event_id"],
                "scaled": pa.array(s, pa.float64(), from_pandas=True),
            },
            schema=out_schema,
        )

    return ds.map_batches(scale, batch_format="pyarrow")


def supplier_pct_rank(sf_dir: str, n_parts: int = 8) -> ray.data.Dataset:
    """Per-nation percent_rank of supplier account balances — the
    window-rank shape with SQL tie semantics ((min_rank − 1)/(n − 1),
    ties share a rank). One nation-keyed hop; ranks are a vectorized
    double searchsorted per block, no per-row Python."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(8)

    out_schema = pa.schema(
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_nationkey", pa.int32()),
            pa.field("pct_rank", pa.float64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = t["s_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bal, nk))
        nk_s, bal_s = nk[order], bal[order]
        starts = np.flatnonzero(
            np.concatenate(([True], nk_s[1:] != nk_s[:-1]))
        )
        seg_id = np.cumsum(np.concatenate(([True], nk_s[1:] != nk_s[:-1]))) - 1
        lens = np.diff(np.append(starts, len(nk_s)))
        pos = np.arange(len(nk_s)) - starts[seg_id]
        # min-rank of ties: first index within the segment holding this
        # value — searchsorted per segment done globally via (nation, bal)
        # lexicographic positions
        first_of_value = np.empty(len(bal_s), dtype=np.int64)
        newv = np.concatenate(
            ([True], (bal_s[1:] != bal_s[:-1]) | (nk_s[1:] != nk_s[:-1]))
        )
        first_idx = np.maximum.accumulate(np.where(newv, np.arange(len(bal_s)), 0))
        first_of_value = first_idx - starts[seg_id]
        n_seg = lens[seg_id]
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = first_of_value / np.maximum(n_seg - 1, 1)
        pct = np.where(n_seg == 1, 0.0, pct)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "s_suppkey": pa.array(sk),
                "s_nationkey": pa.array(nk.astype(np.int32)),
                "pct_rank": pa.array(pct[inv]),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey", "s_acctbal"],
        )
        .repartition(join_partitions(n_parts), keys=["s_nationkey"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
    )
