"""Distribution-statistics operators (batch 2): higher moments, a
contingency-independence test, an exact fact-scale windowed cume_dist,
and the embedding covariance matrix.

Shared scale rules: every op is combiner-first (the exchange moves
per-batch partial rows, never base rows) except ``cume_dist_price``,
whose single keyed hop is information-theoretically required (exact
rank needs every row placed in its partition's order) — it uses the
``global_rank`` range-partition pattern so no worker ever holds a whole
ORDER BY partition, only a range slice of one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.num import sql_round


def value_skew_kurt(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type population skewness and excess kurtosis from ONE
    pass of raw power sums (Σx..Σx⁴ per batch → one tiny keyed hop →
    central moments algebraically). Raw-moment cancellation is safe here
    because ``value`` is bounded (≤ ~500, checked vs the two-pass oracle
    to 1e-6); unbounded domains should shift by a per-batch pivot
    first."""
    from ..context import configure_shuffle

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    part_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s1", pa.float64()),
            pa.field("s2", pa.float64()),
            pa.field("s3", pa.float64()),
            pa.field("s4", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        et, v = et[ok], v[ok]
        if len(v) == 0:
            return part_schema.empty_table()
        uniq, inv = np.unique(et, return_inverse=True)
        v2 = v * v
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s1": pa.array(np.bincount(inv, weights=v)),
                "s2": pa.array(np.bincount(inv, weights=v2)),
                "s3": pa.array(np.bincount(inv, weights=v2 * v)),
                "s4": pa.array(np.bincount(inv, weights=v2 * v2)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
    )

    out_schema = pa.schema(
        [
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("skew_pop", pa.float64()),
            pa.field("kurt_pop", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        s3 = t["s3"].to_numpy(zero_copy_only=False)
        s4 = t["s4"].to_numpy(zero_copy_only=False)
        mu = s1 / n
        m2 = s2 - n * mu * mu
        m3 = s3 - 3.0 * mu * s2 + 2.0 * n * mu**3
        m4 = s4 - 4.0 * mu * s3 + 6.0 * mu * mu * s2 - 3.0 * n * mu**4
        with np.errstate(invalid="ignore", divide="ignore"):
            skew = (m3 / n) / np.power(m2 / n, 1.5)
            kurt = (m4 / n) / np.power(m2 / n, 2.0) - 3.0
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"].cast(pa.int64()),
                "skew_pop": sql_round(pa.array(skew), 6),
                "kurt_pop": sql_round(pa.array(kurt), 6),
            },
            schema=out_schema,
        )

    return agg.map_batches(final, batch_format="pyarrow")


def lang_source_chi2(sf_dir: str) -> ray.data.Dataset:
    """Chi-square independence statistic for the documents' lang ×
    source contingency table (including zero cells). Per-batch cell
    counts → one tiny keyed hop → a single-block finish computes the
    full expected grid; the exchange moves O(blocks × cells) rows and
    the grid itself is |langs| × |sources| — dimension-bounded."""
    from ..context import configure_shuffle

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    part_schema = pa.schema(
        [
            pa.field("lang", pa.string()),
            pa.field("source", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        lg = t["lang"].to_numpy(zero_copy_only=False).astype(object)
        sc = t["source"].to_numpy(zero_copy_only=False).astype(object)
        # factorize both axes (no fixed-width unicode cast: long
        # categories would truncate and merge distinct cells)
        langs, li = np.unique(lg, return_inverse=True)
        srcs, si = np.unique(sc, return_inverse=True)
        ns = len(srcs)
        uniq, inv = np.unique(li * ns + si, return_inverse=True)
        return pa.table(
            {
                "lang": pa.array(langs[uniq // ns], pa.string()),
                "source": pa.array(srcs[uniq % ns], pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
    )

    out_schema = pa.schema(
        [pa.field("chi2", pa.float64()), pa.field("dof", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lg = t["lang"].to_numpy(zero_copy_only=False)
        sc = t["source"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        langs, li = np.unique(lg, return_inverse=True)
        srcs, si = np.unique(sc, return_inverse=True)
        grid = np.zeros((len(langs), len(srcs)), dtype=np.float64)
        grid[li, si] = n
        total = grid.sum()
        e = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / total
        chi2 = float((((grid - e) ** 2) / e).sum())
        dof = (len(langs) - 1) * (len(srcs) - 1)
        return pa.table(
            {
                "chi2": sql_round(pa.array([chi2]), 6),
                "dof": pa.array([dof], pa.int64()),
            },
            schema=out_schema,
        )

    return counts.map_batches(finish, batch_format="pyarrow", batch_size=None)


def embedding_covariance(sf_dir: str) -> ray.data.Dataset:
    """Population covariance matrix of the embedding columns: each batch
    contributes ONE XᵀX matmul (dim² partial cells + dim marginals +
    a count row), a keyed hop sums them, and the finish solves
    cov = (Sxy − SxSy/n)/n cell-wise. The exchange moves
    O(blocks × dim²) rows — independent of corpus size."""
    from ..context import configure_shuffle

    configure_shuffle(16)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    part_schema = pa.schema(
        [
            pa.field("i", pa.int64()),
            pa.field("j", pa.int64()),
            pa.field("s", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t["embedding"].combine_chunks()
        dim = len(col[0])
        x = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        xtx = x.T @ x
        sums = x.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        i = np.concatenate([ii.ravel(), np.arange(dim), [-1]])
        j = np.concatenate([jj.ravel(), np.full(dim, -1), [-1]])
        s = np.concatenate([xtx.ravel(), sums, [float(len(x))]])
        return pa.table(
            {
                "i": pa.array(i.astype(np.int64)),
                "j": pa.array(j.astype(np.int64)),
                "s": pa.array(s),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
        .repartition(1)
    )

    out_schema = pa.schema(
        [
            pa.field("i", pa.int64()),
            pa.field("j", pa.int64()),
            pa.field("cov", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        i = t["i"].to_numpy(zero_copy_only=False)
        j = t["j"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        n = float(s[(i == -1) & (j == -1)][0])
        marg = i[(j == -1) & (i >= 0)]
        sums = np.zeros(marg.max() + 1 if len(marg) else 0, dtype=np.float64)
        sums[marg] = s[(j == -1) & (i >= 0)]
        cells = (i >= 0) & (j >= 0)
        ci, cj, cs = i[cells], j[cells], s[cells]
        cov = (cs - sums[ci] * sums[cj] / n) / n
        return pa.table(
            {
                "i": pa.array(ci.astype(np.int64)),
                "j": pa.array(cj.astype(np.int64)),
                "cov": sql_round(pa.array(cov), 6),
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def cume_dist_price(sf_dir: str, num_parts: int | None = None) -> ray.data.Dataset:
    """Exact ``cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY
    o_totalprice)`` at fact scale WITHOUT co-locating whole ORDER BY
    partitions (5 priorities would otherwise concentrate into 5 blocks).
    The ``global_rank`` range-partition pattern, windowed:

    1. per-block samples of the composite (priority, price) key →
       P−1 range boundaries (equal keys can never straddle a range);
    2. per-(range, priority) counts → exclusive prefix offsets AND
       per-priority totals on the driver (P × |priorities| scalars);
    3. one keyed hop by range id; each block sorts its slice and
       assigns cume_dist = (offset + local tie-group end + 1) / n_prio,
       vectorized across every priority in the block.
    """
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

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    # deterministic priority codes: sorted distinct (dimension-bounded)
    prios = sorted(
        ds.select_columns(["o_orderpriority"])
        .unique("o_orderpriority")
    )
    # composite sortable key: code * 1e9 + price (price domain bounded;
    # asserted per batch)
    SCALE = 1e9

    def keyed(t: pa.Table) -> pa.Table:
        prio = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        assert price.max(initial=0.0) < SCALE, "price exceeds composite range"
        # vectorized code lookup via searchsorted on the sorted prios
        # (code IS the sorted position, so the searchsorted index is it)
        pidx = np.searchsorted(np.array(prios, dtype=object), prio.astype(object))
        k = pidx.astype(np.float64) * SCALE + price
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "code": pa.array(pidx.astype(np.int64)),
                "price": pa.array(price),
                "k": pa.array(k),
            }
        )

    kds = ds.map_batches(keyed, batch_format="pyarrow")

    def block_sample(t: pa.Table) -> pa.Table:
        k = np.sort(t["k"].to_numpy(zero_copy_only=False))
        if len(k) > 8:
            pick = np.linspace(0, len(k) - 1, 8).astype(np.int64)
            k = k[pick]
        return pa.table({"k": pa.array(k)})

    sampled = np.sort(
        kds.select_columns(["k"])
        .map_batches(block_sample, batch_format="pyarrow")
        .to_pandas()["k"]
        .to_numpy(np.float64)
    )
    if len(sampled) == 0:
        boundaries = np.array([], dtype=np.float64)
    else:
        idx = np.unique(
            (np.linspace(0, 1, num_parts + 1)[1:-1] * (len(sampled) - 1))
            .round()
            .astype(np.int64)
        )
        boundaries = np.unique(sampled[idx])

    def tag(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, k, side="right").astype(np.int64)
        return t.append_column("part", pa.array(part))

    tagged = kds.map_batches(tag, batch_format="pyarrow")

    # per-(part, code) counts → prefix offsets + per-code totals
    from ray.data.aggregate import Count

    pc_counts = (
        tagged.groupby(["part", "code"]).aggregate(Count(alias_name="n")).to_pandas()
    )
    pc_counts = pc_counts.sort_values(["code", "part"])
    n_codes = len(prios)
    max_part = len(boundaries) + 1
    off_grid = np.zeros((max_part, n_codes), dtype=np.int64)
    tot_grid = np.zeros(n_codes, dtype=np.float64)
    for code, grp in pc_counts.groupby("code"):
        parts_ = grp["part"].to_numpy(np.int64)
        ns = grp["n"].to_numpy(np.int64)
        off_grid[parts_, int(code)] = np.concatenate(([0], np.cumsum(ns)[:-1]))
        tot_grid[int(code)] = ns.sum()
    off_ref = ray.put((off_grid, tot_grid))

    out_schema = pa.schema(
        [
            pa.field("o_orderkey", pa.int64()),
            pa.field("o_orderpriority", pa.string()),
            pa.field("cd", pa.float64()),
        ]
    )
    prio_arr = np.array(prios, dtype=object)

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        off_grid, tot_grid = ray.get(off_ref)
        part = t["part"].to_numpy(zero_copy_only=False)
        code = t["code"].to_numpy(zero_copy_only=False)
        price = t["price"].to_numpy(zero_copy_only=False)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((price, code, part))
        p_s, c_s, v_s, k_s = part[order], code[order], price[order], okey[order]
        seg_new = np.concatenate(
            ([True], (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        seg_starts = np.flatnonzero(seg_new)
        seg_id = np.cumsum(seg_new) - 1
        local = np.arange(len(v_s)) - seg_starts[seg_id]
        # tie-group END within the (part, code) segment
        tie_new = seg_new | np.concatenate(([True], v_s[1:] != v_s[:-1]))
        tie_id = np.cumsum(tie_new) - 1
        n_ties = tie_id[-1] + 1
        tie_last = np.zeros(n_ties, dtype=np.int64)
        np.maximum.at(tie_last, tie_id, local)
        last_local = tie_last[tie_id]
        off = off_grid[p_s.astype(np.int64), c_s.astype(np.int64)]
        tot = tot_grid[c_s.astype(np.int64)]
        cd = (off + last_local + 1) / tot
        return pa.table(
            {
                "o_orderkey": pa.array(k_s.astype(np.int64)),
                "o_orderpriority": pa.array(prio_arr[c_s.astype(np.int64)], pa.string()),
                "cd": sql_round(pa.array(cd), 6),
            },
            schema=out_schema,
        )

    return tagged.repartition(join_partitions(num_parts), keys=["part"]).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None
    )
