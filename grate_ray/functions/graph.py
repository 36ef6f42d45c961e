"""Distributed graph analytics over edge relations.

Companion of the near-dup ``connected_components`` resolver
(functions/dedup.py): PageRank is the canonical *iterative* distributed
algorithm — each iteration is one hash join (ranks onto edges) plus one
keyed float sum, with driver state limited to the node count N.

Determinism contract (shared with ``kmeans_assign``): a FIXED iteration
count and a 6dp snap of every rank between iterations, so numpy and a
SQL mirror (whose summation orders differ by ULPs) walk the identical
trajectory. The simple variant drops dangling-node mass (documented;
the SQL oracle drops it identically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _sum_by_node(
    ds: ray.data.Dataset, npart: int, val_col: str = "c"
) -> ray.data.Dataset:
    """Exact float sum per int64 node: ONE keyed repartition + a
    vectorized sort/reduceat per block (the grouped_reduce pattern with
    float values)."""

    def block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("node", pa.int64()), pa.field(val_col, pa.float64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(node, kind="stable")
        sn = node[order]
        change = np.empty(len(sn), dtype=bool)
        change[0] = True
        change[1:] = sn[1:] != sn[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(v[order], starts)
        return pa.table(
            {"node": pa.array(sn[starts]), val_col: pa.array(sums)}
        )

    return ds.repartition(npart, keys=["node"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def pagerank(
    edges: ray.data.Dataset,
    iters: int = 3,
    damping: float = 0.85,
    npart: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """PageRank over an (src, dst) edge relation, ``iters`` fixed rounds:

        r_0(v)     = round(1/N, 6)
        r_{k+1}(v) = round((1-d)/N + d · Σ_{(u,v)∈E} r_k(u)/outdeg(u), 6)

    Emits (node, rank). Edges dedup and out-degrees come from one keyed
    hop by src; each iteration is one hash join (rank onto its out-edges)
    + one keyed float sum per dst (zero-in-degree nodes joined back at
    (1-d)/N). Rank relations are materialized between rounds — they are
    node-sized, orders of magnitude smaller than the edge relation."""
    from ..context import configure_shuffle, join_partitions, nonempty_blocks

    configure_shuffle(32)
    npart = npart or join_partitions(32)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t[src_col], pa.int64()),
                "dst": pc.cast(t[dst_col], pa.int64()),
            }
        )

    def dedup_outdeg(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                pa.field("src", pa.int64()),
                pa.field("dst", pa.int64()),
                pa.field("outdeg", pa.int64()),
            ]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().drop_duplicates(["src", "dst"])
        deg = df.groupby("src")["dst"].transform("size")
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(), pa.int64()),
                "dst": pa.array(df["dst"].to_numpy(), pa.int64()),
                "outdeg": pa.array(deg.to_numpy(), pa.int64()),
            }
        )

    # nonempty_blocks: sparse keyed repartitions emit schema-less empty
    # blocks (Ray 2.49) that crash the per-iteration hash join
    e = nonempty_blocks(
        edges.map_batches(norm, batch_format="pyarrow")
        .repartition(npart, keys=["src"])
        .map_batches(dedup_outdeg, batch_format="pyarrow", batch_size=None)
    )

    def node_sides(t: pa.Table) -> pa.Table:
        def arr(col):
            return (
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )

        return pa.table(
            {"node": pa.concat_arrays([arr(t["src"]), arr(t["dst"])])}
        )

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([pa.field("node", pa.int64())]).empty_table()
        u = np.unique(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = nonempty_blocks(
        e.map_batches(node_sides, batch_format="pyarrow")
        .repartition(npart, keys=["node"])
        .map_batches(distinct_block, batch_format="pyarrow", batch_size=None)
    )
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.schema(
                [pa.field("node", pa.int64()), pa.field("rank", pa.float64())]
            ).empty_table()
        )
    r0 = round(1.0 / n, 6)
    teleport = (1.0 - damping) / n

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank": pa.array(np.full(t.num_rows, r0), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # rank blocks mirror nodes' (nonempty) layout

    for _ in range(iters):

        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["node"], "r": t["rank"]})

        msgs = e.join(
            ranks.map_batches(as_src, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=npart,
            on=("src",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "c": pc.divide(
                        t["r"], pc.cast(t["outdeg"], pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        zeros = nodes.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "c": pa.array(np.zeros(t.num_rows), pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        ranks = (
            _sum_by_node(msgs.union(zeros), npart)
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "rank": pa.array(
                            np.round(
                                teleport
                                + damping
                                * t["c"].to_numpy(zero_copy_only=False),
                                6,
                            )
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        ranks = nonempty_blocks(ranks)
    return ranks


def degree_distribution(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Degree histogram of an undirected pair graph (rows ``(a, b, …)``,
    a < b): per-node degree via ONE keyed hop over the exploded endpoint
    relation, then a combiner-first histogram (each block collapses to
    its distinct degrees before the second, tiny hop). Exchange volume:
    2·|edges| rows for the degree count, O(blocks × distinct degrees)
    for the histogram."""
    import numpy as np

    from ..context import configure_shuffle

    configure_shuffle(16)

    node_schema = pa.schema([pa.field("node", pa.int64())])

    def endpoints(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return node_schema.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(np.concatenate([a, b]))}, schema=node_schema)

    from ray.data.aggregate import Count, Sum

    deg = (
        pairs.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="degree"))
    )

    part_schema = pa.schema(
        [pa.field("degree", pa.int64()), pa.field("n_nodes", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"degree": pa.array(uniq), "n_nodes": pa.array(cnt.astype(np.int64))},
            schema=part_schema,
        )

    return (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
        .map_batches(
            lambda t: pa.table(
                {
                    "degree": t["degree"].cast(pa.int64()),
                    "n_nodes": t["n_nodes"].cast(pa.int64()),
                },
                schema=part_schema,
            ),
            batch_format="pyarrow",
        )
    )


class _TriangleCounter:
    """Actor-pool stage: builds a CSR adjacency ONCE per actor from the
    broadcast per-block refs (the driver never concatenates the edge
    relation), then counts, per CHUNK of the deduped directed-edge
    array, the common neighbors that close a triangle — fully
    vectorized, no per-edge Python loop. Each triangle a<b<c is counted
    exactly once, at its (a, b) edge, admitting only common neighbors
    c > b. Counting over index chunks of the actor's own deduped edge
    array (not over streamed edge rows) makes the result exact even if
    the input relation carries duplicate pairs."""

    def __init__(self, block_refs, nchunks):
        self.nchunks = nchunks
        self._build(block_refs)

    def _build(self, block_refs):
        import numpy as np

        self.np = np
        blocks = [ray.get(r) for r in block_refs]
        blocks = [t for t in blocks if t.num_rows]
        if blocks:
            edges = pa.concat_tables(blocks).combine_chunks()
            a = edges["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = edges["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            a = b = np.empty(0, dtype=np.int64)
        # node ids -> dense indices (nodes are the verified-pair
        # survivors — bounded by the LSH bucket caps)
        self.nodes = np.unique(np.concatenate([a, b]))
        n = len(self.nodes)
        src = np.concatenate([np.searchsorted(self.nodes, a),
                              np.searchsorted(self.nodes, b)])
        dst = np.concatenate([np.searchsorted(self.nodes, b),
                              np.searchsorted(self.nodes, a)])
        # CSR over dense indices: unique composite (src*n + dst) keys
        # give deduped directed edges, sorted by (src, dst) — segment
        # boundaries come from per-src counts
        m = max(n, 1)
        self.comp = np.unique(src * m + dst)
        src_d = self.comp // m
        self.indices = (self.comp % m).astype(np.int64)
        self.indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(src_d, minlength=n), out=self.indptr[1:])
        self.n = n

    def _count_chunk(self, chunk: int) -> int:
        np = self.np
        if not self.n:
            return 0
        # this actor's slice of the deduped directed edges, keeping only
        # the src < dst orientation so each undirected edge counts once
        # (nodes are sorted, so index order == value order)
        sl = self.comp[chunk :: self.nchunks]
        xi = (sl // self.n).astype(np.int64)
        yi = (sl % self.n).astype(np.int64)
        keep = xi < yi
        xi, yi = xi[keep], yi[keep]
        if not len(xi):
            return 0
        # flatten every edge's x-neighbor list into ONE candidate array
        # (batched slice gather), then test membership in the
        # y-adjacency with a single searchsorted on the sorted composite
        # (src*n + dst) relation
        lens = self.indptr[xi + 1] - self.indptr[xi]
        tot = int(lens.sum())
        if not tot:
            return 0
        starts = np.repeat(self.indptr[xi], lens)
        seg0 = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        cand = self.indices[starts + np.arange(tot) - seg0]
        q = np.repeat(yi, lens) * self.n + cand
        pos = np.searchsorted(self.comp, q)
        hit = (pos < len(self.comp)) & (
            self.comp[np.minimum(pos, len(self.comp) - 1)] == q
        )
        closes = cand > np.repeat(yi, lens)  # c > b in dense-index order
        return int((hit & closes).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        total = sum(self._count_chunk(int(c)) for c in ids)
        return pa.table({"n": pa.array([total], pa.int64())})


def triangle_count(
    pairs: ray.data.Dataset, max_edges: int = 50_000_000
) -> ray.data.Dataset:
    """Exact triangle count of the near-dup pair graph. The verified
    pair relation is bounded (LSH bucket caps), so the per-block refs
    broadcast once (no driver-side concat — blocks stay in the object
    store) and each actor assembles CSR adjacency in ``__init__``; the
    edge Dataset itself streams through the pool and each batch
    contributes a partial count — one scalar per batch.

    ``max_edges`` makes the documented bucket-cap bound explicit: the
    adjacency must fit one actor's heap, so a pair relation past the
    bound fails fast instead of OOMing the pool."""
    mat = pairs.select_columns(["a", "b"]).materialize()
    n_edges = mat.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([0], pa.int64())})
        )
    if n_edges > max_edges:
        raise ValueError(
            f"pair relation has {n_edges} edges > max_edges={max_edges}; "
            "triangle adjacency is per-actor state — tighten the LSH "
            "bucket caps or raise max_edges deliberately"
        )
    block_refs = list(mat.to_arrow_refs())

    # work units are index chunks of the (deduped) directed-edge array,
    # not streamed edge rows — exact under duplicate input pairs and
    # evenly splittable regardless of the block layout
    nchunks = 64
    counts = ray.data.range(nchunks, override_num_blocks=16).map_batches(
        _TriangleCounter,
        fn_constructor_args=(block_refs, nchunks),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    total = counts.sum("n")
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([int(total or 0)], pa.int64())})
    )
