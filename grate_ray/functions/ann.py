"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k per query — the baseline. The
  query matrix is broadcast once via ``ray.put`` and each ``map_batches``
  batch does one float64 matmul against it (never re-shipped per batch).
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets so each
  batch only scores queries sharing a bucket; approximate, self-verified
  against brute force in tests.

Determinism for the oracle: similarities are computed in float64 and
rounded to 6 decimals; ranking is (sim6 desc, vec_id asc) — the DuckDB
oracle (list_cosine_similarity + row_number) uses the identical key, so
top-k sets match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..context import actor_pool_size


def _stack(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy-ish)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


class _Scorer:
    """Actor: holds the normalized query matrix (fetched once)."""

    def __init__(self, q_ref, id_col: str, emb_col: str):
        q_ids, q_mat = ray.get(q_ref)
        self.q_ids = q_ids
        self.q = _normalize(q_mat)  # (m, d)
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        x = _normalize(_stack(t[self.emb_col]))  # (n, d)
        sims = x @ self.q.T  # (n, m)
        n, m = sims.shape
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.q_ids, n)),
                "vec_id": pa.array(np.tile(ids, m)),
                "sim": pa.array(np.round(sims.T.reshape(-1), 6)),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Exact cosine top-k: per-batch matmul against the broadcast query
    matrix, per-batch local top-k prune, then a tiny groupby(query) final
    top-k (partial top-k before the shuffle — only n_queries×k rows per
    batch ever move)."""
    import pandas as pd

    q_ref = ray.put((np.asarray(query_ids), np.asarray(query_mat, dtype=np.float64)))

    scored = ds.map_batches(
        _Scorer,
        fn_constructor_args=(q_ref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )

    def local_topk(t: pa.Table) -> pa.Table:
        # Arrow/numpy-native per-query head-k (no pandas copy): one sort,
        # then rank-within-run via the sorted query-id boundaries
        if exclude_self:
            t = t.filter(pc.not_equal(t["query_id"], t["vec_id"]))
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("query_id", "ascending"),
                ("sim", "descending"),
                ("vec_id", "ascending"),
            ],
        )
        t = t.take(order)
        q = t["query_id"].to_numpy(zero_copy_only=False)
        change = np.empty(len(q), dtype=bool)
        change[0] = True
        change[1:] = q[1:] != q[:-1]
        starts = np.flatnonzero(change)
        rank = np.arange(len(q), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(q)))
        )
        return t.filter(pa.array(rank < k))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    all_ids: np.ndarray,
    all_mat: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs: the full (small) normalized matrix
    is broadcast once; each batch does one matmul against it and keeps
    (a < b, sim ≥ threshold). Exact — the 100 TB path swaps the broadcast
    for the LSH-bucketed scorer below; sims rounded to 6dp to match the
    SQL oracle bit-for-bit."""
    ref = ray.put((np.asarray(all_ids), _normalize(np.asarray(all_mat, dtype=np.float64))))

    class Pairer:
        def __init__(self, ref, thr):
            self.ids, self.mat = ray.get(ref)
            self.thr = thr

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            x = _normalize(_stack(t[emb_col]))
            sims = np.round(x @ self.mat.T, 6)  # (n, all)
            ii, jj = np.nonzero(sims >= self.thr)
            a = ids[ii]
            b = self.ids[jj]
            keep = a < b
            return pa.table(
                {
                    "a": pa.array(a[keep].astype(np.int64)),
                    "b": pa.array(b[keep].astype(np.int64)),
                    "sim": pa.array(sims[ii[keep], jj[keep]]),
                }
            )

    return ds.map_batches(
        Pairer, fn_constructor_args=(ref, threshold),
        batch_format="pyarrow", concurrency=(1, actor_pool_size()),
    )


def ivf_centroids(d: int, ncentroids: int, seed: int) -> np.ndarray:
    """Seeded spherical centroids (unit vectors) — the coarse quantizer.
    Derived deterministically from (seed, d, n) so every task regenerates
    them locally and the SQL oracle embeds the identical literals. (A
    production build would k-means a sample; seeded directions keep the
    partition deterministic and oracle-mirrorable.)"""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((ncentroids, d))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


class _IVFScorer:
    """Actor: holds queries + centroids; scores each batch's vectors only
    against queries probing the vector's Voronoi cell."""

    def __init__(self, q_ref, ncentroids, nprobe, seed, id_col, emb_col):
        q_ids, q_mat = ray.get(q_ref)
        self.q_ids = q_ids
        self.q = _normalize(q_mat)
        self.ncentroids = ncentroids
        self.seed = seed
        self.id_col = id_col
        self.emb_col = emb_col
        self.cent = ivf_centroids(q_mat.shape[1], ncentroids, seed)  # (c, d)
        qd = self.q @ self.cent.T  # (m, c)
        # nprobe nearest cells per query (ties broken by lower cell id —
        # argsort on (-dot, id) — mirrored by the SQL row_number key)
        self.q_cells = np.argsort(-qd, axis=1, kind="stable")[:, :nprobe]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        x = _normalize(_stack(t[self.emb_col]))
        cells = np.argmax(x @ self.cent.T, axis=1)  # (n,)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            mask = np.isin(cells, self.q_cells[qi])
            if not mask.any():
                continue
            sims = x[mask] @ self.q[qi]
            out_q.append(np.full(int(mask.sum()), qid))
            out_v.append(ids[mask])
            out_s.append(np.round(sims, 6))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 5,
    ncentroids: int = 16,
    nprobe: int = 4,
    seed: int = 9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF-style approximate top-k: a coarse quantizer (Voronoi cells
    over seeded spherical centroids) restricts each query to its nprobe
    nearest cells — the inverted-file scale path alongside the
    hyperplane-LSH variant. Cell assignment is norm-invariant
    (argmax c·x == argmax c·x̂), which is what lets the SQL oracle use
    raw embedding dot products."""
    import pandas as pd

    q_ref = ray.put((np.asarray(query_ids), np.asarray(query_mat, dtype=np.float64)))
    scored = ds.map_batches(
        _IVFScorer,
        fn_constructor_args=(q_ref, ncentroids, nprobe, seed, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["query_id"] != g["vec_id"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def pq_codebooks(dim: int, m: int, ksub: int, seed: int) -> np.ndarray:
    """(m, ksub, dim//m) seeded spherical sub-codebooks, snapped to 6dp
    so every task regenerates identical doubles and the SQL oracle can
    embed the same literals. (A production build would train each
    sub-codebook with k-means on a sample — ``kmeans_assign`` is the
    in-repo trainer; seeded directions keep the quantizer deterministic
    and oracle-mirrorable.)"""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return np.round(
        np.stack([ivf_centroids(dsub, ksub, seed + j) for j in range(m)]), 6
    )


def pq_encode_codes(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) → (n, m) uint8 PQ codes: per subspace, the L2-nearest
    code — argmin over (|c|² − 2·x_sub·c), the |x_sub|²-free form; dot
    products snapped to 6dp so numpy and a SQL mirror take identical
    argmin decisions (ties → lower code, numpy first-min)."""
    m, ksub, dsub = books.shape
    xs = x.reshape(len(x), m, dsub)
    dots = np.round(np.einsum("nmd,mkd->nmk", xs, books), 6)
    cn2 = np.round((books**2).sum(axis=2), 6)  # (m, ksub)
    dist = cn2[None, :, :] - 2.0 * dots
    return dist.argmin(axis=2).astype(np.uint8)


class _PQScorer:
    """Actor: regenerates the seeded codebooks locally (nothing to
    broadcast) and precomputes each query's ADC lookup table (m × ksub
    partial dot products, 6dp). Per batch: encode vectors to (n, m)
    uint8 codes, score = Σ_sub lut[sub, code[sub]] via one gather."""

    def __init__(self, q_ref, m, ksub, seed, id_col, emb_col):
        q_ids, q_mat = ray.get(q_ref)
        self.q_ids = q_ids
        self.m = m
        self.books = pq_codebooks(q_mat.shape[1], m, ksub, seed)
        dsub = q_mat.shape[1] // m
        qs = q_mat.reshape(len(q_mat), m, dsub)
        self.lut = np.round(np.einsum("qmd,mkd->qmk", qs, self.books), 6)
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _stack(t[self.emb_col])
        codes = pq_encode_codes(x, self.books)  # (n, m)
        sub_idx = np.arange(self.m)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            sc = self.lut[qi][sub_idx, codes].sum(axis=1)
            out_q.append(np.full(len(ids), qid, dtype=np.int64))
            out_v.append(ids)
            out_s.append(np.round(sc, 6))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def pq_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    seed: int = 33,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Product-quantization ADC top-k (the memory-bound ANN scale path:
    a 64-float vector compresses to m=8 bytes, so a 100 TB embedding
    corpus's codes fit hot): encode per batch, score every query against
    the batch via the ADC lookup gather, per-batch local top-k prune,
    tiny groupby(query) final — only n_queries × k rows per batch ever
    move. Approximation comes from the quantizer only; scoring and
    ranking (round(score,6) desc, vec_id asc) are deterministic."""
    import pandas as pd

    q_ref = ray.put(
        (np.asarray(query_ids), np.asarray(query_mat, dtype=np.float64))
    )
    scored = ds.map_batches(
        _PQScorer,
        fn_constructor_args=(q_ref, m, ksub, seed, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["query_id"], t["vec_id"]))
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("query_id", "ascending"),
                ("score", "descending"),
                ("vec_id", "ascending"),
            ],
        )
        t = t.take(order)
        q = t["query_id"].to_numpy(zero_copy_only=False)
        change = np.empty(len(q), dtype=bool)
        change[0] = True
        change[1:] = q[1:] != q[:-1]
        starts = np.flatnonzero(change)
        rank = np.arange(len(q), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(q)))
        )
        return t.filter(pa.array(rank < k))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


#: widths up to this share a prefix: hyperplanes(d, a, s)[:, :b] ==
#: hyperplanes(d, b, s) for b <= a <= PLANE_PREFIX_WIDTH.  Lets a SQL
#: oracle embed the max-width literals once and select the first
#: ``nbits`` columns with a runtime-derived width.
PLANE_PREFIX_WIDTH = 24


def hyperplanes(d: int, nbits: int, seed: int) -> np.ndarray:
    """Seeded (d, nbits) hyperplane matrix — derived deterministically
    from (seed, d, nbits), so every task regenerates it locally (nothing
    to broadcast) and the SQL oracle embeds the identical literals.
    Widths ≤ PLANE_PREFIX_WIDTH are column-prefixes of each other, so a
    corpus-size-derived width can share one set of oracle literals."""
    rng = np.random.default_rng(seed)
    width = max(nbits, PLANE_PREFIX_WIDTH)
    return rng.standard_normal((d, width))[:, :nbits]


def auto_nbits(n: int) -> int:
    """Corpus-size-derived LSH code width: target ~24 exact vectors per
    bucket, clamp to [8, PLANE_PREFIX_WIDTH].  Integer-exact (no float
    log2) so a SQL oracle reproduces it bit-for-bit:
    ``least(greatest(length(bin(greatest((n+23)//24, 2) - 1)), 8), 24)``.

    With a FIXED nbits the per-bucket population grows linearly in the
    corpus and candidate pairs grow QUADRATICALLY (measured: 10x the
    vectors at nbits=8 cost 21x the wall — BASELINE.md sf1 ladder)."""
    m = max(-(-n // 24), 2)
    return min(max((m - 1).bit_length(), 8), PLANE_PREFIX_WIDTH)


def cosine_neardup_pairs_lsh(
    ds: ray.data.Dataset,
    threshold: float = 0.9,
    nbits: int | None = None,
    seed: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_cap: int = 500,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs, DISTRIBUTED — the 100 TB path:
    no all-pairs broadcast matmul, no driver-side matrix.

    1. each vector gets an nbits hyperplane code (planes regenerated per
       task from the seed — sign is invariant to normalization);
    2. every vector lands in its exact bucket plus its nbits one-bit-flip
       probe buckets; ONE hash shuffle co-locates buckets; within a
       bucket block, exact×exact and probe×exact pairs cover every pair
       with code Hamming distance ≤ 1 (recall knob: more bits → finer
       buckets, fewer candidates);
    3. candidates are deduped with a hash aggregate, embeddings re-joined
       on both sides, and exact float64 cosine ≥ threshold verifies.

    ``bucket_cap``: buckets whose EXACT population exceeds the cap are
    dropped (degenerate code regions would go quadratic); a Hamming-1
    pair survives if either endpoint's bucket is kept. The SQL oracle
    mirrors code assignment, probe coverage and the cap exactly.
    """
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    # three branches read the input (codes + both pack sides) — pin it in
    # the object store once instead of re-scanning the source three times
    ds = ds.materialize()
    if nbits is None:
        # code width MUST track corpus size (see auto_nbits: fixed nbits
        # goes quadratic in candidate pairs — BASELINE.md sf1 ladder).
        nbits = auto_nbits(ds.count())

    def code_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vid": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _stack(t[emb_col])
        planes = hyperplanes(x.shape[1], nbits, seed)
        codes = ((x @ planes > 0) @ (1 << np.arange(nbits))).astype(np.int64)
        n = len(ids)
        out_b = [codes]
        out_i = [ids]
        out_k = [np.zeros(n, dtype=np.int8)]
        for j in range(nbits):
            out_b.append(codes ^ (1 << j))
            out_i.append(ids)
            out_k.append(np.ones(n, dtype=np.int8))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_b)),
                "vid": pa.array(np.concatenate(out_i)),
                "kind": pa.array(np.concatenate(out_k)),
            }
        )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        vid = t["vid"].to_numpy(zero_copy_only=False)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        b_s, v_s, k_s = bucket[order], vid[order], kind[order]
        change = np.empty(len(b_s), dtype=bool)
        change[0] = True
        change[1:] = b_s[1:] != b_s[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(b_s))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            exact = v_s[s:e][k_s[s:e] == 0]
            if len(exact) == 0 or len(exact) > bucket_cap:
                continue
            probe = v_s[s:e][k_s[s:e] == 1]
            if len(exact) >= 2:
                ii, jj = np.triu_indices(len(exact), 1)
                x0, y0 = exact[ii], exact[jj]
                a_out.append(np.minimum(x0, y0))
                b_out.append(np.maximum(x0, y0))
            if len(probe) and len(exact):
                x1 = np.repeat(probe, len(exact))
                y1 = np.tile(exact, len(probe))
                keep = x1 != y1
                x1, y1 = x1[keep], y1[keep]
                a_out.append(np.minimum(x1, y1))
                b_out.append(np.maximum(x1, y1))
        if not a_out:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_out)),
                "b": pa.array(np.concatenate(b_out)),
            }
        )

    from ..functions.dedup import grouped_reduce

    npart = join_partitions(32)
    cand = (
        grouped_reduce(
            ds.map_batches(code_batch, batch_format="pyarrow")
            .repartition(join_partitions(64), keys=["bucket"])
            .map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None),
            ["a", "b"], npart, out_col="_m",
        )
        .map_batches(lambda t: t.drop_columns(["_m"]), batch_format="pyarrow")
    )
    from ..context import nonempty_blocks

    # materializes (splits the DAG before the verify joins — scheduler
    # deadlocks when an actorless multi-shuffle prefix and two joins
    # share one execution at small CPU counts; candidates are tiny) AND
    # drops the schema-less empty blocks sparse keyed reduces emit
    # (Ray 2.49), which crash the join aggregator
    cand = nonempty_blocks(cand)

    # join payloads can't be list<float> (Arrow hash-join limitation) —
    # pack each embedding into ONE fixed-size-binary cell, zero-copy both
    # ways (the float32 bytes round-trip losslessly)
    def pack(name: str):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col].cast(pa.int64())
            x = _stack(t[emb_col]).astype(np.float32)
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(x.shape[1] * 4),
                len(ids),
                [None, pa.py_buffer(np.ascontiguousarray(x).tobytes())],
            )
            return pa.table({name: ids, f"emb_{name}": fsb})

        return f

    def unpack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        width = arr.type.byte_width // 4
        flat = np.frombuffer(arr.buffers()[1], dtype=np.float32)
        lo = arr.offset * width
        return flat[lo : lo + len(arr) * width].reshape(len(arr), width).astype(np.float64)

    ea = ds.map_batches(pack("a"), batch_format="pyarrow")
    eb = ds.map_batches(pack("b"), batch_format="pyarrow")
    j = cand.join(ea, join_type="inner", num_partitions=npart, on=("a",))
    j = nonempty_blocks(j)  # join emits schema-less empty-partition blocks
    j = j.join(eb, join_type="inner", num_partitions=npart, on=("b",))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        xa = _normalize(unpack(t["emb_a"]))
        xb = _normalize(unpack(t["emb_b"]))
        sim = np.round(np.einsum("ij,ij->i", xa, xb), 6)
        out = pa.table({"a": t["a"], "b": t["b"], "sim": pa.array(sim)})
        return out.filter(pc.greater_equal(out["sim"], threshold))

    return j.map_batches(verify, batch_format="pyarrow")


class _LSHScorer:
    """Actor: hyperplane-LSH bucketed scorer. Scores a batch only against
    queries sharing its vectors' buckets (multi-probe = exact bucket)."""

    def __init__(self, q_ref, planes_ref, id_col: str, emb_col: str):
        q_ids, q_mat = ray.get(q_ref)
        self.planes = ray.get(planes_ref)  # (d, nbits)
        self.q_ids = q_ids
        self.q = _normalize(q_mat)
        self.q_codes = (self.q @ self.planes > 0) @ (1 << np.arange(self.planes.shape[1]))
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        x = _normalize(_stack(t[self.emb_col]))
        codes = (x @ self.planes > 0) @ (1 << np.arange(self.planes.shape[1]))
        out_q, out_v, out_s = [], [], []
        for qi, (qid, qc) in enumerate(zip(self.q_ids, self.q_codes)):
            # multi-probe: exact bucket OR Hamming-1 neighbors (recovers
            # recall lost to hyperplane boundaries on weakly-similar pairs)
            xor = np.bitwise_xor(codes, qc)
            mask = (xor & (xor - 1)) == 0  # popcount(xor) <= 1
            if not mask.any():
                continue
            sims = x[mask] @ self.q[qi]
            out_q.append(np.full(mask.sum(), qid))
            out_v.append(ids[mask])
            out_s.append(np.round(sims, 6))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def lsh_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 5,
    nbits: int = 8,
    seed: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate cosine top-k via random-hyperplane buckets (the IVF/LSH
    scale path: each vector scored only against same-bucket queries)."""
    import pandas as pd

    d = np.asarray(query_mat).shape[1]
    planes = hyperplanes(d, nbits, seed)
    q_ref = ray.put((np.asarray(query_ids), np.asarray(query_mat, dtype=np.float64)))
    p_ref = ray.put(planes)

    scored = ds.map_batches(
        _LSHScorer,
        fn_constructor_args=(q_ref, p_ref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["query_id"] != g["vec_id"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# --- distributed k-means (Lloyd) over the embedding corpus -------------------


def _kmeans_argmax(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Cluster assignment: argmax of the 6dp-rounded dot (lower-index
    tiebreak == numpy first-max) — the convention every k-means consumer
    (assign, SemDeDup, and their SQL mirrors) shares."""
    dots = np.round(mat @ c.T, 6)
    return dots.argmax(axis=1)


def kmeans_centroids(
    ds: ray.data.Dataset,
    ncentroids: int = 8,
    iters: int = 2,
    seed: int = 21,
    dim: int = 64,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Train the Lloyd centroids: seeded spherical init (``ivf_centroids``)
    then ``iters-1`` update passes. Each pass is ONE streaming pass
    emitting per-batch partial sums (cell, Σvec, n); driver state is k×d
    floats (bounded, independent of corpus size); new centroids broadcast
    by closure into the next pass. Centroid means are snapped to 6dp
    between iterations so the SQL mirror (DuckDB summation order ≠ numpy
    SIMD order) lands on identical argmax decisions."""
    cent = ivf_centroids(dim, ncentroids, seed)

    assign = _kmeans_argmax

    for _ in range(iters - 1):
        c_now = cent

        def partials(t: pa.Table, c_now=c_now) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "cell": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.float64())),
                        "n": pa.array([], pa.int64()),
                    }
                )
            mat = _stack(t[emb_col])
            cells = assign(mat, c_now)
            order = np.argsort(cells, kind="stable")
            sc = cells[order]
            change = np.empty(len(sc), dtype=bool)
            change[0] = True
            change[1:] = sc[1:] != sc[:-1]
            starts = np.flatnonzero(change)
            sums = np.add.reduceat(mat[order], starts, axis=0)
            ns = np.diff(np.append(starts, len(sc))).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(sc[starts].astype(np.int64)),
                    "s": pa.array(list(sums)),
                    "n": pa.array(ns),
                }
            )

        sums = np.zeros((ncentroids, cent.shape[1]), dtype=np.float64)
        counts = np.zeros(ncentroids, dtype=np.int64)
        for part in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for cell, s, n in zip(
                part["cell"].to_pylist(), part["s"].to_pylist(), part["n"].to_pylist()
            ):
                sums[cell] += np.asarray(s)
                counts[cell] += n
        # empty cells keep their previous centroid (same rule in SQL via
        # coalesce with the prior literal)
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = np.round(new, 6)

    return cent


def kmeans_assign(
    ds: ray.data.Dataset,
    ncentroids: int = 8,
    iters: int = 2,
    seed: int = 21,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Semantic clustering of the embedding corpus (the SemDeDup /
    cluster-balancing primitive): deterministic fixed-iteration Lloyd
    k-means (see ``kmeans_centroids``) then one assignment pass.

    Emits (vec_id, cluster) for every vector.
    """
    c_fin = kmeans_centroids(
        ds, ncentroids=ncentroids, iters=iters, seed=seed, dim=dim, emb_col=emb_col
    )
    assign = _kmeans_argmax

    def final_assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        mat = _stack(t[emb_col])
        return pa.table(
            {
                "vec_id": pc.cast(t[id_col], pa.int64()),
                "cluster": pa.array(assign(mat, c_fin).astype(np.int64)),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


def semantic_dedup(
    ds: ray.data.Dataset,
    ncentroids: int = 8,
    iters: int = 2,
    seed: int = 21,
    dim: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means clusters
    the corpus semantically, then cosine near-dup pruning runs ONLY
    within each cluster — the O(n²) all-pairs check becomes k independent
    O((n/k)²) blocks behind ONE keyed shuffle on the cluster id. Keep
    rule (keep-first, matching the rest of the dedup family): a vector
    survives iff no lower-``vec_id`` vector in ITS cluster has
    round(cosine, 6) ≥ ``threshold``.

    Scale shape: centroid training is ``kmeans_centroids`` (streaming
    partial sums, k×d driver state); assignment carries the embedding so
    the corpus moves exactly once (the cluster-keyed repartition); the
    per-cluster pairwise matmul assumes one cluster fits a block — at
    100 TB you raise ``ncentroids`` so max-cluster ≲ block budget, which
    is precisely the SemDeDup paper's regime (they use k≈11k for LAION).
    Emits (vec_id, cluster, keep∈{0,1}) for every vector.
    """
    from ..context import configure_shuffle, join_partitions

    c_fin = kmeans_centroids(
        ds, ncentroids=ncentroids, iters=iters, seed=seed, dim=dim, emb_col=emb_col
    )
    configure_shuffle(32)

    def assign_with_emb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    emb_col: pa.array([], pa.list_(pa.float32())),
                }
            )
        mat = _stack(t[emb_col])
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cluster": pa.array(_kmeans_argmax(mat, c_fin).astype(np.int64)),
                emb_col: t[emb_col],
            }
        )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_stack(t[emb_col]))
        order = np.lexsort((ids, cl))
        cl_s, ids_s, mat_s = cl[order], ids[order], mat[order]
        keep = np.ones(len(ids_s), dtype=np.int64)
        change = np.empty(len(cl_s), dtype=bool)
        change[0] = True
        change[1:] = cl_s[1:] != cl_s[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(cl_s))
        for s, e in zip(starts, ends):  # ≤ ncentroids segments per block
            sub = mat_s[s:e]
            sims = np.round(sub @ sub.T, 6)
            # rows sorted by vec_id asc: i is a dup iff any j<i has sim≥thr
            dup = np.triu(sims >= threshold, k=1).any(axis=0)
            keep[s:e] = (~dup).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids_s),
                "cluster": pa.array(cl_s.astype(np.int64)),
                "keep": pa.array(keep),
            }
        )

    return (
        ds.map_batches(assign_with_emb, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["cluster"])
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )


def knn_classify(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> pa.Table:
    """k-NN majority-vote classification of the broadcast queries against
    the corpus: exact cosine top-k per query (the verified distributed
    ``brute_force_topk`` kernel — per-batch matmul + local prune, one
    tiny final shuffle), then labels for the ≤ n_queries × k neighbor
    rows are fetched with ONE broadcast membership filter over the
    corpus — the big table is never shuffled and never leaves the
    cluster. Ties: highest vote count, then smallest label. Driver state
    is bounded by n_queries × k rows end to end."""
    import pandas as pd

    topk = brute_force_topk(
        ds.select_columns([id_col, emb_col]), query_ids, query_mat,
        k=k, id_col=id_col, emb_col=emb_col,
    )
    nt = topk.select_columns(["query_id", id_col]).to_pandas()

    wanted = ray.put(np.unique(nt[id_col].to_numpy()))

    def pick_labels(t: pa.Table) -> pa.Table:
        w = ray.get(wanted)
        mask = pc.is_in(t[id_col], value_set=pa.array(w))
        return t.filter(mask).select([id_col, label_col])

    labels = (
        ds.select_columns([id_col, label_col])
        .map_batches(pick_labels, batch_format="pyarrow")
        .to_pandas()
    )
    votes = (
        nt.merge(labels, on=id_col)
        .groupby(["query_id", label_col], as_index=False)
        .size()
        .rename(columns={"size": "n_votes"})
    )
    votes = votes.sort_values(
        ["query_id", "n_votes", label_col], ascending=[True, False, True],
        kind="mergesort",
    )
    top = votes.groupby("query_id", as_index=False).head(1)
    return pa.table(
        {
            "query_id": pa.array(top["query_id"].to_numpy(np.int64)),
            "pred_label": pa.array(top[label_col].to_numpy(np.int64)),
            "n_votes": pa.array(top["n_votes"].to_numpy(np.int64)),
        }
    )
