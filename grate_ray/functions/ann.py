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
import ray
import ray.data


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
        concurrency=(1, 8),
    )

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if exclude_self:
            df = df[df["query_id"] != df["vec_id"]]
        df = df.sort_values(
            ["query_id", "sim", "vec_id"], ascending=[True, False, True]
        )
        return pa.Table.from_pandas(
            df.groupby("query_id", sort=False).head(k), preserve_index=False
        )

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
        batch_format="pyarrow", concurrency=(1, 8),
    )


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
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, nbits))
    q_ref = ray.put((np.asarray(query_ids), np.asarray(query_mat, dtype=np.float64)))
    p_ref = ray.put(planes)

    scored = ds.map_batches(
        _LSHScorer,
        fn_constructor_args=(q_ref, p_ref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["query_id"] != g["vec_id"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")
