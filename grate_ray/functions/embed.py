"""Model-free text embeddings via feature hashing (the hashing trick).

Dimension ``d`` of word ``w`` contributes ``sign = 2·bit_d(md5(w)) − 1``;
a document's embedding is the word-count-weighted sum of its words' sign
vectors — a 64-dim random projection of the bag-of-words (the
real-valued generalization of SimHash: SimHash keeps only the sign of
this sum, this keeps the sum itself). No model weights, no vocab file,
fully deterministic — and because md5-low64 ≡ DuckDB md5_number_lower
and the sums are INTEGERS, the entire embedding is exactly
SQL-mirrorable; only the final cosine is floating point (6dp-snapped,
same convention as the ANN family).

Not a transformer — but the honest in-container stand-in that exercises
the identical distributed plumbing (batch embed → broadcast queries →
matmul top-k), and a genuinely usable lexical-similarity signal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _md5_lower64

_U64 = np.uint64
EMBED_DIM = 64


def hashed_embed_batch(texts: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """(n, 64) int64 embedding matrix for a batch of texts — one md5 per
    UNIQUE word, per-doc sums via ``np.add.reduceat`` over the
    (words × 64) sign matrix (the SimHash vote kernel, kept real-valued).
    Empty docs embed to the zero vector."""
    arr = pa.array(texts, pa.string()) if isinstance(texts, list) else texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.zeros((n, EMBED_DIM), dtype=np.int64)
    words = pc.split_pattern(pc.fill_null(arr, ""), pattern=" ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    if len(flat) == 0:
        return out
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n), counts)[nonempty]
    kept = flat.filter(pa.array(nonempty))
    if len(kept) == 0:
        return out
    codes, uniques = pd.factorize(kept.to_pandas())
    hu = _md5_lower64(uniques.to_numpy())
    h = hu[codes]
    bits = np.arange(EMBED_DIM, dtype=_U64)
    signs = ((h[:, None] >> bits[None, :]) & _U64(1)).astype(np.int64) * 2 - 1
    change = np.empty(len(doc_of_word), dtype=bool)
    change[0] = True
    change[1:] = doc_of_word[1:] != doc_of_word[:-1]
    starts = np.flatnonzero(change)
    sums = np.add.reduceat(signs, starts, axis=0)
    out[doc_of_word[starts]] = sums
    return out


def hashed_embeddings(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Embed a document stream: one stateless vectorized pass, emitting
    (id_col, embedding list<double>). Streams — nothing is materialized."""

    def embed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        m = hashed_embed_batch(t[text_col]).astype(np.float64)
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "embedding": pa.array(list(m)),
            }
        )

    return ds.map_batches(embed, batch_format="pyarrow")


def embedding_norms(sf_dir: str, n_parts: int = 8) -> ray.data.Dataset:
    """Per-label vector statistics over the embeddings table: count and
    mean L2 norm — the schema-level demo that list<float> columns flow
    through the same combiner pattern as scalars. Norms are computed in
    float64 from the Arrow list buffer (zero-copy flat values +
    offset-segmented reduceat — no per-row Python), partials collapse
    per batch, one tiny label-keyed hop finishes."""
    from ..context import configure_shuffle, join_partitions
    from .num import sql_round

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    part_schema = pa.schema(
        [
            pa.field("label", pa.int32()),
            pa.field("n", pa.int64()),
            pa.field("s_norm", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sq = flat * flat
        norms = np.sqrt(np.add.reduceat(sq, offsets[:-1]))
        # rows with empty lists: reduceat on equal offsets returns the
        # next element — zero them explicitly
        lens = np.diff(offsets)
        norms = np.where(lens > 0, norms, 0.0)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(lab, return_inverse=True)
        return pa.table(
            {
                "label": pa.array(keys.astype(np.int32)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s_norm": pa.array(np.bincount(inv, weights=norms)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("label", pa.int32()),
            pa.field("n", pa.int64()),
            pa.field("mean_norm", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("label", as_index=False).sum()
        return pa.table(
            {
                "label": pa.array(g["label"].to_numpy(np.int32)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "mean_norm": sql_round(
                    pa.array(g["s_norm"].to_numpy() / g["n"].to_numpy()), 6
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["label"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    """INT8 symmetric-quantization error audit per vector: scale each
    embedding by max|x|/127, round to int8 codes, dequantize, and report
    the per-vector MSE — the fidelity check run before shipping a corpus
    to a quantized ANN index. Entirely shuffle-free and embarrassingly
    parallel: every stage is flat-buffer numpy over the Arrow list
    column (reduceat segments), one output row per vector."""
    from ..context import configure_shuffle
    from .num import sql_round

    configure_shuffle(8)

    out_schema = pa.schema(
        [pa.field("vec_id", pa.int64()), pa.field("mse", pa.float64())]
    )

    def quantize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        mx = np.maximum.reduceat(np.abs(flat), offsets[:-1])
        mx = np.where(lens > 0, mx, 0.0)
        mx_f = np.repeat(mx, lens)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = flat * 127.0 / mx_f
            # DuckDB round(): half away from zero (numpy rounds half even)
            q = np.trunc(v + np.copysign(0.5, v))
            err = flat - q * mx_f / 127.0
        err = np.where(mx_f == 0, 0.0, err)
        sq = err * err
        mse = np.add.reduceat(sq, offsets[:-1]) / np.maximum(lens, 1)
        mse = np.where(lens > 0, mse, 0.0)
        return pa.table(
            {"vec_id": t["vec_id"], "mse": sql_round(pa.array(mse), 12)},
            schema=out_schema,
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(quantize, batch_format="pyarrow")


def label_cohesion(sf_dir: str, n_parts: int = 8) -> ray.data.Dataset:
    """Per-label embedding cohesion: mean pairwise cosine similarity
    within each label — the cluster-quality audit run before using
    labels as dedup/retrieval strata. The quadratic pair sum collapses
    algebraically: Σ_{i<j} x̂ᵢ·x̂ⱼ = (‖Σx̂‖² − n)/2, so each batch ships
    only (label, count, Σx̂ vector) partials and NO pair is ever
    materialized — O(labels × dim) exchange at any corpus size."""
    from ..context import configure_shuffle, join_partitions
    from .num import sql_round

    configure_shuffle(8)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    part_schema = pa.schema(
        [
            pa.field("label", pa.int32()),
            pa.field("n", pa.int64()),
            pa.field("svec", pa.list_(pa.float64())),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        dim = int(lens.max()) if len(lens) else 0
        x = flat.reshape(-1, dim)  # fixed-dim corpus (validated by lens)
        if not (lens == dim).all():
            raise ValueError("label_cohesion requires fixed-dim embeddings")
        norms = np.sqrt((x * x).sum(axis=1))
        xhat = np.divide(
            x, norms[:, None], out=np.zeros_like(x), where=norms[:, None] > 0
        )
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(lab, return_inverse=True)
        svec = np.zeros((len(keys), dim))
        np.add.at(svec, inv, xhat)
        return pa.table(
            {
                "label": pa.array(keys.astype(np.int32)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "svec": pa.array(list(svec), pa.list_(pa.float64())),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("label", pa.int32()),
            pa.field("n", pa.int64()),
            pa.field("mean_cosine", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        rows = []
        for lab, g in df.groupby("label"):
            n = int(g["n"].sum())
            s = np.sum(np.stack(g["svec"].to_numpy()), axis=0)
            pairs = n * (n - 1) / 2
            mean_cos = ((s @ s) - n) / 2 / pairs if pairs > 0 else 0.0
            rows.append((lab, n, mean_cos))
        rows.sort()
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int32()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "mean_cosine": sql_round(
                    pa.array([r[2] for r in rows], pa.float64()), 6
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(n_parts), keys=["label"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def lang_embedding_norms(sf_dir: str) -> ray.data.Dataset:
    """Cross-table enrichment: per-LANGUAGE mean embedding norm — the
    embeddings fact keyed by an attribute that lives in the documents
    table (vec_id aligns with doc_id). The documents side broadcasts
    ONCE as a (doc_id → lang) map (dimension-sized relative to the
    vector fact at scale: ids+codes only, no text) and probes
    vectorized inside each batch; the norm kernel is the same zero-copy
    offset-segmented reduceat as :func:`embedding_norms`."""
    import ray

    from ..context import configure_shuffle
    from .num import sql_round

    configure_shuffle(8)

    import pyarrow.compute as pc

    lang_t = pa.concat_tables(
        [
            ray.get(r)
            for r in ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
            ).to_arrow_refs()
            if ray.get(r).num_rows
        ]
    ).combine_chunks()
    lang_ref = ray.put(lang_t)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    part_schema = pa.schema(
        [
            pa.field("lang", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("s_norm", pa.float64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        lt = ray.get(lang_ref)
        idx = pc.index_in(
            t["vec_id"].combine_chunks(), value_set=lt["doc_id"].combine_chunks()
        ).to_numpy(zero_copy_only=False)
        langs = lt["lang"].to_numpy(zero_copy_only=False).astype(object)[idx]
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        norms = np.sqrt(np.add.reduceat(flat * flat, offsets[:-1]))
        norms = np.where(np.diff(offsets) > 0, norms, 0.0)
        keys, inv = np.unique(langs, return_inverse=True)
        return pa.table(
            {
                "lang": pa.array(keys, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s_norm": pa.array(np.bincount(inv, weights=norms)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    out_schema = pa.schema(
        [
            pa.field("lang", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("mean_norm", pa.float64()),
        ]
    )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s_norm", alias_name="s_norm"))
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n": t["n"].cast(pa.int64()),
                    "mean_norm": sql_round(
                        pa.array(
                            t["s_norm"].to_numpy(zero_copy_only=False)
                            / t["n"].to_numpy(zero_copy_only=False)
                        ),
                        6,
                    ),
                },
                schema=out_schema,
            ),
            batch_format="pyarrow",
        )
    )
