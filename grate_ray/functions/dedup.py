"""Deduplication operators for training-data pipelines.

All Ray-Data-first and driver-free: every stage is a vectorized
``map_batches`` kernel, every wide step is a hash shuffle
(``groupby``/``repartition(keys=...)``/``join``) — nothing ever calls
``to_pandas()`` on an O(corpus) relation. The keyed-LWW exact dedup of
the CDC core (stages/merge.py) is the reference's implicit dedup
(SURVEY.md §2.7); the operators here are the *content* dedup family a
100 TB text pipeline needs:

- exact: one keyed shuffle on the content, vectorized per-block min
- n-gram Jaccard: key-colocated gram buckets → pairs + df cap + sizes in
  one pass, exact Jaccard via joins (fully SQL-mirrorable)
- MinHash-LSH: vectorized banded signatures → bucket pairs → exact
  verify via gram joins (md5-based hashing, fully SQL-mirrorable)
- SimHash: vectorized 64-bit signatures, banded blocking, Hamming verify
  (md5-based hashing, fully SQL-mirrorable)

The per-batch trigram/signature kernels are batch-vectorized: Arrow
``split_pattern`` + offset arithmetic for shingles, one md5 per *unique*
token (C-speed), ``np.minimum.reduceat`` / ``np.add.reduceat`` for the
per-doc reductions — no per-document Python in the hot path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_U64 = np.uint64
MERSENNE61 = (1 << 61) - 1
FNV_PRIME = 1099511628211


def _md5_lower64(values: np.ndarray) -> np.ndarray:
    """Low 8 md5 bytes, little-endian, per string — bit-identical to
    DuckDB's md5_number_lower(), which is what makes every operator in
    this module SQL-mirrorable. One digest per *unique* value only."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per identical text: ONE keyed hash shuffle on
    the content itself (no collision handling needed), then a vectorized
    per-block min — group cardinality ≈ distinct documents, which is
    exactly the regime where Ray's HashAggregate degrades (see
    ``grouped_reduce``), so the reduction is factorize + minimum.reduceat
    per co-located block instead."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    def block_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), text_col: pa.array([], pa.string())}
            )
        codes, uniques = pd.factorize(t[text_col].to_pandas())
        uniques = np.asarray(uniques, dtype=object)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        change = np.empty(len(sc), dtype=bool)
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(change)
        mins = np.minimum.reduceat(ids[order], starts)
        # factorize codes nulls as -1 (one run, sorted first): emit a NULL
        # text group — matching SQL's PARTITION BY text, which keeps NULLs
        # as one partition with NULL text
        gc = sc[starts]
        if len(uniques) == 0:  # all-null block: one NULL group
            texts = np.array([None], dtype=object)
        else:
            texts = np.where(gc >= 0, uniques[np.maximum(gc, 0)], None)
        return pa.table(
            {
                id_col: pa.array(mins),
                text_col: pa.array(texts, pa.string()),
            }
        )

    return ds.repartition(join_partitions(64), keys=[text_col]).map_batches(
        block_min, batch_format="pyarrow", batch_size=None
    )


# --- word n-grams (vectorized) -----------------------------------------------


def _within_run_ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-run)."""
    base = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(int(counts.sum()), dtype=np.int64) - base


def explode_trigrams(
    t: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_counts: bool = False,
) -> pa.Table:
    """(doc_id, gram) rows — DISTINCT word-3-grams per doc, fully
    vectorized: Arrow split_pattern → flat word array + offsets → window
    takes + binary_join. Docs with <3 words produce no grams (mirrors the
    SQL oracle's range()). Output rows stay doc-contiguous (the signature
    kernels rely on that for their reduceat).

    ``with_counts`` adds an ``n`` column = the doc's distinct-gram count
    on every row. Each doc's grams are batch-local, so the size relation
    costs NOTHING extra — downstream verifies read |A|,|B| off the joined
    rows instead of paying a shuffle + two joins to attach them."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    ng = np.maximum(counts - 2, 0)
    tot = int(ng.sum())
    schema_cols = {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string())}
    if with_counts:
        schema_cols["n"] = pa.array([], pa.int64())
    if tot == 0:
        return pa.table(schema_cols)
    word_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    starts = np.repeat(word_starts, ng) + _within_run_ranges(ng)
    w0 = flat.take(pa.array(starts))
    w1 = flat.take(pa.array(starts + 1))
    w2 = flat.take(pa.array(starts + 2))
    gram = pc.binary_join_element_wise(w0, w1, w2, " ")
    doc = np.repeat(
        t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), ng
    )
    # distinct (doc, gram), order-preserving → stays doc-contiguous
    df = pd.DataFrame({"doc_id": doc, "gram": gram.to_pandas()}).drop_duplicates()
    out = {
        "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
        "gram": pa.array(df["gram"].to_numpy(), pa.string()),
    }
    if with_counts:
        d = df["doc_id"].to_numpy()
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        change[1:] = d[1:] != d[:-1]
        rs = np.flatnonzero(change)
        rl = np.diff(np.append(rs, len(d)))
        out["n"] = pa.array(np.repeat(rl, rl).astype(np.int64))
    return pa.table(out)


def _pairs_from_runs(
    run_starts: np.ndarray,
    run_lens: np.ndarray,
    docs: np.ndarray,
    cap: int,
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered pairs within each run of ``docs`` (runs = co-grouped
    key blocks), dropping runs longer than ``cap``. Vectorized per
    distinct run size (≤ cap distinct sizes): one triu_indices take per
    size class, never a per-run Python loop."""
    keep = (run_lens >= 2) & (run_lens <= cap)
    starts, lens = run_starts[keep], run_lens[keep]
    a_out, b_out = [], []
    for s in np.unique(lens):
        st = starts[lens == s]
        idx = st[:, None] + np.arange(s)[None, :]
        d = docs[idx]  # (m, s)
        ii, jj = np.triu_indices(int(s), 1)
        x = d[:, ii].ravel()
        y = d[:, jj].ravel()
        a_out.append(np.minimum(x, y))
        b_out.append(np.maximum(x, y))
    if not a_out:
        z = np.array([], dtype=np.int64)
        return z, z
    return np.concatenate(a_out), np.concatenate(b_out)


def _runs_of(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(order, run_starts, run_lens) grouping equal codes contiguously."""
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    change = np.empty(len(sc), dtype=bool)
    if len(sc):
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, len(sc)))
    return order, starts, lens


def grouped_reduce(
    ds: ray.data.Dataset,
    key_cols: list[str],
    nparts: int,
    val_col: str | None = None,
    out_col: str = "n",
    reduce: str = "sum",
) -> ray.data.Dataset:
    """count/sum/min per key over int64 key columns: ONE keyed
    repartition + a vectorized lexsort/reduceat reduction per block.

    Replaces ``groupby(keys).aggregate(...)`` in the pair-counting hot
    paths: Ray's HashAggregate costs seconds per 100k rows at
    million-group cardinality (measured 84s remote wall on the ngram
    pair count at sf0.1), while the reduceat reduction is memory-speed.
    Exact because the repartition co-locates every row of a key."""

    def reduce_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field(c, pa.int64()) for c in key_cols]
            + [pa.field(out_col, pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        keys = [
            t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in key_cols
        ]
        order = np.lexsort(keys[::-1])
        sorted_keys = [k[order] for k in keys]
        change = np.zeros(len(order), dtype=bool)
        change[0] = True
        for k in sorted_keys:
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        if val_col is None:
            vals = np.diff(np.append(starts, len(order)))  # count
        else:
            v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            if reduce == "min":
                vals = np.minimum.reduceat(v, starts)
            else:
                vals = np.add.reduceat(v, starts)
        cols = {c: pa.array(k[starts]) for c, k in zip(key_cols, sorted_keys)}
        cols[out_col] = pa.array(vals)
        return pa.table(cols, schema=schema)

    return ds.repartition(nparts, keys=key_cols).map_batches(
        reduce_block, batch_format="pyarrow", batch_size=None
    )


_PAIR_SIZE_SCHEMA = pa.schema(
    [pa.field("a", pa.int64()), pa.field("b", pa.int64()), pa.field("kind", pa.int8())]
)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 25,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """Near-dup pairs by EXACT word-3-gram Jaccard
    |A∩B| / (|A|+|B|-|A∩B|), candidates via a key-colocated inverted
    index. Output: (a, b, jaccard), a < b, jaccard ≥ threshold.

    Scale shape (no driver-side state, unlike a naive inverted index):
      1. explode distinct (doc_id, gram) — vectorized;
      2. ONE hash shuffle co-locating each gram (`repartition(keys)`);
         inside each bucket block, per-gram document-frequency, the
         ``df_cap`` hot-gram drop, per-doc kept-gram size partials AND
         all candidate pairs are computed in one vectorized pass;
      3. pair multiplicity = |A∩B| via a hash aggregate;
      4. |A|,|B| attached by JOINING the sizes relation (not a broadcast
         dict — gram/doc cardinality is unbounded at 100 TB).

    ``df_cap``: grams appearing in more than this many docs are dropped
    BEFORE pairing (the standard document-frequency cap — ubiquitous
    shingles are non-discriminative and make the pair explosion
    quadratic). Jaccard is then over the capped gram sets; the SQL
    oracle applies the identical cap, so results still match exactly.
    """
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    nbuckets = join_partitions(64)
    grams = ds.map_batches(
        lambda t: explode_trigrams(t, text_col, id_col), batch_format="pyarrow"
    )

    def bucket_pass(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SIZE_SCHEMA.empty_table()
        codes = pc.dictionary_encode(t["gram"].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        order, starts, lens = _runs_of(codes)
        docs_sorted = docs[order]
        # kept grams (df ≤ cap): size partials per doc
        kept_rows = np.repeat(lens <= df_cap, lens)
        kept_docs = docs_sorted[kept_rows]
        u_docs, u_counts = np.unique(kept_docs, return_counts=True)
        # candidate pairs within kept runs of size ≥ 2
        a, b = _pairs_from_runs(starts, lens, docs_sorted, df_cap)
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, u_docs]).astype(np.int64)),
                "b": pa.array(np.concatenate([b, u_counts]).astype(np.int64)),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), np.int8), np.ones(len(u_docs), np.int8)]
                    )
                ),
            },
            schema=_PAIR_SIZE_SCHEMA,
        )

    unified = (
        grams.repartition(nbuckets, keys=["gram"])
        .map_batches(bucket_pass, batch_format="pyarrow", batch_size=None)
        .materialize()  # branched below; bounded by candidate volume
    )

    def only(kind: int, names: list[str]):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {n: pa.array([], pa.int64()) for n in names}
                )
            t = t.filter(pc.equal(t["kind"], kind))
            return pa.table({n: t[c] for n, c in zip(names, ["a", "b"])})

        return f

    npart = join_partitions(32)
    pairs = unified.map_batches(only(0, ["a", "b"]), batch_format="pyarrow")
    inter = grouped_reduce(pairs, ["a", "b"], npart, out_col="n_shared")
    sizes = grouped_reduce(
        unified.map_batches(only(1, ["doc_id", "n_part"]), batch_format="pyarrow"),
        ["doc_id"], npart, val_col="n_part", out_col="n",
    )
    return _jaccard_from_counts(inter, sizes, threshold, npart, metric=metric)


def _jaccard_from_counts(
    inter: ray.data.Dataset,
    sizes: ray.data.Dataset,
    threshold: float,
    npart: int,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """(a, b, n_shared) ⋈ sizes(a) ⋈ sizes(b) → exact similarity ≥
    threshold. ``metric``: "jaccard" (|A∩B|/|A∪B|) or "containment"
    (|A∩B|/min(|A|,|B|) — the asymmetric-overlap detector: a truncated
    or quoted-in-full copy scores ~1.0 where its Jaccard collapses).
    Sizes are attached by distributed hash JOIN — at 100 TB the per-doc
    size relation has billions of rows and must never become a driver
    dict."""

    def rename(names: list[str]):
        return lambda t: t.rename_columns(names)

    from ..context import nonempty_blocks

    # sparse keyed reduces emit schema-less empty blocks (Ray 2.49) that
    # crash the join aggregator; both relations are candidate-bounded
    inter = nonempty_blocks(inter)
    sizes = nonempty_blocks(sizes)
    sa = sizes.map_batches(rename(["a", "na"]), batch_format="pyarrow")
    sb = sizes.map_batches(rename(["b", "nb"]), batch_format="pyarrow")
    j = inter.join(sa, join_type="inner", num_partitions=npart, on=("a",))
    # the join itself emits schema-less blocks for its empty partitions
    j = nonempty_blocks(j)
    j = j.join(sb, join_type="inner", num_partitions=npart, on=("b",))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    metric: pa.array([], pa.float64()),
                }
            )
        inter_n = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        if metric == "containment":
            sim = inter_n / np.maximum(np.minimum(na, nb), 1)
        else:
            sim = inter_n / np.maximum(na + nb - inter_n, 1)
        out = pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                metric: pa.array(sim.astype(np.float64)),
            }
        )
        return out.filter(pc.greater_equal(out[metric], threshold))

    return j.map_batches(verify, batch_format="pyarrow")


# --- MinHash + LSH -----------------------------------------------------------


def minhash_coeffs(k: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Seeded permutation coefficients — exposed so the SQL oracle embeds
    the identical literals."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=k, dtype=np.uint64)
    b = rng.integers(0, MERSENNE61, size=k, dtype=np.uint64)
    return a, b


class MinHasher:
    """k-permutation MinHash over md5-hashed distinct word-3-grams;
    seeded, deterministic, batch-vectorized. Stateful stage: coefficients
    built once per actor/task; per batch the permutation matrix is
    computed over every (doc, gram) row at once and reduced per doc with
    ``np.minimum.reduceat`` — no per-document Python.

    Consumes either raw documents (text_col present) or a pre-exploded
    (doc_id, gram[, n]) relation — the latter lets ``minhash_lsh_pairs``
    share ONE gram pass between signatures and the verify join. Gram
    input relies on explode_trigrams' contract: a doc's gram rows are
    contiguous within one block and never straddle blocks (each doc row
    lives in exactly one upstream batch).

    Arithmetic contract (mirrored literally in the SQL oracle):
    ``((a * h) mod 2^64 + b) mod 2^64 mod (2^61 - 1)`` with h =
    md5_number_lower(gram); docs with no grams get the sentinel 2^61-1
    in every slot (gram input simply omits them — their all-sentinel
    signatures can only inhabit the degenerate sentinel bucket, whose
    pairs carry no grams and die at the verify join)."""

    def __init__(self, k: int = 64, seed: int = 7, text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = minhash_coeffs(k, seed)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if "gram" in t.column_names:  # pre-exploded relation
            grams = t
            ids = None
        else:
            ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            grams = explode_trigrams(t, self.text_col, self.id_col)
        if not grams.num_rows:
            n = 0 if ids is None else len(ids)
            sigs = np.full((n, self.k), MERSENNE61, dtype=np.uint64)
            return self._table(
                np.array([], np.int64) if ids is None else ids, sigs
            )
        gdoc = grams["doc_id"].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(grams["gram"].to_pandas())
        hu = _md5_lower64(uniques.to_numpy())
        h = hu[codes]  # (nnz,) uint64, doc-contiguous
        # (k, nnz): wrapping mod-2^64 mul/add, then mod Mersenne
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _U64(MERSENNE61)
        # doc run boundaries (explode output is doc-contiguous)
        change = np.empty(len(gdoc), dtype=bool)
        change[0] = True
        change[1:] = gdoc[1:] != gdoc[:-1]
        starts = np.flatnonzero(change)
        mins = np.minimum.reduceat(vals, starts, axis=1).T  # (ndocs_with, k)
        docs_with = gdoc[starts]
        if ids is None:
            return self._table(docs_with.astype(np.int64), mins)
        sigs = np.full((len(ids), self.k), MERSENNE61, dtype=np.uint64)
        pos = {d: i for i, d in enumerate(ids)}
        rows = np.array([pos[d] for d in docs_with], dtype=np.int64)
        sigs[rows, :] = mins
        return self._table(ids, sigs)

    def _table(self, ids: np.ndarray, sigs: np.ndarray) -> pa.Table:
        flat = pa.array(np.ascontiguousarray(sigs).reshape(-1).view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sig": pa.FixedSizeListArray.from_arrays(flat, self.k),
            }
        )


def band_hashes(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, bands) FNV-style fold of each band's rows, wrapping uint64 —
    mirrored literally in the SQL oracle."""
    n = sig.shape[0]
    out = np.empty((n, bands), dtype=np.uint64)
    s = sig.astype(np.uint64)
    for b in range(bands):
        hh = np.zeros(n, dtype=np.uint64)
        for c in range(rows_per_band):
            hh = hh * _U64(FNV_PRIME) + s[:, b * rows_per_band + c]
        out[:, b] = hh
    return out


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 50,
) -> ray.data.Dataset:
    """MinHash signatures → banded LSH buckets → candidate pairs → exact
    Jaccard verify. rows = (a, b, jaccard), a < b, jaccard ≥ threshold.

    Fully distributed: buckets are key-colocated with ONE hash shuffle
    and paired vectorized; candidates are verified by joining back to the
    (doc_id, gram) relation twice and counting the intersection with a
    hash aggregate — the corpus is never materialized on the driver.

    ``bucket_cap``: band values shared by more than this many docs are
    dropped before pairing (degenerate buckets — e.g. the all-sentinel
    signature of gramless docs — are non-discriminative and would make
    the pairing quadratic). The SQL oracle applies the identical cap.
    """
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    rows_per_band = k // bands

    # ONE corpus gram pass, shared by the signature stage and the verify
    # joins (previously each exploded trigrams separately — a full extra
    # pass of the corpus through split/dedup). At sf0.1 wall-time is flat
    # (~18s A/B both ways: fixed per-wide-op scheduling dominates); the
    # saved pass pays off when the corpus, not the DAG, is the cost.
    grams = ds.map_batches(
        lambda t: explode_trigrams(t, text_col, id_col, with_counts=True),
        batch_format="pyarrow",
    ).materialize()

    # MinHasher's per-worker state (64 coefficient pairs) is trivial to
    # rebuild, so ship a pickled instance to PLAIN tasks — an actor pool
    # here only pays multi-second pool startup for no amortization (pools
    # are for expensive setup: models, compiled patterns, indexes).
    # batch_size=None: a doc's gram run never straddles a block, which the
    # per-doc reduceat relies on.
    sigs = grams.map_batches(
        MinHasher(k, 7, text_col, id_col),
        batch_format="pyarrow",
        batch_size=None,
    )

    def to_buckets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "bhash": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sc = t["sig"]
        if isinstance(sc, pa.ChunkedArray):
            sc = sc.combine_chunks()
        sig = sc.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), -1)
        bh = band_hashes(sig, bands, rows_per_band)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, bands)),
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "bhash": pa.array(bh.T.reshape(-1).view(np.int64)),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bhash = t["bhash"].to_numpy(zero_copy_only=False)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        # dense code per (band, bhash) within the block
        codes = pd.factorize(pd.MultiIndex.from_arrays([band, bhash]))[0]
        order, starts, lens = _runs_of(codes)
        a, b = _pairs_from_runs(starts, lens, docs[order], bucket_cap)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    nbuckets = join_partitions(64)
    npart = join_partitions(32)
    cand = (
        grouped_reduce(  # distinct pairs across bands
            buckets.repartition(nbuckets, keys=["band", "bhash"]).map_batches(
                bucket_pairs, batch_format="pyarrow", batch_size=None
            ),
            ["a", "b"], npart, out_col="_m",
        )
        .map_batches(lambda t: t.drop_columns(["_m"]), batch_format="pyarrow")
        # split the DAG here: one streaming execution holding the actor
        # pool + repartition + groupby AND the 4 verify joins below
        # deadlocks the scheduler at 8 CPUs (every prefix runs fine);
        # candidates are tiny (the LSH's whole point), so this is cheap
        .materialize()
    )

    # exact verify: candidates ⋈ gram relation (a side) ⋈ (b side), sizes
    # riding along on the gram rows (with_counts) — candidates only, all
    # distributed, and the whole tail is 2 joins + 1 keyed reduce over the
    # SAME materialized gram relation the signatures came from
    from ..context import nonempty_blocks

    cand = nonempty_blocks(cand)
    grams = nonempty_blocks(grams)
    ga = grams.map_batches(
        lambda t: t.rename_columns(["a", "gram", "na"]), batch_format="pyarrow"
    )
    gb = grams.map_batches(
        lambda t: t.rename_columns(["b", "gram", "nb"]), batch_format="pyarrow"
    )
    j1 = cand.join(ga, join_type="inner", num_partitions=npart, on=("a",))
    j1 = nonempty_blocks(j1)  # join emits schema-less empty-partition blocks
    j2 = j1.join(gb, join_type="inner", num_partitions=npart, on=("b", "gram"))

    def pair_reduce(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        change = np.zeros(len(a), dtype=bool)
        change[0] = True
        change[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(change)
        ns = np.diff(np.append(starts, len(a)))  # |A ∩ B|
        jac = ns / np.maximum(na[starts] + nb[starts] - ns, 1)
        out = pa.table(
            {
                "a": pa.array(a[starts]),
                "b": pa.array(b[starts]),
                "jaccard": pa.array(jac.astype(np.float64)),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j2.repartition(npart, keys=["a", "b"]).map_batches(
        pair_reduce, batch_format="pyarrow", batch_size=None
    )


# --- SimHash -----------------------------------------------------------------


def simhash64(texts: list[str] | pa.Array, seed: int = 11) -> np.ndarray:
    """64-bit SimHash over word unigrams (md5-hashed, bit-vote),
    batch-vectorized: one md5 per unique word, per-doc votes via
    ``np.add.reduceat`` over a (words × 64) sign matrix. Empty docs get
    signature 0. Hash = md5_number_lower(str(seed) || word) — mirrored
    in the SQL oracle."""
    arr = pa.array(texts, pa.string()) if isinstance(texts, list) else texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    words = pc.split_pattern(pc.fill_null(arr, ""), pattern=" ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat) == 0:
        return out
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n), counts)[nonempty]
    kept = flat.filter(pa.array(nonempty))
    if len(kept) == 0:
        return out
    codes, uniques = pd.factorize(kept.to_pandas())
    hu = _md5_lower64([str(seed) + u for u in uniques.to_numpy()])
    h = hu[codes]  # (nw,), grouped by doc (doc_of_word is nondecreasing)
    bits = np.arange(64, dtype=np.uint64)
    signs = (((h[:, None] >> bits[None, :]) & _U64(1)).astype(np.int64) * 2 - 1)
    change = np.empty(len(doc_of_word), dtype=bool)
    change[0] = True
    change[1:] = doc_of_word[1:] != doc_of_word[:-1]
    starts = np.flatnonzero(change)
    votes = np.add.reduceat(signs, starts, axis=0)  # (ndocs_with, 64)
    sigs = ((votes > 0).astype(np.uint64) << bits[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[doc_of_word[starts]] = sigs
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (no numpy>=2 required)."""
    bytes_ = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_, axis=1).sum(axis=1).astype(np.int64)


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 200,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: 4-band 16-bit blocking (any identical
    band → candidate; exact recall for hamming ≤ 3 by pigeonhole),
    key-colocated bucket pairing, exact vectorized Hamming verify ≤
    ``max_hamming``. Output: (a, b, ham) distinct pairs.

    ``bucket_cap``: band values shared by more than this many docs are
    dropped before pairing — a degenerate band value (low-entropy corpus)
    is non-discriminative and would make the pairing quadratic. Skipped
    buckets trade recall for boundedness; they are the SimHash analogue
    of the n-gram df cap, and the SQL oracle applies the identical cap."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    def add_sig(t: pa.Table) -> pa.Table:
        sig = simhash64(t[text_col])
        return pa.table(
            {"doc_id": t[id_col], "sig": pa.array(sig.view(np.int64))}
        )

    sigs = ds.map_batches(add_sig, batch_format="pyarrow")

    def to_bands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "bval": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = t["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        out_i, out_b, out_v, out_s = [], [], [], []
        for b in range(4):
            out_i.append(ids)
            out_b.append(np.full(len(ids), b, dtype=np.int32))
            out_v.append(((sig >> _U64(16 * b)) & _U64(0xFFFF)).view(np.int64))
            out_s.append(sig.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_i)),
                "sig": pa.array(np.concatenate(out_s)),
                "band": pa.array(np.concatenate(out_b)),
                "bval": pa.array(np.concatenate(out_v)),
            }
        )

    bands_ds = sigs.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "sa": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bval = t["bval"].to_numpy(zero_copy_only=False)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = t["sig"].to_numpy(zero_copy_only=False)
        codes = pd.factorize(pd.MultiIndex.from_arrays([band, bval]))[0]
        order, starts, lens = _runs_of(codes)
        ds_, ss_ = docs[order], sig[order]
        # pair (doc, sig) jointly: order pairs by doc id value
        keep = (lens >= 2) & (lens <= bucket_cap)
        st, ln = starts[keep], lens[keep]
        a_o, b_o, sa_o, sb_o = [], [], [], []
        for s in np.unique(ln):
            sel = st[ln == s]
            idx = sel[:, None] + np.arange(s)[None, :]
            d, g = ds_[idx], ss_[idx]
            ii, jj = np.triu_indices(int(s), 1)
            x, y = d[:, ii].ravel(), d[:, jj].ravel()
            gx, gy = g[:, ii].ravel(), g[:, jj].ravel()
            swap = x > y
            a_o.append(np.where(swap, y, x))
            b_o.append(np.where(swap, x, y))
            sa_o.append(np.where(swap, gy, gx))
            sb_o.append(np.where(swap, gx, gy))
        if not a_o:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_o)),
                "b": pa.array(np.concatenate(b_o)),
                "sa": pa.array(np.concatenate(sa_o)),
                "sb": pa.array(np.concatenate(sb_o)),
            }
        )

    nbuckets = join_partitions(64)
    paired = bands_ds.repartition(nbuckets, keys=["band", "bval"]).map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "ham": pa.array([], pa.int64()),
                }
            )
        sa = t["sa"].to_numpy(zero_copy_only=False).view(np.uint64)
        sb = t["sb"].to_numpy(zero_copy_only=False).view(np.uint64)
        ham = _popcount64(sa ^ sb)
        out = pa.table({"a": t["a"], "b": t["b"], "ham": pa.array(ham)})
        return out.filter(pc.less_equal(out["ham"], max_hamming))

    return grouped_reduce(  # distinct pairs (ham identical per pair)
        paired.map_batches(verify, batch_format="pyarrow"),
        ["a", "b"], join_partitions(32), val_col="ham", reduce="min",
        out_col="ham",
    )


# --- connected components (near-dup cluster resolution) ----------------------


def connected_components(
    pairs: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    npart: int | None = None,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Resolve a near-dup *pair* relation into clusters: distributed
    min-label propagation until fixpoint, emitting one ``(doc_id,
    cluster_id)`` row per node of the pair graph, where ``cluster_id``
    is the smallest doc_id in the node's connected component.

    This is the tail every real dedup pipeline needs after
    ``minhash_lsh_pairs``/``simhash_pairs``: pairs alone over-drop
    (naively dropping every ``b`` side can delete BOTH members of a
    transitive chain a-b, b-c) — the cluster view keeps exactly one
    canonical doc per component.

    Scale notes: the pair relation is orders of magnitude smaller than
    the corpus by LSH construction (bucket caps bound candidate fanout),
    so each iteration — one hash join (labels onto edges) + one keyed
    min-reduce — moves only O(edges) rows. Labels decrease monotonically,
    so the label SUM is a convergence certificate costing one cheap
    aggregate over the just-materialized labels; iterations are bounded
    by the component diameter (near-dup clusters are near-cliques in
    practice, so 2-4 rounds). The reference's dedup is single-pass LWW
    (no transitive closure); this operator is part of the LLM-prep
    extension surface.
    """
    from ..context import join_partitions, nonempty_blocks

    npart = npart or join_partitions(32)

    def to_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [pa.field("u", pa.int64()), pa.field("v", pa.int64())]
            ).empty_table()
        a = pc.cast(t[a_col], pa.int64())
        b = pc.cast(t[b_col], pa.int64())
        return pa.concat_tables(
            [pa.table({"u": a, "v": b}), pa.table({"u": b, "v": a})]
        ).combine_chunks()

    # both directions once, pinned: re-read every iteration (empty-block
    # drop: the pair relation is often far sparser than its block count)
    edges = nonempty_blocks(pairs.map_batches(to_edges, batch_format="pyarrow"))

    # init: lbl(u) = min(u, min neighbor) — one free propagation round
    labels = grouped_reduce(
        edges, ["u"], npart, val_col="v", out_col="mn", reduce="min"
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t["u"],
                "lbl": pc.min_element_wise(
                    pc.cast(t["u"], pa.int64()), pc.cast(t["mn"], pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )
    labels = nonempty_blocks(labels)

    def as_u(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["node"], "lbl": t["lbl"]})

    def as_msgs(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pc.cast(t["v"], pa.int64()), "lbl": pc.cast(t["lbl"], pa.int64())}
        )

    prev_sum = labels.sum("lbl") or 0
    for _ in range(max_iters):
        lab_u = labels.map_batches(as_u, batch_format="pyarrow")
        msgs = edges.join(
            lab_u, join_type="inner", num_partitions=npart, on=("u",)
        ).map_batches(as_msgs, batch_format="pyarrow")
        labels = nonempty_blocks(
            grouped_reduce(
                msgs.union(labels), ["node"], npart,
                val_col="lbl", out_col="lbl", reduce="min",
            )
        )
        new_sum = labels.sum("lbl") or 0
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.cast(pc.equal(t["node"], t["lbl"]), pa.int64())
        return pa.table(
            {"doc_id": t["node"], "cluster_id": t["lbl"], "keep": keep}
        )

    return labels.map_batches(finish, batch_format="pyarrow")


# --- benchmark decontamination ----------------------------------------------


def decontaminate(
    train: ray.data.Dataset,
    bench: ray.data.Dataset,
    min_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag training docs whose word-3-gram
    sets collide with an eval/benchmark corpus — the overlap-removal pass
    every serious training-data pipeline runs before the tokenizer.

    The bench side is SMALL by definition (eval sets are thousands of
    docs vs billions of training docs), so its distinct gram set is the
    canonical broadcast-small-side case: collected once, ``ray.put``
    once, probed inside every train batch with Arrow ``is_in`` (C++ hash
    probe on the raw strings — no hash-collision caveat to mirror in
    SQL). The train corpus streams: one vectorized gram+probe pass, no
    shuffle at all.

    Emits one row per train doc: (doc_id, n_grams, n_hits, contaminated)
    where contaminated = n_hits >= min_hits. Zero-gram docs (<3 words)
    are emitted with zeros.
    """

    def bench_grams(t: pa.Table) -> pa.Table:
        g = explode_trigrams(t, text_col, id_col)
        return pa.table({"gram": pc.unique(g["gram"].combine_chunks())})

    parts = [
        b["gram"].combine_chunks()
        for b in bench.map_batches(bench_grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    gram_set = (
        pa.concat_arrays(parts).unique() if parts else pa.array([], pa.string())
    )
    ref = ray.put(gram_set)

    def mark(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        schema = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("n_grams", pa.int64()),
                pa.field("n_hits", pa.int64()),
                pa.field("contaminated", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        g = explode_trigrams(t, text_col, id_col)
        n_grams = np.zeros(t.num_rows, dtype=np.int64)
        n_hits = np.zeros(t.num_rows, dtype=np.int64)
        if g.num_rows:
            hit = (
                pc.is_in(g["gram"], value_set=ray.get(ref))
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            doc = g["doc_id"].to_numpy(zero_copy_only=False)
            change = np.empty(len(doc), dtype=bool)
            change[0] = True
            change[1:] = doc[1:] != doc[:-1]
            rs = np.flatnonzero(change)
            rl = np.diff(np.append(rs, len(doc)))
            # map gram runs (doc-contiguous) back to batch row positions
            id_np = ids.to_numpy(zero_copy_only=False)
            pos = {int(v): i for i, v in enumerate(id_np)}
            rows = np.fromiter(
                (pos[int(d)] for d in doc[rs]), dtype=np.int64, count=len(rs)
            )
            n_grams[rows] = rl
            n_hits[rows] = np.add.reduceat(hit, rs)
        return pa.table(
            {
                "doc_id": ids,
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(
                    (n_hits >= min_hits).astype(np.int64)
                ),
            },
            schema=schema,
        )

    return train.map_batches(mark, batch_format="pyarrow")


# --- exact substring-span dedup ---------------------------------------------


def explode_word_ngrams(
    t: pa.Table, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(doc_id, gram) rows — DISTINCT word-n-grams per doc for arbitrary
    n; same vectorized window-take construction as ``explode_trigrams``
    (which stays the tuned n=3 fast path for the minhash/jaccard family).
    Docs with <n words emit nothing; output stays doc-contiguous."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    ng = np.maximum(counts - (n - 1), 0)
    if int(ng.sum()) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string())}
        )
    word_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    starts = np.repeat(word_starts, ng) + _within_run_ranges(ng)
    parts = [flat.take(pa.array(starts + j)) for j in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    doc = np.repeat(t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), ng)
    df = pd.DataFrame({"doc_id": doc, "gram": gram.to_pandas()}).drop_duplicates()
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "gram": pa.array(df["gram"].to_numpy(), pa.string()),
        }
    )


def substring_dedup(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact substring-span dedup (the "Deduplicating Training Data
    Makes Language Models Better" signal, word-window recast): a doc is
    span-contaminated if ANY of its n-word windows also occurs in a doc
    with a smaller doc_id (keep-first convention shared by the whole
    dedup family). Emits one row per doc with ≥1 span:

        (doc_id, n_spans, n_dup_spans, flagged)

    Scale shape: the span relation is ~token-count rows — the honest
    cost of substring-level dedup (a distributed suffix array pays the
    same) — and makes exactly TWO keyed hops: by gram (per-gram min
    doc_id via factorize + minimum.reduceat on the co-located block,
    each row slimmed to one dup bit), then by doc (count + sum
    reduceat). No all-pairs, no driver state."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    spans = ds.map_batches(
        lambda t: explode_word_ngrams(t, n, text_col, id_col),
        batch_format="pyarrow",
    )

    def mark_dup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "dup": pa.array([], pa.int64())}
            )
        codes, _ = pd.factorize(t["gram"].to_pandas())
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        change = np.empty(len(sc), dtype=bool)
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(change)
        mins = np.minimum.reduceat(doc[order], starts)
        min_by_code = np.empty(len(starts), dtype=np.int64)
        min_by_code[...] = mins
        dup = (doc > min_by_code[codes]).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc), "dup": pa.array(dup)})

    def per_doc(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_spans": pa.array([], pa.int64()),
                "n_dup_spans": pa.array([], pa.int64()),
                "flagged": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        dup = t["dup"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        d = doc[order]
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        change[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(change)
        n_spans = np.diff(np.append(starts, len(d))).astype(np.int64)
        n_dup = np.add.reduceat(dup[order], starts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "n_spans": pa.array(n_spans),
                "n_dup_spans": pa.array(n_dup),
                "flagged": pa.array((n_dup > 0).astype(np.int64)),
            }
        )

    p = join_partitions(64)
    return (
        spans.repartition(p, keys=["gram"])
        .map_batches(mark_dup, batch_format="pyarrow", batch_size=None)
        .repartition(join_partitions(32), keys=["doc_id"])
        .map_batches(per_doc, batch_format="pyarrow", batch_size=None)
    )


def winnow_fingerprints(
    ds: ray.data.Dataset,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """WINNOWING document fingerprints (the MOSS local-fingerprinting
    scheme, word-gram recast): hash every positional word-k-gram, slide
    a window of ``w`` consecutive hashes, select each window's minimum
    (leftmost on ties), and emit the DISTINCT selected positions —
    a provably 2/(w+1)-density fingerprint set that two documents
    sharing any run of ≥ w+k-1 words must overlap on (the guarantee
    plain sampled shingles can't give).

    Scale shape: winnowing is per-document — ONE stateless map pass, no
    shuffle at all; the argmin-per-window is a single vectorized
    ``sliding_window_view`` over the batch's concatenated gram hashes
    with document boundaries masked. Hashes are ``fingerprint64``
    (≡ md5_number_lower), so the SQL oracle reproduces fp values
    exactly. Docs with fewer than w grams emit nothing."""
    from ..functions.text import fingerprint64

    def per_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp": pa.array([], pa.uint64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        counts = (
            pc.list_value_length(words).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = words.flatten()
        ng = np.maximum(counts - (k - 1), 0)
        if int(ng.sum()) == 0:
            return empty
        word_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        starts = np.repeat(word_starts, ng) + _within_run_ranges(ng)
        parts = [flat.take(pa.array(starts + j)) for j in range(k)]
        gram = pc.binary_join_element_wise(*parts, " ")
        fp = fingerprint64(gram).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), ng
        )
        pos = _within_run_ranges(ng)
        if len(fp) < w:
            return empty
        sw = np.lib.stride_tricks.sliding_window_view(fp, w)
        ok = doc[: len(doc) - w + 1] == doc[w - 1 :]  # window within one doc
        if not ok.any():
            return empty
        am = sw.argmin(axis=1)  # leftmost min, matches (fp asc, pos asc)
        sel = np.unique(np.flatnonzero(ok) + am[ok])
        return pa.table(
            {
                "doc_id": pa.array(doc[sel]),
                "pos": pa.array(pos[sel]),
                "fp": pa.array(fp[sel], pa.uint64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


# --- content-defined chunking (Gear / FastCDC family) ------------------------


def gear_table() -> np.ndarray:
    """Seeded 256-entry Gear byte table: md5-derived uint64 per byte value
    ('gear-<v>'), so the SQL oracle regenerates the identical literals via
    md5_number_lower('gear-' || v)."""
    return _md5_lower64(np.array([f"gear-{v}" for v in range(256)], dtype=object))


CDC_WINDOW = 32  # rolling-hash window (bytes)
CDC_SHIFT = 26  # boundary test reads bits 26..31 (mixed by all window ages)
CDC_MASK = 63  # 6 mask bits → expected chunk ≈ 64 bytes
CDC_TARGET = 17


def chunk_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Content-defined chunking dedup (the storage-dedup classic: Gear
    rolling hash with a mod-mask boundary rule, the FastCDC family):
    chunk boundaries depend only on local content, so an insertion early
    in a document shifts byte offsets but NOT downstream chunk
    boundaries — near-identical documents share most chunks, which exact
    whole-document hashing can never see.

    Rolling hash (exactly SQL-mirrorable, unlike CRC/Rabin tables):
    ``h_i = Σ_{k=0..W-1} gear[b_{i-k}] · 2^k  (mod 2^64)`` — the Gear
    recurrence ``h = (h<<1) + gear[b]`` truncated to a W-byte window so
    the hash at any position is a pure function of the last W bytes
    (stateless per position ⇒ no recursive CTE needed in the oracle).
    Boundary at i iff bits 26..31 of h_i equal CDC_TARGET (high-ish bits:
    every window age contributes). A boundary ENDS its chunk; the tail
    remainder is the final chunk.

    Distributed shape: the per-batch kernel computes every document's
    hashes in ONE vectorized pass (batch bytes concatenated with W-byte
    zero-contribution pads so windows never cross documents), md5s each
    chunk, and pre-aggregates (doc, chunk_hash, cnt). Then: chunk-hash
    owners (global min doc) via ONE keyed repartition + reduceat min;
    owners re-attached by distributed join (never a driver dict — chunk
    cardinality is O(corpus bytes / 64) at 100 TB); per-doc totals via a
    second keyed reduce. Emits (doc_id, n_chunks, n_dup) where n_dup
    counts chunk occurrences whose content already appears in a
    lower-doc_id document.
    """
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    npart = join_partitions(32)
    G = gear_table()

    def chunks_kernel(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("h", pa.int64()),
                pa.field("cnt", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t[text_col].to_pylist()
        arrs = [
            np.frombuffer((x or "").encode("utf-8"), dtype=np.uint8) for x in texts
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        pad = np.zeros(CDC_WINDOW, dtype=np.uint64)
        parts = []
        for a in arrs:
            parts.append(G[a])
            parts.append(pad)
        if not parts:
            return schema.empty_table()
        a_all = np.concatenate(parts)
        h = np.zeros(len(a_all), dtype=np.uint64)
        n = len(a_all)
        for k in range(CDC_WINDOW):
            h[k:] += a_all[: n - k] << np.uint64(k)  # uint64 wrap == mod 2^64
        bound = ((h >> np.uint64(CDC_SHIFT)) & np.uint64(CDC_MASK)) == np.uint64(
            CDC_TARGET
        )
        offs = np.concatenate([[0], np.cumsum(lens + CDC_WINDOW)])[:-1]
        out_doc, out_h = [], []
        for d in range(len(arrs)):
            L = lens[d]
            if L == 0:
                continue
            bd = bound[offs[d] : offs[d] + L]
            idx = np.flatnonzero(bd)
            starts = np.concatenate([[0], idx + 1])
            ends = np.append(idx + 1, L)
            raw = arrs[d].tobytes()
            for s, e in zip(starts, ends):
                if e <= s:  # boundary at the last byte: no tail chunk
                    continue
                dg = hashlib.md5(raw[s:e]).digest()
                out_doc.append(ids[d])
                out_h.append(int.from_bytes(dg[8:16], "little"))
        if not out_doc:
            return schema.empty_table()
        hv = np.array(out_h, dtype=np.uint64).view(np.int64)  # bit-preserving
        dv = np.array(out_doc, dtype=np.int64)
        # batch-level pre-agg: (doc, h) multiplicity
        key = np.stack([dv, hv], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq[:, 0]),
                "h": pa.array(uniq[:, 1]),
                "cnt": pa.array(cnt.astype(np.int64)),
            },
            schema=schema,
        )

    rel = ds.map_batches(chunks_kernel, batch_format="pyarrow")
    owners = grouped_reduce(
        rel.map_batches(
            lambda t: t.select(["h", "doc_id"]), batch_format="pyarrow"
        ),
        ["h"], npart, val_col="doc_id", out_col="own", reduce="min",
    )
    from ..context import nonempty_blocks

    owners = nonempty_blocks(owners)  # sparse keys < partitions at small corpora
    j = rel.join(owners, join_type="inner", num_partitions=npart, on=("h",))

    def per_doc_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "dup": pa.array([], pa.int64()),
                }
            )
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        own = t["own"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "cnt": pa.array(cnt),
                "dup": pa.array(np.where(own < doc, cnt, 0)),
            }
        )

    parts = j.map_batches(per_doc_partial, batch_format="pyarrow")

    def final_reduce(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("n_chunks", pa.int64()),
                pa.field("n_dup", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = t["dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc, kind="stable")
        ds_, cs, us = doc[order], cnt[order], dup[order]
        change = np.empty(len(ds_), dtype=bool)
        change[0] = True
        change[1:] = ds_[1:] != ds_[:-1]
        starts = np.flatnonzero(change)
        return pa.table(
            {
                "doc_id": pa.array(ds_[starts]),
                "n_chunks": pa.array(np.add.reduceat(cs, starts)),
                "n_dup": pa.array(np.add.reduceat(us, starts)),
            },
            schema=schema,
        )

    return parts.repartition(npart, keys=["doc_id"]).map_batches(
        final_reduce, batch_format="pyarrow", batch_size=None
    )


def _batched_levenshtein(
    s1: "np.ndarray", s2: "np.ndarray", max_len: int
) -> "np.ndarray":
    """Exact unit-cost Levenshtein for P string pairs AT ONCE. The
    classic row recurrence's sequential insertion term is replaced by
    the prefix-min identity D[j] = j + min_{k≤j}(rowᵢₙₛ₋ₗₑₛₛ[k] − k),
    so each of the ≤``max_len`` row steps is pure vector math across
    all pairs — no per-cell Python. O(max_len²) vector ops total,
    independent of P.

    ``s1``/``s2``: uint32 char-code arrays shaped (P, max_len), zero
    padded; actual lengths inferred from the padding sentinel 0."""
    P = s1.shape[0]
    len1 = (s1 != 0).sum(axis=1)
    len2 = (s2 != 0).sum(axis=1)
    cols = np.arange(max_len + 1)
    D = np.broadcast_to(cols, (P, max_len + 1)).astype(np.int64).copy()
    out = np.where(len1 == 0, len2, 0).astype(np.int64)
    for i in range(1, max_len + 1):
        sub_cost = (s2 != s1[:, i - 1 : i]).astype(np.int64)
        wo_ins = np.empty_like(D)
        wo_ins[:, 0] = i
        wo_ins[:, 1:] = np.minimum(D[:, 1:] + 1, D[:, :-1] + sub_cost)
        D = np.minimum.accumulate(wo_ins - cols, axis=1) + cols
        done = len1 == i
        if done.any():
            out[done] = D[done, len2[done]]
    return out


def fuzzy_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_chars: int = 16,
    head_chars: int = 200,
    max_dist: int = 50,
    bucket_cap: int = 20,
) -> ray.data.Dataset:
    """Edit-distance near-dup pairs: docs sharing their first
    ``key_chars`` characters form candidate buckets (over-large buckets
    are non-discriminative boilerplate and dropped, like the LSH
    ``bucket_cap``); within a bucket every a<b pair is verified with
    EXACT Levenshtein over the first ``head_chars`` characters, batched
    across all pairs by ``_batched_levenshtein``. ONE keyed hop (bucket
    key) co-locates buckets; the pair space is cap-bounded per bucket.
    rows = (a, b, dist), dist ≤ ``max_dist``."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    key_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("key", pa.string()),
            pa.field("head", pa.string()),
        ]
    )

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return key_schema.empty_table()
        txt = pc.fill_null(t[text_col], "")
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "key": pc.utf8_slice_codeunits(txt, 0, key_chars),
                "head": pc.utf8_slice_codeunits(txt, 0, head_chars),
            },
            schema=key_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("a", pa.int64()),
            pa.field("b", pa.int64()),
            pa.field("dist", pa.int64()),
        ]
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t["key"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        head = t["head"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, key))
        key, doc, head = key[order], doc[order], head[order]
        new = np.concatenate(([True], key[1:] != key[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(key)))
        ia, ib = [], []
        for s, ln in zip(starts, lens):
            if ln < 2 or ln > bucket_cap:
                continue
            ii, jj = np.triu_indices(ln, k=1)
            ia.append(s + ii)
            ib.append(s + jj)
        if not ia:
            return out_schema.empty_table()
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        # char-code matrices, zero-padded (NUL never appears in text)
        codes = np.zeros((len(doc), head_chars), dtype=np.uint32)
        for r, h in enumerate(head):
            arr = np.frombuffer(str(h).encode("utf-32-le"), dtype=np.uint32)[
                :head_chars
            ]
            codes[r, : len(arr)] = arr
        dist = _batched_levenshtein(codes[ia], codes[ib], head_chars)
        keep = dist <= max_dist
        a, b = doc[ia[keep]], doc[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo),
                "b": pa.array(hi),
                "dist": pa.array(dist[keep]),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["key"])
        .map_batches(pair_block, batch_format="pyarrow", batch_size=None)
    )
