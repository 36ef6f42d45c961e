"""BM25 full-text relevance search over the document corpus.

The retrieval side of a training-data pipeline (e.g. sourcing docs for
a topic mix, or nearest-text lookup for contamination triage): score
every document against a small set of term queries with BM25 and return
the top-k per query.

    score(q, d) = Σ_{t∈q}  idf(t) · tf(t,d)·(k1+1) /
                           (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)     = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale shape: the query-term set is tiny and broadcast as a plain
closure constant; per batch a vectorized pass (split → `is_in` mask →
factorized (doc, term) unique-counts) emits only the matched postings
(≤ docs × query-terms rows) with the doc length attached batch-locally.
Those postings make THREE slim keyed hops: by term (df is a co-located
row count; the full BM25 term contribution is computed right there), by
doc (per-(query, doc) sums are complete because a doc's contributions
co-locate; each block then prunes to its local top-k per query — the
grouped-top-k combiner), and by query id for the final k. Corpus-level
N / avgdl are one tiny partial-sum aggregate (two scalars on the
driver). Nothing driver-side scales with the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def corpus_stats(
    docs: ray.data.Dataset, text_col: str = "text"
) -> tuple[int, float]:
    """(N, avgdl): document count and mean word count — per-batch partial
    sums, one tiny aggregate."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        dl = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(dl.sum())], pa.int64()),
            }
        )

    agg = docs.map_batches(partial, batch_format="pyarrow").sum(["n", "s"])
    n, s = int(agg["sum(n)"]), int(agg["sum(s)"])
    return n, (s / n if n else 0.0)


def tfidf_topk(
    docs: ray.data.Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document top-k keywords by TF-IDF: score = tf · ln(N / df),
    ranked (round(score,6) DESC, term ASC) so ties are deterministic and
    SQL-mirrorable. Output: (doc_id, rank, term, score).

    Unlike BM25's tiny broadcast query-term set, the FULL corpus
    vocabulary participates — so df lives on the cluster, never the
    driver: one batch pass explodes exact (doc, term, tf) postings
    (per-batch factorize + unique, no Python loop over tokens), one
    keyed hop by term computes df as a co-located row count and scores
    right there, one keyed hop by doc takes the per-doc top-k (each
    (doc, term) row is unique, so the group is complete wherever it
    lands). Corpus size N is the only driver scalar."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    n_docs = docs.count()

    def postings(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        if len(flat) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        codes, uniques = pd.factorize(flat.to_pandas())
        key = doc * len(uniques) + codes
        uk, tf = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[uk // len(uniques)]),
                "term": pa.array(
                    uniques[(uk % len(uniques))].astype(object), pa.string()
                ),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    def score_by_term(t: pa.Table) -> pa.Table:
        """Co-located by term: df = rows per term in this block (exact
        global df — each (doc, term) posting is unique)."""
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        codes, _ = pd.factorize(t["term"].to_pandas())
        df = np.bincount(codes)[codes].astype(np.float64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf * np.log(float(n_docs) / df)
        return pa.table(
            {"doc_id": t["doc_id"], "term": t["term"], "score": pa.array(score)}
        )

    def doc_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        pdf = pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "score": t["score"],
                "r6": pa.array(
                    np.round(t["score"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        ).to_pandas()
        pdf = pdf.sort_values(
            ["doc_id", "r6", "term"], ascending=[True, False, True],
            kind="stable",
        )
        pdf["rank"] = pdf.groupby("doc_id").cumcount() + 1
        pdf = pdf[pdf["rank"] <= k]
        return pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"].to_numpy()),
                "rank": pa.array(pdf["rank"].to_numpy().astype(np.int64)),
                "term": pa.array(pdf["term"].astype(object), pa.string()),
                # 6dp-rounded: the published score is the ranking key (raw
                # doubles differ from a SQL mirror by ULPs of ln())
                "score": pa.array(pdf["r6"].to_numpy()),
            }
        )

    p = join_partitions(32)
    return (
        docs.map_batches(postings, batch_format="pyarrow")
        .repartition(p, keys=["term"])
        .map_batches(score_by_term, batch_format="pyarrow", batch_size=None)
        .repartition(p, keys=["doc_id"])
        .map_batches(doc_topk, batch_format="pyarrow", batch_size=None)
    )


def bm25_topk(
    docs: ray.data.Dataset,
    queries: dict[int, list[str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k BM25 docs per query: (qid, rank, doc_id, score), score
    rounded to 6dp, ranking key (rounded score desc, doc_id asc) so ties
    are deterministic and SQL-mirrorable."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    n_docs, avgdl = corpus_stats(docs, text_col=text_col)
    terms = sorted({t for ts in queries.values() for t in ts})
    term_arr = pa.array(terms, pa.string())
    term_code = {t: i for i, t in enumerate(terms)}
    # term-code → query ids containing it (tiny, closure-broadcast)
    code_qids: list[list[int]] = [
        [q for q, ts in sorted(queries.items()) if t in ts] for t in terms
    ]

    def postings(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        mask = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        if not mask.any():
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, counts)[mask]
        codes = (
            pc.index_in(flat, value_set=term_arr)
            .to_numpy(zero_copy_only=False)[mask]
            .astype(np.int64)
        )
        key = doc * len(terms) + codes
        uk, tf = np.unique(key, return_counts=True)
        udoc = uk // len(terms)
        # dl lookup: batch-local positional map (ids are unique per batch)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], udoc)
        dl = np.asarray(counts, dtype=np.int64)[order][pos]
        return pa.table(
            {
                "doc_id": pa.array(udoc),
                "term": pa.array([terms[c] for c in uk % len(terms)], pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(dl),
            }
        )

    def contrib(t: pa.Table) -> pa.Table:
        """Co-located by term: df = rows per term in this block (global);
        emit one (qid, doc_id, c) row per query containing the term."""
        empty = pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        codes, uniques = pd.factorize(t["term"].to_pandas())
        df = np.bincount(codes)[codes].astype(np.float64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        c = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        qid_out, doc_out, c_out = [], [], []
        ucodes = np.fromiter(
            (term_code[w] for w in uniques), dtype=np.int64, count=len(uniques)
        )
        for qi in sorted({q for qs in code_qids for q in qs}):
            m = np.isin(codes, np.flatnonzero([qi in code_qids[u] for u in ucodes]))
            if m.any():
                qid_out.append(np.full(int(m.sum()), qi, dtype=np.int64))
                doc_out.append(doc[m])
                c_out.append(c[m])
        if not qid_out:
            return empty
        return pa.table(
            {
                "qid": pa.array(np.concatenate(qid_out)),
                "doc_id": pa.array(np.concatenate(doc_out)),
                "c": pa.array(np.concatenate(c_out)),
            }
        )

    def block_topk(t: pa.Table) -> pa.Table:
        """Co-located by doc: every (qid, doc) pair is complete here —
        sum contributions, then keep only this block's top-k per qid
        (grouped-top-k prune before the final tiny exchange)."""
        empty = pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qid = t["qid"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        key = qid * (doc.max() + 1) + doc
        order = np.argsort(key, kind="stable")
        sk = key[order]
        change = np.empty(len(sk), dtype=bool)
        change[0] = True
        change[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(change)
        score = np.add.reduceat(c[order], starts)
        uq, ud = qid[order][starts], doc[order][starts]
        out_q, out_d, out_s = [], [], []
        for qi in np.unique(uq):
            m = np.flatnonzero(uq == qi)
            rs = np.round(score[m], 6)
            sel = m[np.lexsort((ud[m], -rs))[:k]]
            out_q.append(uq[sel])
            out_d.append(ud[sel])
            out_s.append(score[sel])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qid = t["qid"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        score = np.round(t["score"].to_numpy(zero_copy_only=False), 6)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qi in np.unique(qid):
            m = np.flatnonzero(qid == qi)
            sel = m[np.lexsort((doc[m], -score[m]))[:k]]
            out_q.append(qid[sel])
            out_r.append(np.arange(1, len(sel) + 1, dtype=np.int64))
            out_d.append(doc[sel])
            out_s.append(score[sel])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "rank": pa.array(np.concatenate(out_r)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    p = join_partitions(32)
    return (
        docs.map_batches(postings, batch_format="pyarrow")
        .repartition(p, keys=["term"])
        .map_batches(contrib, batch_format="pyarrow", batch_size=None)
        .repartition(p, keys=["doc_id"])
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .repartition(max(2, min(len(queries), p)), keys=["qid"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _split_offsets(texts: pa.ChunkedArray | pa.Array):
    """Single-space tokenization of a string column → (flat numpy token
    array, int64 list offsets). Zero Python loops: Arrow split_pattern
    gives a list array whose offsets delimit each document's tokens."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
    flat = words.flatten().to_numpy(zero_copy_only=False)
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets


def _topk_terms(
    partials: ray.data.Dataset,
    term_col: str,
    k: int,
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Distributed (term, n)-partial → global top-k by (n DESC, term ASC):
    one term-keyed hop finishes the count merge, a per-block prune keeps
    ≤k candidates, and the final rank runs over ≤ k×blocks rows in one
    tiny block. Never a global sort."""
    from ..context import join_partitions

    schema = pa.schema(
        [pa.field(term_col, pa.string()), pa.field("n", pa.int64())]
    )

    def merge_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas()
        g = df.groupby(term_col, as_index=False)["n"].sum()
        g = g.sort_values(["n", term_col], ascending=[False, True], kind="mergesort")
        g = g.head(k)
        return pa.table(
            {
                term_col: pa.array(g[term_col], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    def final_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas()
        df = df.sort_values(["n", term_col], ascending=[False, True], kind="mergesort")
        df = df.head(k)
        return pa.table(
            {
                term_col: pa.array(df[term_col], pa.string()),
                "n": pa.array(df["n"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    return (
        partials.repartition(join_partitions(n_parts), keys=[term_col])
        .map_batches(merge_prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final_rank, batch_format="pyarrow", batch_size=None)
    )


def vocab_topk(
    docs: ray.data.Dataset, k: int = 50, text_col: str = "text"
) -> ray.data.Dataset:
    """Global top-k vocabulary over the corpus: per-batch word-count
    partials (np.unique over the flattened Arrow token buffer — duplicate
    words never leave the batch), then the distributed term top-k."""
    schema = pa.schema([pa.field("word", pa.string()), pa.field("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        flat, _ = _split_offsets(t[text_col])
        flat = flat[flat != ""]
        if len(flat) == 0:
            return schema.empty_table()
        words, n = np.unique(flat, return_counts=True)
        return pa.table(
            {"word": pa.array(words, pa.string()), "n": pa.array(n.astype(np.int64))},
            schema=schema,
        )

    return _topk_terms(
        docs.map_batches(partial, batch_format="pyarrow"), "word", k
    )


def bigram_topk(
    docs: ray.data.Dataset, k: int = 30, text_col: str = "text"
) -> ray.data.Dataset:
    """Global top-k ADJACENT word pairs (bigrams joined with one space),
    document-bounded: a pair never spans two documents. The adjacency
    mask comes from the Arrow list offsets (a token is pair-leading iff
    its successor is in the same document), both sides must be non-empty
    tokens, and per-batch np.unique collapses duplicates before the term
    top-k exchange."""
    schema = pa.schema([pa.field("bigram", pa.string()), pa.field("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        flat, offsets = _split_offsets(t[text_col])
        if len(flat) < 2:
            return schema.empty_table()
        lead = np.ones(len(flat), dtype=bool)
        lead[-1] = False
        # positions offsets[1:]-1 end a document; their successor starts
        # the next one
        ends = offsets[1:] - 1
        ends = ends[(ends >= 0) & (ends < len(flat))]
        lead[ends] = False
        a = flat[:-1]
        b = flat[1:]
        m = lead[:-1] & (a != "") & (b != "")
        if not m.any():
            return schema.empty_table()
        pairs = np.char.add(np.char.add(a[m].astype("U"), " "), b[m].astype("U"))
        grams, n = np.unique(pairs, return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(grams, pa.string()),
                "n": pa.array(n.astype(np.int64)),
            },
            schema=schema,
        )

    return _topk_terms(
        docs.map_batches(partial, batch_format="pyarrow"), "bigram", k
    )


def vocab_zipf_slope(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Zipf-law fit over the corpus vocabulary: least-squares slope and
    intercept of log10(frequency) on log10(rank), rank ordered by
    (count DESC, word ASC). Word counts collapse via the same per-batch
    partials as vocab_topk; only the (small) vocabulary reaches the
    final single-block regression."""
    from ..context import join_partitions
    from .num import sql_round

    part_schema = pa.schema(
        [pa.field("word", pa.string()), pa.field("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        flat, _ = _split_offsets(t[text_col])
        flat = flat[flat != ""]
        if len(flat) == 0:
            return part_schema.empty_table()
        words, n = np.unique(flat, return_counts=True)
        return pa.table(
            {"word": pa.array(words, pa.string()), "n": pa.array(n.astype(np.int64))},
            schema=part_schema,
        )

    def merge_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = t.to_pandas().groupby("word", as_index=False)["n"].sum()
        return pa.table(
            {
                "word": pa.array(df["word"], pa.string()),
                "n": pa.array(df["n"].to_numpy(np.int64)),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [pa.field("slope", pa.float64()), pa.field("intercept", pa.float64())]
    )

    def fit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        df = df.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        y = np.log10(df["n"].to_numpy(np.float64))
        x = np.log10(np.arange(1, len(df) + 1, dtype=np.float64))
        mx, my = x.mean(), y.mean()
        cov = (x * y).mean() - mx * my
        vx = (x * x).mean() - mx * mx
        slope = cov / vx
        return pa.table(
            {
                "slope": sql_round(pa.array([slope]), 6),
                "intercept": sql_round(pa.array([my - slope * mx]), 6),
            },
            schema=out_schema,
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["word"])
        .map_batches(merge_counts, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fit, batch_format="pyarrow", batch_size=None)
    )
