"""Corpus-trained bigram language-model quality scoring.

The CCNet-family pipelines score every document with a language model
and drop the high-perplexity tail before training. The public recipe
uses a pretrained KenLM; with no model artifacts in this environment we
train the LM on the corpus itself — an add-alpha-smoothed word bigram
model, which is the textbook n-gram LM and is exactly SQL-mirrorable —
and emit each document's average negative log-likelihood (avg NLL, the
log of perplexity).

    P(w2 | w1) = (c(w1 w2) + a) / (c(w1·) + a·V)

where c(w1 w2) is the corpus bigram count, c(w1·) the count of w1 as a
bigram context (occurrences in non-final position), V the corpus
vocabulary size, and a the smoothing constant.

Scale shape (the whole point): the per-doc NLL sum splits into two
independent terms — Σ m·ln(c1 + aV) over (doc, ctx) multiplicities and
−Σ m·ln(c2 + a) over (doc, gram) multiplicities — so the pipeline is
two PARALLEL branches, each ONE keyed repartition of batch-pre-
aggregated (doc, key, m) rows (distinct pairs, not the raw token
stream), with global counts computed as weighted bincounts on the
co-located block; a union of per-doc partials then makes one tiny
doc-keyed exchange. No count relation is ever collected on the driver
and no Ray HashAggregate runs at gram/doc cardinality — the same
combiner discipline as ``exact_dedup``. The only driver-side value is
the vocabulary size V (one integer).

Reference analogy: the reference scores/filters rows during extraction
with per-sheet state (pbnjay/grate commonxl/sheet.go); this is the
corpus-statistics generalization a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _within_run_ranges


def explode_bigrams(
    t: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(doc_id, ctx, gram) rows — word bigrams WITH multiplicity (an LM
    is trained on occurrences, unlike the dedup kernels' distinct-gram
    sets). Vectorized: split → flat word array → two window takes →
    binary_join. Docs with <2 words emit nothing."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    ng = np.maximum(counts - 1, 0)
    if int(ng.sum()) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "ctx": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
            }
        )
    word_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    starts = np.repeat(word_starts, ng) + _within_run_ranges(ng)
    ctx = flat.take(pa.array(starts))
    nxt = flat.take(pa.array(starts + 1))
    gram = pc.binary_join_element_wise(ctx, nxt, " ")
    doc = np.repeat(t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), ng)
    return pa.table({"doc_id": pa.array(doc), "ctx": ctx, "gram": gram})


def vocab_size(
    docs: ray.data.Dataset, text_col: str = "text"
) -> int:
    """Corpus distinct-word count: per-batch unique partial → one keyed
    repartition by word → per-block unique count → scalar sum. The word
    relation that shuffles is already block-distinct, so the exchange
    carries ~vocab rows, not ~token rows."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    def words_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        return pa.table({"word": words.flatten().unique()})

    def block_count(t: pa.Table) -> pa.Table:
        n = len(pc.unique(t["word"].combine_chunks())) if t.num_rows else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    partial = docs.map_batches(words_partial, batch_format="pyarrow")
    counted = partial.repartition(join_partitions(32), keys=["word"]).map_batches(
        block_count, batch_format="pyarrow", batch_size=None
    )
    return int(counted.sum("n") or 0)



def _doc_key_mult(t: pa.Table, key: str, text_col: str, id_col: str) -> pa.Table:
    """Per-batch combiner: (doc_id, key, m) with m the occurrence count
    of that gram/ctx within the doc — batch-local pre-aggregation that
    shrinks the shuffle from token-stream rows to distinct-(doc, key)
    rows (the exchange payload at web scale)."""
    g = explode_bigrams(t, text_col, id_col)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "key": pa.array([], pa.string()),
            "m": pa.array([], pa.int64()),
        }
    )
    if g.num_rows == 0:
        return empty
    df = pd.DataFrame(
        {
            "doc_id": g["doc_id"].to_numpy(zero_copy_only=False),
            "key": g[key].to_pandas(),
        }
    )
    agg = df.groupby(["doc_id", "key"], sort=False).size().reset_index(name="m")
    return pa.table(
        {
            "doc_id": pa.array(agg["doc_id"].to_numpy(), pa.int64()),
            "key": pa.array(agg["key"].to_numpy(), pa.string()),
            "m": pa.array(agg["m"].to_numpy(), pa.int64()),
        }
    )


def bigram_lm_score(
    docs: ray.data.Dataset,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Score every document with the corpus-trained bigram LM. Emits one
    row per document that has at least one bigram (docs of <2 words have
    no likelihood under a bigram model and are excluded, mirroring the
    SQL oracle's inner group-by over bigram rows):

        (doc_id, n_bigrams, avg_nll)   avg_nll rounded to 6dp

    avg_nll = mean over the doc's bigrams of ln(c1 + a·V) − ln(c2 + a),
    i.e. −ln P under add-alpha smoothing. Lower is more fluent/common;
    the CCNet recipe drops the top tail.

    Shape: the numerator splits into two independent sums — −Σ m·ln(c2 +
    a) over (doc, gram) multiplicities and Σ m·ln(c1 + aV) over
    (doc, ctx) multiplicities — so each branch shuffles ONCE, and the
    branches run in PARALLEL under a union; global counts are weighted
    bincounts on the key-co-located block, and only per-doc partial rows
    reach the final tiny doc-keyed exchange. Two shuffle LEVELS of
    pre-aggregated rows, not a 3-deep sequential chain of the raw
    bigram-occurrence stream.
    """
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    v = vocab_size(docs, text_col=text_col)

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def _weighted_counts(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(per-row GLOBAL key count, per-row multiplicity) — valid
        because the block is co-located on key."""
        codes, _ = pd.factorize(t["key"].to_pandas())
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.bincount(codes, weights=m)[codes], m

    def _per_doc(t: pa.Table, term: np.ndarray, count_n: bool) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc, kind="stable")
        d = doc[order]
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        change[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(change)
        n = (
            np.add.reduceat(m[order], starts)
            if count_n
            else np.zeros(len(starts), dtype=np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "s": pa.array(np.add.reduceat(term[order], starts)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def gram_branch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        c, m = _weighted_counts(t)
        return _per_doc(t, -m * np.log(c + alpha), count_n=True)

    def ctx_branch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        c, m = _weighted_counts(t)
        return _per_doc(t, m * np.log(c + alpha * v), count_n=False)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "avg_nll": pa.array([], pa.float64()),
                }
            )
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        d = doc[order]
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        change[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(change)
        st = np.add.reduceat(s[order], starts)
        nt = np.add.reduceat(n[order], starts)
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "n_bigrams": pa.array(nt.astype(np.int64)),
                "avg_nll": pa.array(np.round(st / nt, 6)),
            }
        )

    p = join_partitions(64)
    a = (
        docs.map_batches(
            lambda t: _doc_key_mult(t, "gram", text_col, id_col),
            batch_format="pyarrow",
        )
        .repartition(p, keys=["key"])
        .map_batches(gram_branch, batch_format="pyarrow", batch_size=None)
    )
    b = (
        docs.map_batches(
            lambda t: _doc_key_mult(t, "ctx", text_col, id_col),
            batch_format="pyarrow",
        )
        .repartition(p, keys=["key"])
        .map_batches(ctx_branch, batch_format="pyarrow", batch_size=None)
    )
    return (
        a.union(b)
        .repartition(join_partitions(32), keys=["doc_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
