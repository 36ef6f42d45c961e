"""Distributed BPE merge training — the tokenizer-induction primitive.

Byte-pair encoding training is K rounds of: count adjacent symbol pairs
across the corpus (weighted by word frequency), merge the most frequent
pair everywhere, repeat. The classic giant-corpus formulation works over
the WORD-FREQUENCY relation, not raw text — one corpus pass builds
(word, freq), and every subsequent round touches only that vocab-sized
relation.

Scale shape:

- corpus pass: per-batch word explode with batch-local pre-aggregation,
  ONE keyed repartition by word, per-block exact sums → the (word, freq,
  seq) relation stays distributed (vocab-sized — orders of magnitude
  smaller than the corpus);
- per round: per-block weighted pair partials (bounded by the block's
  token count), one small groupby((a, b)).sum → per-block top-1 prune →
  a handful of candidate rows on the driver pick the global best pair
  (deterministic ties: count desc, then pair lexicographic asc);
- the winning pair broadcasts by closure; the merge applies as ONE
  vectorized string replace per block.

Merge application uses the DOUBLE-SPACE token encoding: a symbol
sequence is ``'  ' + '  '.join(tokens) + '  '`` and merging (a, b) is
the plain left-to-right non-overlapping replace of ``' a  b '`` with
``' ab '``. The single flanking spaces anchor token boundaries (no
mid-token or prefix false matches), the double separators survive one
consumed space on each side (consecutive merge sites all apply), and an
overlapping run like ``b b b`` merges left-to-right exactly once — the
canonical greedy BPE apply. ``str.replace`` and SQL ``replace()`` share
these semantics, which is what makes the full K-round run
SQL-mirrorable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _to_seq(word: str) -> str:
    return "  " + "  ".join(word) + "  "


def word_freqs(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, freq) over space-tokenized text: batch-local pre-aggregate,
    one keyed repartition, exact per-block sums (words co-locate)."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        flat = words.flatten()
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "freq": pa.array([], pa.int64())}
            )
        codes, uniques = pd.factorize(flat.to_pandas())
        cnt = np.bincount(codes).astype(np.int64)
        keep = uniques.to_numpy(dtype=object) != ""
        return pa.table(
            {
                "word": pa.array(uniques[keep].astype(object), pa.string()),
                "freq": pa.array(cnt[keep]),
            }
        )

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        codes, uniques = pd.factorize(t["word"].to_pandas())
        s = np.bincount(
            codes, weights=t["freq"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "word": pa.array(uniques.astype(object), pa.string()),
                "freq": pa.array(s),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["word"])
        .map_batches(block_sum, batch_format="pyarrow", batch_size=None)
    )


def bpe_train_merges(
    docs: ray.data.Dataset, num_merges: int = 3, text_col: str = "text"
) -> pa.Table:
    """Run ``num_merges`` BPE rounds; returns the merge table
    (step, left, right, n) — the learned merges in order. The corpus is
    read once; each round runs over the distributed vocab relation."""

    def init_seq(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()  # vocab-side loop (not corpus-side)
        return t.append_column(
            "seq", pa.array([_to_seq(w) for w in words], pa.string())
        )

    vocab = (
        word_freqs(docs, text_col=text_col)
        .map_batches(init_seq, batch_format="pyarrow")
        .materialize()  # vocab-sized; each round re-scans it, not the corpus
    )

    merges: list[tuple[int, str, str, int]] = []
    for step in range(num_merges):

        def pair_partials(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0:
                return empty
            freq = t["freq"].to_numpy(zero_copy_only=False)
            toks = [s[2:-2].split("  ") for s in t["seq"].to_pylist()]
            lens = np.array([len(x) - 1 for x in toks])
            if (lens <= 0).all():
                return empty
            a = np.concatenate(
                [np.asarray(x[:-1], dtype=object) for x in toks if len(x) > 1]
            )
            b = np.concatenate(
                [np.asarray(x[1:], dtype=object) for x in toks if len(x) > 1]
            )
            w = np.repeat(freq, np.maximum(lens, 0))
            # composite key via numeric factorize codes (string-concat keys
            # are collision/NUL-hazardous — see the incremental-index fix)
            ca, ua = pd.factorize(pd.Series(a))
            cb, ub = pd.factorize(pd.Series(b))
            key = ca.astype(np.int64) * len(ub) + cb
            uk, inv = np.unique(key, return_inverse=True)
            s = np.bincount(inv, weights=w).astype(np.int64)
            return pa.table(
                {
                    "a": pa.array(
                        ua.to_numpy(dtype=object)[uk // len(ub)], pa.string()
                    ),
                    "b": pa.array(
                        ub.to_numpy(dtype=object)[uk % len(ub)], pa.string()
                    ),
                    "cnt": pa.array(s),
                }
            )

        def block_top1(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            pdf = t.to_pandas()
            pdf = pdf.groupby(["a", "b"], as_index=False)["cnt"].sum()
            pdf = pdf.sort_values(
                ["cnt", "a", "b"], ascending=[False, True, True]
            ).head(1)
            return pa.Table.from_pandas(pdf, preserve_index=False)

        from ..context import join_partitions

        cands = (
            vocab.map_batches(pair_partials, batch_format="pyarrow")
            .repartition(join_partitions(16), keys=["a", "b"])
            .map_batches(block_top1, batch_format="pyarrow", batch_size=None)
            .take_all()
        )  # ≤ one row per block on the driver
        if not cands:
            break
        best = sorted(cands, key=lambda r: (-r["cnt"], r["a"], r["b"]))[0]
        a, b, n = best["a"], best["b"], int(best["cnt"])
        merges.append((step, a, b, n))

        pat, rep = f" {a}  {b} ", f" {a}{b} "

        def apply_merge(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            seq = pc.replace_substring(t["seq"], pattern=pat, replacement=rep)
            return t.set_column(t.column_names.index("seq"), "seq", seq)

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return pa.table(
        {
            "step": pa.array([m[0] for m in merges], pa.int64()),
            "lhs": pa.array([m[1] for m in merges], pa.string()),
            "rhs": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_encode_counts(
    docs: ray.data.Dataset,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """APPLY a learned merge list — the tokenize step after
    ``bpe_train_merges``: per document, the BPE token count of its words
    under the K merges (the number a packing/budgeting stage consumes).

    Scale shape: the merge list is tiny and broadcast by closure; each
    batch factorizes its words so every DISTINCT word encodes once (K
    vectorized replaces over double-space seqs, same semantics as
    training), token counts scatter back through the factorize codes and
    sum per row — NO shuffle anywhere. Docs with no words emit nothing
    (mirroring the SQL join formulation)."""

    def per_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bpe_tokens": pa.array([], pa.int64()),
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
        if len(flat) == 0:
            return empty
        codes, uniques = pd.factorize(flat.to_pandas())
        keep = uniques.to_numpy(dtype=object) != ""
        seqs = pa.array(
            [_to_seq(w) if w else "" for w in uniques], pa.string()
        )
        for a, b in merges:
            seqs = pc.replace_substring(
                seqs, pattern=f" {a}  {b} ", replacement=f" {a}{b} "
            )
        trimmed = pc.utf8_trim(seqs, " ")
        ln = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
        no_sep = pc.utf8_length(
            pc.replace_substring(trimmed, pattern="  ", replacement="")
        ).to_numpy(zero_copy_only=False)
        per_word = np.where(ln > 0, (ln - no_sep) // 2 + 1, 0).astype(np.int64)
        per_word = np.where(keep, per_word, 0)
        row_tok = per_word[codes]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # rows with zero words contribute nothing to reduceat runs
        sums = np.zeros(t.num_rows, dtype=np.int64)
        nz = counts > 0
        if nz.any():
            sums[nz] = np.add.reduceat(row_tok, starts[nz])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        has_word = np.zeros(t.num_rows, dtype=bool)
        # a doc "has words" iff any of its split parts is non-empty
        nonempty = (flat.to_pandas().to_numpy(dtype=object) != "")
        if nz.any():
            has_word[nz] = (
                np.add.reduceat(nonempty.astype(np.int64), starts[nz]) > 0
            )
        return pa.table(
            {
                "doc_id": pa.array(ids[has_word]),
                "n_bpe_tokens": pa.array(sums[has_word]),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow")
