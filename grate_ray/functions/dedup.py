"""Deduplication operators for training-data pipelines.

All Ray-Data-first: explode/shuffle on content keys, vectorized kernels,
broadcast small sides. The keyed-LWW exact dedup of the CDC core
(stages/merge.py) is the reference's implicit dedup (SURVEY.md §2.7); the
operators here are the *content* dedup family a 100 TB text pipeline needs:

- exact: content-hash partition + min-id per identical text
- n-gram Jaccard: inverted-index candidate pairs + exact verify (fully
  SQL-mirrorable — the oracle recomputes it relationally)
- MinHash-LSH: banded signatures → bucket groupby → candidates → verify
- SimHash: 64-bit signatures, banded blocking, Hamming verify
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .text import fingerprint64

# --- exact dedup -------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id row per identical text. Hash-partition on a 64-bit
    content fingerprint (cheap shuffle key), then resolve exact equality
    within groups (collision-safe)."""

    def add_fp(t: pa.Table) -> pa.Table:
        return t.append_column("fp", fingerprint64(t[text_col]))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col)
            .drop_duplicates(subset=[text_col], keep="first")
            .drop(columns=["fp"])
        )

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(keep_first, batch_format="pandas")
    )


# --- word n-grams ------------------------------------------------------------


def _word_trigrams(words: list[str]) -> list[str]:
    return [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]


def explode_trigrams(t: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, gram) rows — DISTINCT word-3-grams per doc. Docs with <3
    words produce no grams (mirrors the SQL oracle's range())."""
    ids_out: list[int] = []
    grams_out: list[str] = []
    ids = t[id_col].to_pylist()
    texts = t[text_col].to_pylist()
    for i, txt in zip(ids, texts):
        grams = set(_word_trigrams((txt or "").split(" ")))
        ids_out.extend([i] * len(grams))
        grams_out.extend(grams)
    return pa.table(
        {"doc_id": pa.array(ids_out, pa.int64()), "gram": pa.array(grams_out, pa.string())}
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 25,
) -> ray.data.Dataset:
    """Candidate pairs via an inverted gram index (groupby gram → pairwise),
    verified with EXACT Jaccard |A∩B| / (|A|+|B|-|A∩B|) on distinct-gram
    sets. Output: (a, b, jaccard), a < b, jaccard ≥ threshold.

    ``df_cap``: grams appearing in more than this many docs are dropped
    BEFORE pairing (the standard document-frequency cap — ubiquitous
    shingles are non-discriminative and make the pair explosion quadratic).
    Jaccard is then over the capped gram sets; the SQL oracle applies the
    identical cap, so results still match exactly.
    """
    from ..context import configure_shuffle

    configure_shuffle(32)
    grams = ds.map_batches(
        lambda t: explode_trigrams(t, text_col, id_col), batch_format="pyarrow"
    )

    # document frequency per gram → broadcast the (small) hot-gram stoplist
    from ray.data.aggregate import Count

    df_counts = grams.groupby("gram").aggregate(Count(alias_name="df")).to_pandas()
    hot_grams = frozenset(df_counts[df_counts["df"] > df_cap]["gram"])
    hot_ref = ray.put(hot_grams)

    # plain task (NOT an actor pool): at small CPU counts actor pools +
    # hash-shuffle aggregator actors can reserve every slot and deadlock
    def drop_hot(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)  # local after first fetch per worker
        keep = pa.array([g not in hot for g in t["gram"].to_pylist()])
        return t.filter(keep)

    grams = grams.map_batches(drop_hot, batch_format="pyarrow")

    # per-doc distinct-gram sizes AFTER the cap: small → broadcast
    sizes_df = grams.groupby("doc_id").aggregate(Count(alias_name="n")).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n"])))

    # candidate pairs by SELF-JOIN on gram (hash-partitioned, vectorized) —
    # a per-gram map_groups pays ~ms of Python per group and dies at ~25k
    # tiny groups; the join stays in Arrow end to end
    right = grams.map_batches(
        lambda t: t.rename_columns(["doc_id_r", "gram"]), batch_format="pyarrow"
    )
    from ..context import join_partitions

    joined = grams.join(
        right, join_type="inner", num_partitions=join_partitions(32), on=("gram",)
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        mask = pc.less(t["doc_id"], t["doc_id_r"])
        t2 = t.filter(mask)
        return pa.table({"a": t2["doc_id"], "b": t2["doc_id_r"]})

    pairs = joined.map_batches(to_pairs, batch_format="pyarrow")
    inter = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_shared"))

    class Verify:
        def __init__(self, ref):
            self.sizes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            inter_n = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
            na = np.array([self.sizes.get(x, 0) for x in a], dtype=np.int64)
            nb = np.array([self.sizes.get(x, 0) for x in b], dtype=np.int64)
            union = na + nb - inter_n
            j = inter_n / np.maximum(union, 1)
            out = pa.table(
                {
                    "a": pa.array(a),
                    "b": pa.array(b),
                    "jaccard": pa.array(j.astype(np.float64)),
                }
            )
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return inter.map_batches(
        Verify, fn_constructor_args=(sizes_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _gram_hashes(grams: set[str]) -> np.ndarray:
    return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)


class MinHasher:
    """k-permutation MinHash over word-3-gram crc32s; seeded, deterministic.
    Stateful stage: permutation coefficients built once per actor."""

    def __init__(self, k: int = 64, seed: int = 7, text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        grams = set(_word_trigrams((text or "").split(" ")))
        if not grams:
            return np.full(self.k, _MERSENNE, dtype=np.uint64)
        h = _gram_hashes(grams)  # (g,)
        # (k, g): (a*h + b) mod p, then min over grams
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = np.stack([self.signature(x) for x in t[self.text_col].to_pylist()])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(list(sigs.astype(np.int64))),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """MinHash signatures → banded LSH buckets (groupby on (band, hash)) →
    candidate pairs → exact-Jaccard verify. rows = (a, b, jaccard)."""
    rows_per_band = k // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(k, 7, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def to_buckets(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in t["sig"].to_pylist()])
        out_ids, out_band, out_hash = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            hh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows_per_band):
                hh = hh * np.uint64(1099511628211) + chunk[:, c].astype(np.uint64)
            out_ids.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(hh.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids)),
                "band": pa.array(np.concatenate(out_band)),
                "bhash": pa.array(np.concatenate(out_hash)),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].unique())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        ai, bi = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ai], "b": docs[bi]})

    from ray.data.aggregate import Count as _Count

    cand = (
        buckets.groupby(["band", "bhash"])
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(_Count(alias_name="_m"))  # vectorized distinct pairs
        .map_batches(lambda t: t.drop_columns(["_m"]), batch_format="pyarrow")
    )

    # verify candidates with exact jaccard via broadcast gram sets (small:
    # candidates only touch a subset of docs)
    texts_df = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    ).to_pandas()
    gram_sets = {
        i: set(_word_trigrams((x or "").split(" ")))
        for i, x in zip(texts_df[id_col], texts_df[text_col])
    }
    gs_ref = ray.put(gram_sets)

    class VerifyExact:
        def __init__(self, ref, thr):
            self.gs = ray.get(ref)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for a, b in zip(df["a"], df["b"]):
                sa, sb = self.gs.get(a, set()), self.gs.get(b, set())
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= self.thr:
                    out.append((a, b, j))
            return pd.DataFrame(out, columns=["a", "b", "jaccard"]).astype(
                {"a": "int64", "b": "int64", "jaccard": "float64"}
            )

    return cand.map_batches(
        VerifyExact, fn_constructor_args=(gs_ref, threshold),
        batch_format="pandas", concurrency=(1, 4),
    )


# --- SimHash -----------------------------------------------------------------


def simhash64(texts: list[str], seed: int = 11) -> np.ndarray:
    """64-bit SimHash over word unigrams (crc32-hashed, bit-vote)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, txt in enumerate(texts):
        words = [w for w in (txt or "").split(" ") if w]
        if not words:
            continue
        hs = np.array(
            [zlib.crc32((str(seed) + w).encode()) for w in words], dtype=np.uint64
        )
        # widen 32→64 bits deterministically
        hs = hs * np.uint64(0x9E3779B97F4A7C15)
        votes = np.zeros(64, dtype=np.int64)
        for h in hs:
            b = (h >> bits) & np.uint64(1)
            votes += np.where(b.astype(bool), 1, -1)
        sig = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                sig |= np.uint64(1) << np.uint64(j)
        out[i] = sig
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
    band → candidate; exact recall for hamming ≤ 3 by pigeonhole), SELF-JOIN
    on (band, bval), exact vectorized Hamming verify ≤ ``max_hamming``.

    ``bucket_cap``: band values shared by more than this many docs are
    dropped before pairing — a degenerate band value (low-entropy corpus)
    is non-discriminative and would make the join quadratic. Skipped
    buckets trade recall for boundedness; they are the SimHash analogue of
    the n-gram df cap."""

    from ..context import configure_shuffle

    configure_shuffle(32)

    def add_sig(t: pa.Table) -> pa.Table:
        sig = simhash64(t[text_col].to_pylist())
        return pa.table(
            {"doc_id": t[id_col], "sig": pa.array(sig.view(np.int64))}
        )

    sigs = ds.map_batches(add_sig, batch_format="pyarrow")

    def to_bands(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = t["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        out_i, out_b, out_v, out_s = [], [], [], []
        for b in range(4):
            out_i.append(ids)
            out_b.append(np.full(len(ids), b, dtype=np.int32))
            out_v.append(((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64))
            out_s.append(sig.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_i)),
                "sig": pa.array(np.concatenate(out_s)),
                "band": pa.array(np.concatenate(out_b)),
                "bval": pa.array(np.concatenate(out_v)),
            }
        )

    from ray.data.aggregate import Count as _Count, Min as _Min

    bands = sigs.map_batches(to_bands, batch_format="pyarrow")

    # drop degenerate buckets (same role as the n-gram df cap)
    bcounts = (
        bands.groupby(["band", "bval"]).aggregate(_Count(alias_name="n")).to_pandas()
    )
    hot = frozenset(
        zip(
            bcounts[bcounts["n"] > bucket_cap]["band"],
            bcounts[bcounts["n"] > bucket_cap]["bval"],
        )
    )
    hot_ref = ray.put(hot)

    def drop_hot_buckets(t: pa.Table) -> pa.Table:
        hot_set = ray.get(hot_ref)
        if not hot_set:
            return t
        keep = pa.array(
            [
                (b, v) not in hot_set
                for b, v in zip(t["band"].to_pylist(), t["bval"].to_pylist())
            ]
        )
        return t.filter(keep)

    bands = bands.map_batches(drop_hot_buckets, batch_format="pyarrow")

    right = bands.map_batches(
        lambda t: t.rename_columns(["doc_id_r", "sig_r", "band", "bval"]),
        batch_format="pyarrow",
    )
    from ..context import join_partitions

    joined = bands.join(
        right, join_type="inner", num_partitions=join_partitions(32),
        on=("band", "bval"),
    )

    def verify(t: pa.Table) -> pa.Table:
        mask = pc.less(t["doc_id"], t["doc_id_r"])
        t2 = t.filter(mask)
        if t2.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "ham": pa.array([], pa.int64()),
                }
            )
        sa = t2["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        sb = t2["sig_r"].to_numpy(zero_copy_only=False).view(np.uint64)
        ham = _popcount64(sa ^ sb)
        out = pa.table(
            {"a": t2["doc_id"], "b": t2["doc_id_r"], "ham": pa.array(ham)}
        )
        return out.filter(pc.less_equal(out["ham"], max_hamming))

    return (
        joined.map_batches(verify, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(_Min("ham", alias_name="ham"))  # distinct pairs
    )
