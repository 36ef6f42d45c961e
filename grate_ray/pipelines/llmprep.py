"""LLM training-data preparation pipelines over the documents table.

Composable single-purpose stages (the building blocks a 100 TB corpus
run chains): PII scrubbing and repetition filtering live as kernels in
``functions/text.py``; this module holds the pipelines that need
cross-row coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def assemble_transcripts(state) -> ray.data.Dataset:
    """Per-conversation document assembly over replayed lake state (the
    CDC engine composed with LLM prep): all live turns of a conversation
    become one ``role: text`` transcript, ordered by turn_idx.

    Scale shape: ONE keyed repartition co-locates each conv_id in one
    block; whole-block batches then sort by (conv_id, turn_idx) and join
    per segment — string concatenation is inherently O(output chars), so
    the per-group join IS the work, and no shuffle ships assembled text
    (only raw turns move).

    NOTE: ``state`` must have been created under the hash-shuffle
    context (``context.configure_shuffle``) — a Ray Dataset captures its
    DataContext at creation, and keyed repartition requires
    HASH_SHUFFLE. Engine pipelines (``apply_binlog``/``read_lake``)
    already do this."""
    import pandas as pd

    from ..context import configure_shuffle

    configure_shuffle(32)
    co = state.repartition(32, keys=["conv_id"])

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"])
        line = df["role"].fillna("") + ": " + df["text"].fillna("")
        g = line.groupby(df["conv_id"], sort=True)
        out = g.agg("\n".join)
        n = df.groupby(df["conv_id"], sort=True)["turn_idx"].size()
        return pd.DataFrame(
            {
                "conv_id": out.index,
                "n_turns": n.to_numpy().astype("int64"),
                "transcript": out.to_numpy(),
            }
        )

    return co.map_batches(build, batch_format="pandas", batch_size=None)


def chunk_documents(
    sf_dir: str, chunk_size: int = 200, stride: int = 150
) -> ray.data.Dataset:
    """Overlapping fixed-window chunking (context-window prep): doc text
    → chunks of ``chunk_size`` chars starting every ``stride`` chars
    (overlap = chunk_size − stride). The 1→N expansion runs inside
    map_batches, vectorized BY CHUNK INDEX: one Arrow slice kernel per
    distinct chunk start over all docs that reach it — no per-row Python,
    and the per-batch loop is bounded by max chunks per doc, not rows.
    Empty docs emit one empty chunk (stable cardinality for joins)."""
    import numpy as np

    if stride <= 0 or chunk_size < stride:
        raise ValueError("need 0 < stride <= chunk_size")

    def explode(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ln = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(
            1, -(-(ln - (chunk_size - stride)) // stride)
        )  # ceil((len - overlap) / stride), min 1
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_n, out_chunks = [], [], [], []
        max_k = int(n_chunks.max()) if len(n_chunks) else 0
        for k in range(max_k):
            sel = np.flatnonzero(n_chunks > k)
            sliced = pc.utf8_slice_codeunits(
                text.take(pa.array(sel)),
                start=k * stride,
                stop=k * stride + chunk_size,
            )
            out_ids.append(ids[sel])
            out_idx.append(np.full(len(sel), k, dtype=np.int64))
            out_n.append(n_chunks[sel])
            out_chunks.append(sliced)
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], t["doc_id"].type),
                    "chunk_idx": pa.array([], pa.int64()),
                    "n_chunks": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), t["doc_id"].type),
                "chunk_idx": pa.array(np.concatenate(out_idx)),
                "n_chunks": pa.array(np.concatenate(out_n)),
                "chunk": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_chunks]
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(explode, batch_format="pyarrow")


def shard_pack(
    sf_dir: str,
    budget: int = 4096,
    num_parts: int | None = None,
    sample_per_block: int = 8,
) -> ray.data.Dataset:
    """Token-budgeted shard assignment: documents in doc_id order are
    packed greedily into shards of ``budget`` whitespace tokens (a doc
    lands in the shard its FIRST token falls in — exclusive prefix sum).

    Distributed two-phase prefix sum, the scale-safe shape:

      0. a cheap doc_id-column-only pass computes RANGE-partition
         boundaries from per-block order statistics (``sample_per_block``
         evenly-spaced values per block → global quantiles) — no dense /
         uniform doc_id assumption; driver data is O(#blocks), like
         Ray's own sample-based sort. Any monotonic-in-doc_id partition
         map yields the SAME shard ids (the prefix sum is
         partition-invariant); sampling only buys balance under sparse
         or skewed ids.
      1. one pass over the text computes per-doc token counts and the
         range-partition key (text is dropped immediately — everything
         downstream is 3 small int columns);
      2. per-partition token totals (one tiny groupby — #partitions
         rows) come to the driver, which computes exclusive partition
         offsets (P values, broadcast via closure);
      3. each partition independently cumsums its own docs and adds its
         offset — ``groupby(part).map_groups``, co-located, vectorized.

    Never materializes the corpus; driver-side data is one row per
    partition plus the bounded boundary sample."""
    import pandas as pd

    t1, offsets = _token_prefix_parts(sf_dir, num_parts, sample_per_block)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        start = (
            offsets[int(g["part"].iloc[0])]
            + g["n_tokens"].cumsum()
            - g["n_tokens"]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(),
                "shard_id": (start.to_numpy() // budget).astype(np.int64),
            }
        )

    return t1.groupby("part").map_groups(assign, batch_format="pandas")


def _token_prefix_parts(
    sf_dir: str, num_parts: int | None, sample_per_block: int = 8
):
    """Shared phases of the distributed exclusive token prefix sum (see
    ``shard_pack``): returns (t1, offsets) where t1 is the slim
    (doc_id, n_tokens, part) relation and offsets maps each range
    partition to the token count of everything before it (P driver
    values)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.text import normalize_text, token_count

    if num_parts is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        num_parts = max(16, 2 * cpus)

    # phase 0: deterministic per-block order statistics → range boundaries
    def block_sample(t: pa.Table) -> pa.Table:
        ids = np.sort(t["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) > sample_per_block:
            pick = np.linspace(0, len(ids) - 1, sample_per_block).astype(np.int64)
            ids = ids[pick]
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    sampled = np.sort(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(block_sample, batch_format="pyarrow")
        .to_pandas()["doc_id"]
        .to_numpy()
    )
    if len(sampled) == 0:
        boundaries = np.array([], dtype=np.int64)
    else:
        qs = np.linspace(0, 1, num_parts + 1)[1:-1]
        boundaries = np.unique(
            np.quantile(sampled, qs, method="nearest").astype(np.int64)
        )

    def toks(t: pa.Table) -> pa.Table:
        norm = pc.fill_null(normalize_text(t["text"]), "")
        n = pc.cast(token_count(norm), pa.int64())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, ids, side="right").astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": n, "part": pa.array(part)}
        )

    t1 = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(toks, batch_format="pyarrow")

    # phase 2: P rows to the driver (P = ceil(n_docs / part_docs))
    sums = (
        t1.groupby("part")
        .aggregate(Sum(on="n_tokens", alias_name="part_tokens"))
        .to_pandas()
        .sort_values("part")
    )
    excl = sums["part_tokens"].cumsum() - sums["part_tokens"]
    offsets = dict(zip(sums["part"].astype(int), excl.astype(int)))
    return t1, offsets


def pack_sequences(
    sf_dir: str,
    seq_len: int = 512,
    num_parts: int | None = None,
    sample_per_block: int = 8,
) -> ray.data.Dataset:
    """Concat-and-chop sequence packing — the GPT-style tokenizer-side
    step: documents in doc_id order form one global token stream that is
    chopped into fixed ``seq_len`` training sequences; a doc spanning a
    boundary is SPLIT across consecutive sequences. Emits one row per
    (doc, covering sequence):

        (doc_id, seq_id, doc_off, seg_len)

    where doc_off is the first packed token's offset within the doc and
    seg_len the token count this sequence takes. Zero-token docs emit
    nothing (mirrored in SQL).

    Same distributed two-phase exclusive prefix sum as ``shard_pack``
    (shared ``_token_prefix_parts``), then a VECTORIZED 1→N flat-map per
    partition: k0 = start//S, k1 = (start+n−1)//S, one output row per
    covered k via repeat + within-run ranges — no per-doc Python."""
    import pandas as pd

    t1, offsets = _token_prefix_parts(sf_dir, num_parts, sample_per_block)
    s = int(seq_len)

    def segments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy().astype(np.int64)
        start = offsets[int(g["part"].iloc[0])] + n.cumsum() - n
        ids = g["doc_id"].to_numpy().astype(np.int64)
        nz = n > 0
        ids, n, start = ids[nz], n[nz], start[nz]
        if len(ids) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.array([], np.int64),
                    "seq_id": np.array([], np.int64),
                    "doc_off": np.array([], np.int64),
                    "seg_len": np.array([], np.int64),
                }
            )
        from ..functions.dedup import _within_run_ranges

        k0 = start // s
        k1 = (start + n - 1) // s
        cnt = (k1 - k0 + 1).astype(np.int64)
        k = np.repeat(k0, cnt) + _within_run_ranges(cnt)
        doc = np.repeat(ids, cnt)
        st = np.repeat(start, cnt)
        en = st + np.repeat(n, cnt)
        lo = np.maximum(k * s, st)
        hi = np.minimum((k + 1) * s, en)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "seq_id": k,
                "doc_off": lo - st,
                "seg_len": hi - lo,
            }
        )

    return t1.groupby("part").map_groups(segments, batch_format="pandas")


def dialog_pairs(state, window: int = 3) -> ray.data.Dataset:
    """TRAINING-PAIR extraction over replayed lake state: every assistant
    turn becomes one (context, response) example, the context being the
    previous ``window`` turns rendered ``role: text`` and joined by
    newlines — the supervised-fine-tuning prep that consumes a
    conversation lake.

    Scale shape: one keyed repartition co-locates each conversation;
    the per-block pass sorts once and builds every window with pandas
    shift/concat column arithmetic (no per-example Python loop); only
    raw turns shuffle — assembled contexts are born in their final
    block."""
    import numpy as np
    import pandas as pd

    from ..context import configure_shuffle

    configure_shuffle(32)
    co = state.repartition(32, keys=["conv_id"])

    def build(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype="int32"),
                "context": pd.Series([], dtype=object),
                "response": pd.Series([], dtype=object),
            }
        )
        if not len(df):
            return empty
        df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        line = df["role"].fillna("") + ": " + df["text"].fillna("")
        # k-shifted line columns WITHIN each conversation: shift(k) then
        # blank rows whose shift crossed a conversation boundary
        conv = df["conv_id"]
        parts = []
        for k in range(window, 0, -1):
            shifted = line.shift(k)
            same = conv.eq(conv.shift(k))
            parts.append(shifted.where(same, None))
        ctx = pd.Series([""] * len(df), dtype=object)
        started = pd.Series([False] * len(df))
        for p in parts:
            have = p.notna()
            ctx = ctx.where(~(started & have), ctx + "\n")
            ctx = ctx.where(~have, ctx + p.fillna(""))
            started = started | have
        mask = (df["role"] == "assistant").to_numpy()
        if not mask.any():
            return empty
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy()[mask],
                "turn_idx": df["turn_idx"].to_numpy()[mask],
                "context": ctx.to_numpy()[mask],
                "response": df["text"].to_numpy()[mask],
            }
        )
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out

    return co.map_batches(build, batch_format="pandas", batch_size=None)


def contrastive_triplets(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    pool_mod: int = 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(anchor, positive, negative) triplets for contrastive embedding
    training: positives are verified MinHash near-dup pairs; the negative
    for each pair is drawn WITHOUT RNG from a deterministic md5-sampled
    candidate pool — the first pool doc after the anchor (wrapping past
    the end) that is neither side of the pair nor any known near-dup of
    the anchor. Re-runs and the SQL oracle produce identical triplets.

    Scale shape: the pair relation is symmetrized and makes ONE keyed hop
    on the anchor, co-locating each anchor's full near-dup partner set
    (the exclusion set) with its triplet rows; the negative pool is a
    hash sample broadcast once via ``ray.put`` — the standard
    capped-negative-pool regime (shrink the pool fraction as the corpus
    grows to bound the broadcast; negatives only need to be plausible,
    not exhaustive)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.dedup import _md5_lower64, minhash_lsh_pairs

    configure_shuffle(32)
    npart = join_partitions(32)

    pairs = minhash_lsh_pairs(ds, threshold=threshold, text_col=text_col,
                              id_col=id_col)

    # candidate pool: md5-hash sample of the corpus ids (tiny, broadcast)
    def pick_pool(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _md5_lower64(ids.astype("U20"))
        return pa.table({id_col: pa.array(ids[h % pool_mod == 0])})

    pool_ids = np.sort(
        np.concatenate(
            [
                b[id_col].to_numpy(zero_copy_only=False)
                for b in ds.select_columns([id_col])
                .map_batches(pick_pool, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            or [np.array([], dtype=np.int64)]
        ).astype(np.int64)
    )
    pool_ref = ray.put(pool_ids)

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "anchor": pa.array([], pa.int64()),
                    "partner": pa.array([], pa.int64()),
                    "fwd": pa.array([], pa.int8()),
                }
            )
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "anchor": pa.array(np.concatenate([a, b])),
                "partner": pa.array(np.concatenate([b, a])),
                "fwd": pa.array(
                    np.concatenate(
                        [np.ones(len(a), np.int8), np.zeros(len(b), np.int8)]
                    )
                ),
            }
        )

    def pick_negatives(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("anchor", pa.int64()),
                pa.field("positive", pa.int64()),
                pa.field("negative", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        pool = ray.get(pool_ref)
        anc = t["anchor"].to_numpy(zero_copy_only=False)
        par = t["partner"].to_numpy(zero_copy_only=False)
        fwd = t["fwd"].to_numpy(zero_copy_only=False)
        order = np.argsort(anc, kind="stable")
        anc, par, fwd = anc[order], par[order], fwd[order]
        change = np.empty(len(anc), dtype=bool)
        change[0] = True
        change[1:] = anc[1:] != anc[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(anc))
        out_a, out_p, out_n = [], [], []
        for s, e in zip(starts, ends):
            a = int(anc[s])
            excl = set(par[s:e].tolist())
            excl.add(a)
            if len(pool) == 0:
                continue
            start = int(np.searchsorted(pool, a, side="right"))
            for i in range(s, e):
                if fwd[i] != 1:
                    continue
                neg = None
                for j in range(len(pool)):  # wraps; excl sets are tiny
                    c = int(pool[(start + j) % len(pool)])
                    if c not in excl and c != int(par[i]):
                        neg = c
                        break
                if neg is None:
                    continue
                out_a.append(a)
                out_p.append(int(par[i]))
                out_n.append(neg)
        return pa.table(
            {
                "anchor": pa.array(out_a, pa.int64()),
                "positive": pa.array(out_p, pa.int64()),
                "negative": pa.array(out_n, pa.int64()),
            },
            schema=schema,
        )

    return (
        pairs.map_batches(symmetrize, batch_format="pyarrow")
        .repartition(npart, keys=["anchor"])
        .map_batches(pick_negatives, batch_format="pyarrow", batch_size=None)
    )
