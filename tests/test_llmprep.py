"""LLM-prep operators: PII redaction, word repetition, shard packing."""

import pyarrow as pa

from grate_ray.functions.text import redact_pii, word_repetition


def test_redact_pii_emails_and_phones():
    col = pa.array(
        [
            "mail bob.s@ex.example today",
            "call +1-555-0199 or +1-555-1234 now",
            "a.b_c9@sub.ex.example and +1-555-0000",
            "nothing here",
            None,
        ]
    )
    out = redact_pii(col).to_pylist()
    assert out == [
        "mail [EMAIL] today",
        "call [PHONE] or [PHONE] now",
        "[EMAIL] and [PHONE]",
        "nothing here",
        None,
    ]


def test_word_repetition_stats():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4]),
            "text": pa.array(["a b a b a", "x  y \t z", "", None]),
        }
    )
    out = word_repetition(t).to_pydict()
    assert out["n_words"] == [5, 3, 0, 0]
    assert out["n_uniq_words"] == [2, 3, 0, 0]
    assert out["repetitive"] == [True, False, False, False]


def test_shard_pack_sparse_skewed_ids(ray_session, tmp_path):
    """Range boundaries come from sampled order statistics, not from a
    dense-doc_id assumption: wildly sparse, clustered ids must still get
    exact prefix-sum shard ids AND a balanced partition split."""
    import numpy as np
    import pyarrow.parquet as pq

    from grate_ray.pipelines.llmprep import shard_pack

    # 600 docs: a dense cluster near 0, a hole of 10^9, a dense tail
    ids = np.concatenate(
        [np.arange(300), 1_000_000_000 + np.arange(300) * 7_919]
    )
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"w{i} " * (1 + i % 13) for i in range(600)]),
        }
    )
    d = tmp_path / "sparse"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    budget = 256
    df = (
        shard_pack(str(d), budget=budget, num_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(df) == 600
    start = df["n_tokens"].cumsum() - df["n_tokens"]
    assert (df["shard_id"].to_numpy() == (start // budget).to_numpy()).all()


def test_shard_pack_prefix_sum(ray_session, sf_dir):
    """Shard ids must equal the serial exclusive-prefix-sum assignment
    regardless of partitioning."""
    import numpy as np

    from grate_ray.pipelines.llmprep import shard_pack

    budget = 512
    df = (
        shard_pack(sf_dir, budget=budget, num_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    start = df["n_tokens"].cumsum() - df["n_tokens"]
    assert (df["shard_id"].to_numpy() == (start // budget).to_numpy()).all()
    # shards are contiguous, start at 0, and no shard except possibly the
    # last is underfull by more than one doc's tokens
    sid = df["shard_id"].to_numpy()
    assert sid[0] == 0
    assert (np.diff(np.unique(sid)) == 1).all()


def test_chunk_documents_overlap_and_edges(ray_session, tmp_path):
    """Chunks cover the doc with the declared overlap: stitching chunk k's
    first `stride` chars back together reconstructs the text; short and
    empty docs emit exactly one chunk."""
    import pyarrow.parquet as pq

    from grate_ray.pipelines.llmprep import chunk_documents

    texts = ["x" * 0, "ab", "c" * 200, "d" * 201, "".join(chr(97 + i % 26) for i in range(553))]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    df = (
        chunk_documents(str(d), chunk_size=200, stride=150)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for doc_id, text in enumerate(texts):
        g = df[df["doc_id"] == doc_id]
        want_n = max(1, -(-(len(text) - 50) // 150))
        assert g["n_chunks"].tolist() == [want_n] * want_n
        assert g["chunk_idx"].tolist() == list(range(want_n))
        # every chunk is the exact window
        for k, chunk in zip(g["chunk_idx"], g["chunk"]):
            assert chunk == text[k * 150 : k * 150 + 200]
        # stitch: firsts strides + last chunk == text
        chunks = g["chunk"].tolist()
        stitched = "".join(c[:150] for c in chunks[:-1]) + chunks[-1]
        assert stitched == text


def test_assemble_transcripts(ray_session):
    """Turns concat in turn_idx order per conversation, 'role: text'
    lines; null text/role coalesce to empty."""
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.llmprep import assemble_transcripts

    configure_shuffle(8)  # a Dataset captures its context at creation
    state = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["a", "b", "a", "a", "b"]),
                "turn_idx": pa.array([2, 0, 0, 1, 1], pa.int32()),
                "role": pa.array(["user", "system", "user", None, "tool"]),
                "text": pa.array(["three", "hi", "one", "two", None]),
            }
        )
    )
    df = (
        assemble_transcripts(state)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert df["conv_id"].tolist() == ["a", "b"]
    assert df["n_turns"].tolist() == [3, 2]
    assert df["transcript"].tolist() == [
        "user: one\n: two\nuser: three",
        "system: hi\ntool: ",
    ]


def test_bigram_lm_score_matches_reference(ray_session):
    """Tiny corpus scored against a plain-Python bigram LM with the same
    add-alpha smoothing; one-word doc excluded (no bigrams)."""
    import math
    from collections import Counter

    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.lm import bigram_lm_score

    configure_shuffle(8)
    texts = {
        1: "a b a b c",
        2: "a b c d",
        3: "c d c d",
        4: "solo",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    # reference model
    bgs = {k: list(zip(v.split(" "), v.split(" ")[1:])) for k, v in texts.items()}
    c2 = Counter(g for gs in bgs.values() for g in gs)
    c1 = Counter(g[0] for gs in bgs.values() for g in gs)
    vocab = {w for v in texts.values() for w in v.split(" ")}
    a, V = 0.5, len(vocab)
    exp = {
        k: round(
            sum(math.log(c1[g[0]] + a * V) - math.log(c2[g] + a) for g in gs)
            / len(gs),
            6,
        )
        for k, gs in bgs.items()
        if gs
    }
    out = (
        bigram_lm_score(ray.data.from_arrow(t), alpha=0.5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(out.index) == set(exp)
    for k, v in exp.items():
        assert out.loc[k, "avg_nll"] == v
        assert out.loc[k, "n_bigrams"] == len(bgs[k])


def test_bm25_topk_matches_reference(ray_session):
    """Random tiny corpus; distributed BM25 equals a plain-Python BM25
    with the same (round(score,6) desc, doc_id asc) ranking."""
    import math

    import numpy as np
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.search import bm25_topk

    configure_shuffle(8)
    rng = np.random.default_rng(7)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 12)))
        for _ in range(40)
    ]
    queries = {1: ["red", "blue"], 2: ["plum"]}
    k1, b, k = 1.2, 0.75, 4

    n = len(texts)
    avgdl = sum(len(t.split(" ")) for t in texts) / n
    tf = [
        {w: t.split(" ").count(w) for w in set(t.split(" "))} for t in texts
    ]
    df = {w: sum(1 for d in tf if w in d) for w in vocab}
    exp = {}
    for qid, terms in queries.items():
        scores = []
        for i, t in enumerate(texts):
            s = 0.0
            dl = len(t.split(" "))
            for w in terms:
                f = tf[i].get(w, 0)
                if f:
                    idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1)
                    s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
            if s > 0:
                scores.append((round(s, 6), i))
        scores.sort(key=lambda x: (-x[0], x[1]))
        exp[qid] = scores[:k]

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        bm25_topk(ray.data.from_arrow(t), queries, k=k, k1=k1, b=b)
        .to_pandas()
        .sort_values(["qid", "rank"])
    )
    for qid in queries:
        got = out[out["qid"] == qid]
        assert list(got["doc_id"]) == [i for _, i in exp[qid]]
        assert list(got["score"]) == [s for s, _ in exp[qid]]
        assert list(got["rank"]) == list(range(1, len(exp[qid]) + 1))


def test_stratified_sample_rates_and_fallback():
    """Keep-rule is hash&(denom-1) < rate[stratum]; unknown stratum uses
    the default (drop); determinism: same input, same rows."""
    import hashlib

    import numpy as np

    from grate_ray.functions.text import stratified_sample

    rng = np.random.default_rng(11)
    langs = ["en"] * 400 + ["de"] * 100 + ["xx"] * 50
    texts = [f"doc {i} {rng.integers(1 << 30)}" for i in range(len(langs))]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(langs)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    rates = {"en": 2, "de": 6}
    out = stratified_sample(t, rates=rates, denom=8)
    kept = set(out["doc_id"].to_pylist())
    for i, (txt, lg) in enumerate(zip(texts, langs)):
        d = hashlib.md5(txt.encode()).digest()
        bucket = int.from_bytes(d[8:16], "little") % 8
        want = bucket < rates.get(lg, 0)
        assert (i in kept) == want
    # unknown stratum fully dropped
    assert not any(l == "xx" for l in out["lang"].to_pylist())
    # rough rate sanity: en ~1/4, de ~3/4
    n_en = sum(1 for l in out["lang"].to_pylist() if l == "en")
    n_de = sum(1 for l in out["lang"].to_pylist() if l == "de")
    assert 60 <= n_en <= 140 and 55 <= n_de <= 95


def test_pack_sequences_covers_stream_exactly(ray_session, sf_dir):
    """Segments tile the global token stream with no gaps/overlap:
    per-doc seg_len sums to the doc's tokens, per-sequence seg_len sums
    to seq_len (except the last), offsets are contiguous, and
    boundary-spanning docs split correctly."""
    import numpy as np

    from grate_ray.pipelines.llmprep import pack_sequences

    S = 128
    df = (
        pack_sequences(sf_dir, seq_len=S, num_parts=8)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    assert (df["seg_len"] > 0).all()
    # per-doc: segments contiguous from offset 0
    for doc, g in df.groupby("doc_id"):
        assert g["doc_off"].iloc[0] == 0
        assert (
            g["doc_off"].to_numpy()[1:]
            == (g["doc_off"] + g["seg_len"]).to_numpy()[:-1]
        ).all()
        assert (np.diff(g["seq_id"].to_numpy()) == 1).all()
    # per-sequence: full except the last
    per_seq = df.groupby("seq_id")["seg_len"].sum()
    assert (per_seq.iloc[:-1] == S).all()
    assert 0 < per_seq.iloc[-1] <= S
    # total equals the whitespace token count of the corpus
    total = int(df["seg_len"].sum())
    assert total == int(per_seq.sum())
    assert df["seq_id"].min() == 0


def test_tfidf_topk_matches_reference(ray_session):
    """Random tiny corpus; distributed TF-IDF equals plain-Python
    tf*ln(N/df) with (round(score,6) desc, term asc) per-doc ranking."""
    import math

    import numpy as np
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.search import tfidf_topk

    configure_shuffle(8)
    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 15)))
        for _ in range(30)
    ]
    k = 3
    n = len(texts)
    tf = [
        {w: t.split(" ").count(w) for w in set(t.split(" "))} for t in texts
    ]
    df = {w: sum(1 for d in tf if w in d) for w in vocab}
    exp = {}
    for i, d in enumerate(tf):
        scored = sorted(
            ((round(f * math.log(n / df[w]), 6), w) for w, f in d.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        exp[i] = scored

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        tfidf_topk(ray.data.from_arrow(t), k=k)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    for i in exp:
        got = out[out["doc_id"] == i]
        assert list(got["term"]) == [w for _, w in exp[i]], i
        assert list(got["score"]) == [s for s, _ in exp[i]], i
        assert list(got["rank"]) == list(range(1, len(exp[i]) + 1))


def test_bpe_merges_match_serial(ray_session):
    """Distributed BPE equals a serial reference implementing the same
    greedy left-to-right merge with (count desc, pair asc) selection."""
    from collections import Counter

    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.bpe import bpe_train_merges

    configure_shuffle(8)  # before from_arrow: datasets snapshot the context
    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "wide wider widest low new",
    ]
    K = 4

    # serial reference over the word-frequency relation
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in wf}
    exp = []
    for step in range(K):
        pc_ = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pc_[(toks[i], toks[i + 1])] += wf[w]
        if not pc_:
            break
        (a, b), n = sorted(pc_.items(), key=lambda x: (-x[1], x[0]))[0]
        exp.append((step, a, b, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out

    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)})
    got = bpe_train_merges(
        ray.data.from_arrow(t).repartition(2), num_merges=K
    )
    rows = list(zip(got["step"].to_pylist(), got["lhs"].to_pylist(),
                    got["rhs"].to_pylist(), got["n"].to_pylist()))
    assert rows == exp


def test_dialog_pairs_windows(ray_session):
    """Context windows: oldest-first join of ≤window preceding turns,
    conversation boundaries respected, only assistant turns emit."""
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.llmprep import dialog_pairs

    configure_shuffle(8)
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "q1"),
        ("c1", 3, "assistant", "a1"),
        ("c1", 4, "user", "q2"),
        ("c1", 5, "assistant", "a2"),
        ("c2", 0, "assistant", "solo"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = (
        dialog_pairs(ray.data.from_arrow(t).repartition(3), window=3)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = {
        (r.conv_id, int(r.turn_idx)): (r.context, r.response)
        for r in out.itertuples()
    }
    assert got == {
        ("c1", 1): ("user: hi", "hello"),
        ("c1", 3): ("user: hi\nassistant: hello\nuser: q1", "a1"),
        ("c1", 5): ("user: q1\nassistant: a1\nuser: q2", "a2"),
        ("c2", 0): ("", "solo"),
    }


def test_bpe_encode_counts_matches_serial(ray_session):
    """Applying learned merges per doc equals serial greedy BPE token
    counts; docs with no words emit nothing."""
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.bpe import bpe_encode_counts

    configure_shuffle(8)
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    texts = ["low lower lowest", "we er rr", "", "   ", "low low"]

    def encode_word(w):
        toks = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    exp = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        if ws:
            exp[i] = sum(encode_word(w) for w in ws)

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        bpe_encode_counts(ray.data.from_arrow(t).repartition(2), merges)
        .to_pandas()
        .set_index("doc_id")["n_bpe_tokens"]
        .to_dict()
    )
    assert out == exp
