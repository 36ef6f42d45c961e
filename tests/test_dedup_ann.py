"""Dedup family + ANN + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def test_exact_dedup_removes_planted_copies(ray_session, sf_dir):
    import __ray_entry__ as E

    out = E.queries()["dedup_exact"](sf_dir).to_pandas()
    # all copies (doc_id+1M) lose to the originals
    assert (out["doc_id"] < 1_000_000).all()
    assert out["doc_id"].is_unique


def test_ngram_jaccard_finds_planted_neardups(ray_session, sf_dir):
    import __ray_entry__ as E

    pairs = E.queries()["dedup_ngram_jaccard"](sf_dir).to_pandas()
    assert len(pairs) > 0
    # every planted (doc, doc+10M) pair with enough words must appear
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    planted = set()
    for i, txt in zip(docs.doc_id, docs.text):
        if i % 7 == 0 and len(txt.split(" ")) >= 20:
            planted.add((i, i + 10_000_000))
    found = set(zip(pairs.a, pairs.b))
    missing = {p for p in planted if p not in found}
    # truncation keeps 80% of words → trigram jaccard ≈ 0.75+; all planted
    # pairs of reasonable length should clear the 0.6 threshold
    assert not missing, f"missing planted pairs: {sorted(missing)[:5]}"
    assert (pairs["jaccard"] >= 0.6).all()


def test_minhash_recall_vs_exact(ray_session, sf_dir):
    import __ray_entry__ as E

    exact = E.queries()["dedup_ngram_jaccard"](sf_dir).to_pandas()
    mh = E.queries()["dedup_minhash"](sf_dir).to_pandas()
    strong = set(zip(*exact[exact.jaccard >= 0.75][["a", "b"]].T.values.tolist())) if len(exact) else set()
    got = set(zip(mh.a, mh.b))
    if strong:
        recall = len(strong & got) / len(strong)
        assert recall >= 0.9, f"minhash recall {recall}"
    # verified output never lies about jaccard
    assert (mh["jaccard"] >= 0.6).all()


def test_simhash_pairs_plausible(ray_session, sf_dir):
    import __ray_entry__ as E

    sh = E.queries()["dedup_simhash"](sf_dir).to_pandas()
    # identical docs (none) would be ham 0; truncated copies are close
    assert (sh["ham"] <= 8).all()
    planted_hits = ((sh.b - sh.a) == 10_000_000).sum()
    assert planted_hits > 0


def test_ann_bruteforce_self_consistency(ray_session, sf_dir):
    import __ray_entry__ as E

    out = E.queries()["ann_bruteforce"](sf_dir).to_pandas()
    qids = sorted(out.query_id.unique())
    assert all((out[out.query_id == q]["rank"].tolist() == [1, 2, 3, 4, 5]) for q in qids)
    # similarities non-increasing within each query
    for q in qids:
        sims = out[out.query_id == q].sort_values("rank")["sim"].tolist()
        assert sims == sorted(sims, reverse=True)
    assert (out.query_id != out.vec_id).all()


def test_ann_lsh_recall(ray_session, sf_dir):
    import __ray_entry__ as E

    bf = E.queries()["ann_bruteforce"](sf_dir).to_pandas()
    lsh = E.queries()["ann_lsh"](sf_dir).to_pandas()
    # bucketing trades recall for pruning; top-1 recall should be decent
    top1 = bf[bf["rank"] == 1][["query_id", "vec_id"]]
    hits = 0
    for q, v in zip(top1.query_id, top1.vec_id):
        cand = lsh[lsh.query_id == q]["vec_id"].tolist()
        hits += v in cand
    assert hits / max(1, len(top1)) >= 0.3


def test_multimodal_stub_contract(ray_session, sf_dir):
    import __ray_entry__ as E
    from grate_ray.functions.multimodal import MediaDecoder

    out = E.queries()["multimodal_features"](sf_dir).to_pandas()
    assert (out["valid_magic"] == 1).all()
    assert (out["n_bytes"] > 4).all()
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)


def test_binary_batches_stay_arrow(ray_session, sf_dir):
    from grate_ray.functions.multimodal import synthesize_binary_column

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(synthesize_binary_column, batch_format="pyarrow")
    b = next(iter(ds.iter_batches(batch_size=8, batch_format="pyarrow")))
    assert pa.types.is_binary(b.schema.field("payload").type)
    assert b["payload"][0].as_py().startswith(b"IMG0")


def test_dedup_embedding_planted_pairs(ray_session, sf_dir):
    import __ray_entry__ as E

    out = E.queries()["dedup_embedding"](sf_dir).to_pandas()
    # every planted (v, v+1M) pair survives the 0.9 threshold...
    assert (out["b"] - out["a"] == 1_000_000).all()
    assert (out["sim"] >= 0.9).all()
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    # ...and nothing else does (original max pairwise cosine ~0.51)
    assert len(out) == n


def test_frame_sampler_plumbing(ray_session, sf_dir):
    from grate_ray.functions.multimodal import FrameSampler, synthesize_binary_column

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(synthesize_binary_column, batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow"
    ).map_batches(
        FrameSampler, fn_constructor_kwargs={"frame_bytes": 8, "stride": 2},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    )
    b = next(iter(ds.iter_batches(batch_size=16, batch_format="pyarrow")))
    assert str(b.schema.field("frames").type) == "list<item: binary>"
    assert (np.array(b["n_frames"].to_pylist()) > 0).all()
    first = b["frames"][0].as_py()
    assert first[0].startswith(b"IMG0")  # frame 0 = payload head
    assert all(len(f) <= 8 for f in first)


def test_ngram_jaccard_matches_bruteforce_random(ray_session):
    """Seeded random corpus: pipeline output must equal an in-memory
    brute-force over ALL pairs (df_cap high enough to never drop a gram,
    so candidate generation must be lossless)."""
    import itertools

    rng = np.random.default_rng(123)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for _ in range(60)
    ]
    # planted near-dups: truncated copies (real pairs the pipeline MUST
    # find); random docs alone share almost no trigrams
    for i in range(0, 60, 4):
        w = texts[i].split(" ")
        texts.append(" ".join(w[: max(3, len(w) - 2)]))
    n = len(texts)
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import ngram_jaccard_pairs

    configure_shuffle(8)
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=16
    )
    got = ngram_jaccard_pairs(ds, threshold=0.2, df_cap=200).to_pandas()
    got_pairs = (
        {(a, b): round(j, 12) for a, b, j in zip(got["a"], got["b"], got["jaccard"])}
        if len(got)
        else {}
    )

    def grams(s):
        w = s.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    gsets = [grams(s) for s in texts]
    expect = {}
    for a, b in itertools.combinations(range(n), 2):
        inter = len(gsets[a] & gsets[b])
        union = len(gsets[a] | gsets[b])
        if union and inter / union >= 0.2:
            expect[(a, b)] = round(inter / union, 12)
    assert got_pairs == expect


def test_ann_ivf_recall(ray_session, sf_dir):
    import __ray_entry__ as E

    bf = E.queries()["ann_bruteforce"](sf_dir).to_pandas()
    ivf = E.queries()["ann_ivf"](sf_dir).to_pandas()
    top1 = bf[bf["rank"] == 1][["query_id", "vec_id"]]
    hits = 0
    for q, v in zip(top1.query_id, top1.vec_id):
        hits += v in ivf[ivf.query_id == q]["vec_id"].tolist()
    assert hits / max(1, len(top1)) >= 0.3


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_null_text():
    # SQL PARTITION BY text keeps NULLs as ONE group with NULL text; an
    # all-null block must not raise and the min doc_id must win the group
    import ray

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import exact_dedup

    configure_shuffle(8)  # keyed repartition needs HASH_SHUFFLE at ds creation

    t = pa.table(
        {
            "doc_id": pa.array([7, 3, 5, 2, 9], pa.int64()),
            "text": pa.array(["a", None, "a", None, None], pa.string()),
        }
    )
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [2, 5]
    assert out["text"].tolist()[0] is None and out["text"].tolist()[1] == "a"

    all_null = pa.table(
        {
            "doc_id": pa.array([4, 1], pa.int64()),
            "text": pa.array([None, None], pa.string()),
        }
    )
    out2 = exact_dedup(ray.data.from_arrow(all_null)).to_pandas()
    assert out2["doc_id"].tolist() == [1] and out2["text"].tolist() == [None]


def test_connected_components_chain_and_random(ray_session):
    """Multi-hop chains must collapse to one cluster (pairs alone can't
    see transitivity), cross-checked against a driver union-find on a
    deterministic random graph."""
    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import connected_components

    configure_shuffle(8)
    # chain 0-1-2-3-4 plus a triangle and an isolated pair
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    rng = np.random.default_rng(5)
    nodes = rng.choice(np.arange(100, 200), size=60, replace=False)
    for i in range(0, 40, 2):
        pairs.append((int(nodes[i]), int(nodes[i + 1])))
    for i in range(0, 30, 3):
        pairs.append((int(nodes[i]), int(nodes[i + 2])))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots
    expected = {x: find(x) for x in parent}

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    out = connected_components(ds).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == expected
    keep = set(out.loc[out["keep"] == 1, "doc_id"])
    assert keep == set(expected.values())


def test_decontaminate_flags_planted_overlaps(ray_session):
    """Train docs sharing >=2 word-trigrams with the bench set flag as
    contaminated; disjoint and single-hit docs do not; short docs (<3
    words) emit zero grams."""
    from grate_ray.functions.dedup import decontaminate

    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps over the lazy dog",
                        "pack my box with five dozen liquor jugs",
                    ]
                ),
            }
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
                "text": pa.array(
                    [
                        # full copy: many hits -> contaminated
                        "the quick brown fox jumps over the lazy dog",
                        # two shared trigrams -> contaminated at min_hits=2
                        "note the quick brown fox ran home",
                        # exactly one shared trigram -> clean
                        "xx yy pack my box zz ww",
                        # fully disjoint -> clean
                        "completely unrelated training document here",
                        # two words -> zero grams -> clean
                        "too short",
                    ]
                ),
            }
        )
    )
    out = decontaminate(train, bench, min_hits=2).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert list(out.index) == [10, 11, 12, 13, 14]
    assert out.loc[10, "contaminated"] == 1 and out.loc[10, "n_hits"] >= 5
    assert out.loc[11, "contaminated"] == 1 and out.loc[11, "n_hits"] == 2
    assert out.loc[12, "contaminated"] == 0 and out.loc[12, "n_hits"] == 1
    assert out.loc[13, "contaminated"] == 0 and out.loc[13, "n_hits"] == 0
    assert out.loc[14, "n_grams"] == 0 and out.loc[14, "contaminated"] == 0


def test_substring_dedup_flags_shared_spans(ray_session):
    """A doc sharing one 8-word window with a lower-id doc flags; the
    lower-id owner stays clean (keep-first); disjoint and short docs
    behave."""
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import substring_dedup

    configure_shuffle(8)
    span = "one two three four five six seven eight"
    texts = {
        1: f"intro {span} outro words here",      # owner (min id)
        2: f"totally different prefix {span}",     # shares the span -> flag
        3: "no overlap with anything else at all nine ten",  # clean
        4: "seven little words only here now",     # 6 words -> no spans
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    out = (
        substring_dedup(ray.data.from_arrow(t), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert 4 not in out.index  # <8 words: no spans, no row
    assert out.loc[1, "flagged"] == 0
    assert out.loc[2, "flagged"] == 1 and out.loc[2, "n_dup_spans"] >= 1
    assert out.loc[3, "flagged"] == 0 and out.loc[3, "n_dup_spans"] == 0
    # window counts: len(words) - 7
    assert out.loc[1, "n_spans"] == len(texts[1].split()) - 7
    assert out.loc[2, "n_spans"] == len(texts[2].split()) - 7


def test_kmeans_assign_matches_serial(ray_session):
    """Distributed partial-sum Lloyd equals a serial numpy Lloyd with the
    same seeded init, 6dp snapping, and fixed iterations — regardless of
    batch/partition boundaries."""
    from grate_ray.functions.ann import ivf_centroids, kmeans_assign

    rng = np.random.default_rng(29)
    dim, n, k, iters = 16, 400, 5, 3
    mat = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)

    cent = ivf_centroids(dim, k, seed=21)
    for _ in range(iters - 1):
        cells = np.round(mat @ cent.T, 6).argmax(axis=1)
        new = cent.copy()
        for c in range(k):
            m = cells == c
            if m.any():
                new[c] = mat[m].mean(axis=0)
        cent = np.round(new, 6)
    exp = np.round(mat @ cent.T, 6).argmax(axis=1)

    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    out = (
        kmeans_assign(
            ray.data.from_arrow(t).repartition(7), ncentroids=k, iters=iters,
            seed=21, dim=dim,
        )
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (out["cluster"].to_numpy() == exp).all()
    assert len(np.unique(exp)) > 1  # clustering is non-trivial


def test_semantic_dedup_matches_serial(ray_session):
    """SemDeDup (cluster then within-cluster keep-first cosine prune)
    equals a serial reference with the same seeded kmeans and 6dp cosine
    convention, regardless of partitioning; planted near-identical copies
    must be dropped."""
    from grate_ray.functions.ann import ivf_centroids, semantic_dedup

    rng = np.random.default_rng(31)
    dim, n, k, thr = 16, 300, 5, 0.95
    mat = rng.standard_normal((n, dim))
    # plant near-identical copies: rows n..n+49 copy rows 0..49 with a
    # tiny last-element nudge (cosine ≈ 1)
    copies = mat[:50].copy()
    copies[:, -1] += 0.01
    mat = np.vstack([mat, copies])
    ids = np.arange(len(mat), dtype=np.int64)

    # serial reference (iters=2: one update pass then assign)
    cent = ivf_centroids(dim, k, seed=21)
    for _ in range(1):
        cells = np.round(mat @ cent.T, 6).argmax(axis=1)
        new = cent.copy()
        for c in range(k):
            m = cells == c
            if m.any():
                new[c] = mat[m].mean(axis=0)
        cent = np.round(new, 6)
    cells = np.round(mat @ cent.T, 6).argmax(axis=1)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    exp_keep = np.ones(len(ids), dtype=np.int64)
    for c in range(k):
        idx = np.flatnonzero(cells == c)  # ids ascending
        sub = norm[idx]
        sims = np.round(sub @ sub.T, 6)
        dup = np.triu(sims >= thr, k=1).any(axis=0)
        exp_keep[idx] = (~dup).astype(np.int64)

    from grate_ray.context import configure_shuffle

    configure_shuffle(8)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    out = (
        semantic_dedup(
            ray.data.from_arrow(t).repartition(7), ncentroids=k, iters=2,
            seed=21, dim=dim, threshold=thr,
        )
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (out["cluster"].to_numpy() == cells).all()
    assert (out["keep"].to_numpy() == exp_keep).all()
    # every planted copy co-clusters with its original → dropped
    assert out.loc[n:, "keep"].sum() == 0
    assert out.loc[: n - 1, "keep"].sum() > 0


def test_pq_topk_matches_serial(ray_session):
    """PQ ADC top-k equals a serial reference with the same encode
    (argmin |c|²−2·x·c, 6dp-snapped dots, lower-code ties) and LUT-sum
    scoring; and PQ ranking correlates with exact dot ranking."""
    import numpy as np
    import ray.data

    from grate_ray.functions.ann import pq_codebooks, pq_encode_codes, pq_topk

    rng = np.random.default_rng(3)
    n, dim, m, ksub, k = 120, 64, 8, 16, 5
    mat = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    qsel = ids[ids % 40 == 0]
    qmat = mat[qsel]

    books = pq_codebooks(dim, m, ksub, seed=33)
    codes = pq_encode_codes(mat, books)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    # deterministic: re-encode identical
    assert (pq_encode_codes(mat, books) == codes).all()

    # serial ADC reference
    exp = {}
    for qi, qid in enumerate(qsel):
        lut = np.round(
            np.einsum("md,mkd->mk", qmat[qi].reshape(m, dim // m), books), 6
        )
        sc = np.round(lut[np.arange(m)[:, None], codes.T].sum(axis=0), 6)
        cand = [(s, v) for s, v in zip(sc, ids) if v != qid]
        cand.sort(key=lambda x: (-x[0], x[1]))
        exp[qid] = cand[:k]

    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    out = (
        pq_topk(
            ray.data.from_arrow(t).repartition(5), qsel, qmat,
            k=k, m=m, ksub=ksub, seed=33,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    for qid in qsel:
        g = out[out["query_id"] == qid]
        assert list(g["vec_id"]) == [v for _, v in exp[qid]], qid
        assert list(g["score"]) == [s for s, _ in exp[qid]], qid

    # quantized score is a usable proxy for the true dot product
    true = mat @ qmat[0]
    top_true = set(ids[np.argsort(-true)][:20]) - {qsel[0]}
    got_top = set(out[out["query_id"] == qsel[0]]["vec_id"])
    assert len(got_top & top_true) >= 1


def test_winnow_fingerprints_reference_and_guarantee(ray_session):
    """Winnowing equals a serial reference (per-window leftmost argmin,
    distinct positions), and satisfies the MOSS coverage guarantee: two
    docs sharing a run of >= w+k-1 words share at least one selected
    fingerprint; docs with fewer than w grams emit nothing."""
    import hashlib

    import numpy as np
    import ray.data

    from grate_ray.functions.dedup import winnow_fingerprints

    k, w = 4, 4

    def fp64(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")

    def serial(text: str):
        ws = text.split(" ")
        grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        hs = [fp64(g) for g in grams]
        sel = set()
        for s in range(len(hs) - w + 1):
            win = hs[s : s + w]
            sel.add(s + win.index(min(win)))
        return {(p, hs[p]) for p in sel}

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab, size=w + k - 1))  # guarantee run
    texts = [
        " ".join(rng.choice(vocab, size=30)) + " " + shared,
        shared + " " + " ".join(rng.choice(vocab, size=25)),
        " ".join(rng.choice(vocab, size=18)),
        "too short",  # < w grams → nothing
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = winnow_fingerprints(
        ray.data.from_arrow(t).repartition(2), k=k, w=w
    ).to_pandas()
    for i, text in enumerate(texts):
        got = {
            (int(r.pos), int(r.fp))
            for r in out[out["doc_id"] == i].itertuples()
        }
        assert got == serial(text), i
    # coverage guarantee: docs 0 and 1 share a fingerprint VALUE
    f0 = set(out[out["doc_id"] == 0]["fp"])
    f1 = set(out[out["doc_id"] == 1]["fp"])
    assert f0 & f1
    assert len(out[out["doc_id"] == 3]) == 0


def test_pagerank_matches_serial(ray_session):
    """3-round PageRank equals the serial reference with identical 6dp
    snapping; dangling mass drops; rank mass stays ≤ 1."""
    import numpy as np
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.graph import pagerank

    configure_shuffle(8)  # before from_arrow: datasets snapshot the context
    rng = np.random.default_rng(5)
    m = 60
    src = rng.integers(0, 25, m)
    dst = rng.integers(0, 25, m)
    edges = sorted(set(zip(src.tolist(), dst.tolist())))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: round(1.0 / n, 6) for v in nodes}
    for _ in range(3):
        acc = {v: 0.0 for v in nodes}
        for u, v in edges:
            acc[v] += r[u] / outdeg[u]
        r = {
            v: round((1.0 - 0.85) / n + 0.85 * acc[v], 6) for v in nodes
        }

    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        }
    )
    out = (
        pagerank(ray.data.from_arrow(t).repartition(3), iters=3)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert set(out) == set(nodes)
    for v in nodes:
        assert out[v] == r[v], v
    assert sum(out.values()) <= 1.0 + 1e-6


def test_chunk_dedup_serial_and_shift_resistance(ray_session):
    """chunk_dedup equals a serial reference (same gear table, window,
    mask rule) regardless of partitioning; and content-defined boundaries
    survive a PREFIX insertion — the property offset-based chunking lacks:
    a doc with bytes prepended still shares most chunk content with the
    original, so its chunks count as dups."""
    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import (
        CDC_MASK, CDC_SHIFT, CDC_TARGET, CDC_WINDOW, chunk_dedup, gear_table,
    )
    import hashlib

    rng = np.random.default_rng(41)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(40, 120))) for _ in range(30)
    ]
    # planted shifted copies: a prefix insertion re-offsets every byte
    for i in range(0, 30, 3):
        texts.append("PREFIX INSERTED HERE " + texts[i])
    n = len(texts)
    ids = np.arange(n, dtype=np.int64)

    G = gear_table()

    def serial_chunks(text: str) -> list[int]:
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        a = G[b]
        h = np.zeros(len(b), dtype=np.uint64)
        for k in range(CDC_WINDOW):
            h[k:] += a[: len(b) - k] << np.uint64(k)
        bd = ((h >> np.uint64(CDC_SHIFT)) & np.uint64(CDC_MASK)) == np.uint64(
            CDC_TARGET
        )
        idx = np.flatnonzero(bd)
        starts = np.concatenate([[0], idx + 1])
        ends = np.append(idx + 1, len(b))
        out = []
        raw = text.encode()
        for s, e in zip(starts, ends):
            if e > s:
                d = hashlib.md5(raw[s:e]).digest()
                out.append(int.from_bytes(d[8:16], "little"))
        return out

    all_chunks = {i: serial_chunks(t) for i, t in zip(ids, texts)}
    own = {}
    for i in sorted(all_chunks):
        for hsh in all_chunks[i]:
            own.setdefault(hsh, i)
    exp = {
        int(i): (len(ch), sum(1 for hsh in ch if own[hsh] < i))
        for i, ch in all_chunks.items()
    }

    configure_shuffle(8)
    t = pa.table({"doc_id": pa.array(ids), "text": texts})
    out = (
        chunk_dedup(ray.data.from_arrow(t).repartition(5))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    got = {int(i): (int(r.n_chunks), int(r.n_dup)) for i, r in out.iterrows()}
    assert got == exp
    # shift resistance: every prefixed copy still shares chunks
    copies = out.loc[30:]
    assert (copies["n_dup"] > 0).all()
    assert copies["n_dup"].sum() >= copies["n_chunks"].sum() * 0.5


def test_hashed_embeddings_serial_and_neardup_signal(ray_session):
    """Feature-hashing embeddings equal a per-doc serial reference (md5
    bit signs × word counts), and near-identical docs embed nearly
    parallel while unrelated docs do not."""
    import hashlib

    from grate_ray.functions.embed import EMBED_DIM, hashed_embed_batch, hashed_embeddings

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon",  # near-dup of 0
        "one two three four five six seven",
        "alpha alpha alpha",  # repeated word → count weighting
        "",
    ]

    def serial(text):
        v = np.zeros(EMBED_DIM, dtype=np.int64)
        for w in text.split(" "):
            if not w:
                continue
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
            for d in range(EMBED_DIM):
                v[d] += 1 if (h >> d) & 1 else -1
        return v

    got = hashed_embed_batch(texts)
    exp = np.stack([serial(t) for t in texts])
    assert (got == exp).all()

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return float(a @ b) / (na * nb)

    assert cos(got[0], got[1]) > 0.85
    assert cos(got[0], got[2]) < 0.6

    # Dataset path matches the batch kernel regardless of partitioning
    import pyarrow as _pa

    t = _pa.table({"doc_id": _pa.array(range(len(texts)), _pa.int64()),
                   "text": texts})
    ds_out = (
        hashed_embeddings(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(len(texts)):
        assert np.allclose(np.array(ds_out.loc[i, "embedding"]), exp[i])


def test_sparse_candidate_joins_survive_empty_partitions(ray_session):
    """Regression: relations far sparser than the partition count reach
    the verify joins as keyed-reduce outputs whose empty partitions are
    schema-less blocks (Ray 2.49 ignores a UDF's typed empty output),
    which crashed the join aggregator. The nonempty_blocks guard drops
    them zero-copy; output must be exact on a 4-doc corpus whose pair
    relation has 1-2 rows spread over 8+ partitions."""
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import ngram_jaccard_pairs

    configure_shuffle(32)  # BEFORE dataset creation (context freezes)
    texts = [
        "a b c d e f g",
        "a b c d e f g h",
        "x y z w q r s",
        "p q r s t u v",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5, df_cap=1000).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(0, 1)}
