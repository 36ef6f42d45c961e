"""Deterministic 10x scale-up of /root/testdata/sf0.1 for the sf1 query
ladder (perf evidence only — correctness stays on the driver's sf0.01
oracle data, which this script never touches).

Design: each table is tiled 10x with id offsets, but copies are NOT
near-duplicates of their originals — otherwise every doc would sit in an
artificial 10-clique and the dedup pipelines would measure a corpus
whose duplicate density is 10x reality:

- documents: per-copy seeded word-order shuffle. Destroys shingle/n-gram
  overlap across copies (minhash/jaccard/simhash all see unrelated docs)
  while preserving vocabulary, word frequencies, doc lengths and the
  ORIGINAL duplicate structure inside each copy (a dup pair shuffled
  with the same per-copy seed stays a dup pair iff texts were equal;
  near-dups decay naturally). n_chars recomputed.
- embeddings: unit-norm Gaussian noise at equal power, renormalized to
  the original vector's norm: cross-copy cosine ~ 1/sqrt(2) ~ 0.71,
  far below near-dup thresholds, within-copy geometry preserved.
- events: ts shifted by copy * (span + 1h) and user_id offset per copy,
  so key cardinality and time range both grow 10x (honest grouped /
  windowed scaling, no hot-key inflation).

Usage: python tools/gen_sf1.py [out_dir=/tmp/sf1]
Idempotent via a sentinel file recording the generator version.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
VERSION = "gen_sf1-v2"


def gen_documents(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    texts = t["text"].to_pylist()
    parts = []
    for c in range(COPIES):
        rng = np.random.default_rng(1_000_003 * (c + 1))
        if c == 0:
            new_texts = texts
        else:
            new_texts = []
            for s in texts:
                w = s.split(" ") if s else []
                if len(w) > 1:
                    rng.shuffle(w)
                new_texts.append(" ".join(w))
        arr = pa.array(new_texts, pa.string())
        parts.append(
            pa.table(
                {
                    "doc_id": pa.compute.add(t["doc_id"], c * n),
                    "text": arr,
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": pa.compute.utf8_length(arr).cast(pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")


def gen_embeddings(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    mat = np.stack(
        t["embedding"].to_pandas().map(lambda v: np.asarray(v, np.float32))
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    parts = []
    for c in range(COPIES):
        if c == 0:
            m = mat
        else:
            rng = np.random.default_rng(7_000_037 * c)
            noise = rng.standard_normal(mat.shape).astype(np.float32)
            noise *= norms / np.maximum(
                np.linalg.norm(noise, axis=1, keepdims=True), 1e-9
            )
            m = mat + noise
            m *= norms / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-9
            )
        parts.append(
            pa.table(
                {
                    "vec_id": pa.compute.add(t["vec_id"], c * n),
                    "embedding": pa.array(list(m), pa.list_(pa.float32())),
                    "label": t["label"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")


def gen_events(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    ts = t["ts"].combine_chunks()
    lo = pa.compute.min(ts).as_py()
    hi = pa.compute.max(ts).as_py()
    span_us = int((hi - lo).total_seconds() * 1e6) + 3_600_000_000
    max_user = pa.compute.max(t["user_id"]).as_py() + 1
    i64 = ts.cast(pa.int64())
    parts = []
    for c in range(COPIES):
        parts.append(
            pa.table(
                {
                    "event_id": pa.compute.add(t["event_id"], c * n),
                    "ts": pa.compute.add(i64, c * span_us).cast(
                        pa.timestamp("us")
                    ),
                    "user_id": pa.compute.add(t["user_id"], c * max_user),
                    "event_type": t["event_type"],
                    "value": t["value"],
                    "props": t["props"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")


def gen_order_facts(out_dir: str) -> None:
    """Tile orders AND lineitem 10x with ALIGNED o_orderkey/l_orderkey
    offsets (the join key must stay consistent across copies) and
    per-copy o_custkey rotation so customer fan-out grows honestly.
    Dates/prices/quantities repeat verbatim — per-copy aggregates are
    identical by construction, which also makes 10x results
    spot-checkable. part/supp keys are left as-is (the dimensions are
    not tiled)."""
    orders = pq.read_table(f"{SRC}/orders.parquet")
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    max_ok = pa.compute.max(orders["o_orderkey"]).as_py() + 1
    max_ck = pa.compute.max(orders["o_custkey"]).as_py() + 1
    o_parts, l_parts = [], []
    for c in range(COPIES):
        ck = orders["o_custkey"]
        if c:
            # rotate custkeys so each copy redistributes orders over the
            # SAME customer set (cardinality fixed, fan-out x10)
            rot = (
                orders["o_custkey"].to_numpy(zero_copy_only=False) + 137 * c
            ) % max_ck
            ck = pa.array(rot.astype(np.int64))
        o_parts.append(
            pa.table(
                {
                    "o_orderkey": pa.compute.add(orders["o_orderkey"], c * max_ok),
                    "o_custkey": ck,
                    "o_orderstatus": orders["o_orderstatus"],
                    "o_totalprice": orders["o_totalprice"],
                    "o_orderdate": orders["o_orderdate"],
                    "o_orderpriority": orders["o_orderpriority"],
                }
            )
        )
        l_parts.append(
            pa.table(
                {
                    "l_orderkey": pa.compute.add(li["l_orderkey"], c * max_ok),
                    "l_partkey": li["l_partkey"],
                    "l_suppkey": li["l_suppkey"],
                    "l_linenumber": li["l_linenumber"],
                    "l_quantity": li["l_quantity"],
                    "l_extendedprice": li["l_extendedprice"],
                    "l_discount": li["l_discount"],
                    "l_tax": li["l_tax"],
                    "l_returnflag": li["l_returnflag"],
                    "l_linestatus": li["l_linestatus"],
                    "l_shipdate": li["l_shipdate"],
                }
            )
        )
    pq.write_table(pa.concat_tables(o_parts), f"{out_dir}/orders.parquet")
    pq.write_table(pa.concat_tables(l_parts), f"{out_dir}/lineitem.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sentinel = os.path.join(out_dir, "_GEN")
    if os.path.exists(sentinel) and open(sentinel).read() == VERSION:
        print(f"{out_dir} already generated ({VERSION})")
        return
    os.makedirs(out_dir, exist_ok=True)
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    gen_events(out_dir)
    # small dims copied verbatim: ladder queries don't read them, but a
    # complete dir lets any query run at sf1 if needed
    import shutil

    gen_order_facts(out_dir)
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
    ):
        shutil.copyfile(
            f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet"
        )
    with open(sentinel, "w") as f:
        f.write(VERSION)
    for name in ("documents", "embeddings", "events"):
        md = pq.ParquetFile(f"{out_dir}/{name}.parquet").metadata
        print(name, md.num_rows, "rows")


if __name__ == "__main__":
    main()
