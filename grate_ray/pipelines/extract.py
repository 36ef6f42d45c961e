"""Extraction pipelines: frame → sniff/decode → typed scan (S1-S4, T4-T7).

These recast the reference's file-extraction loop over the driver's test
tables: rows are framed into textual payloads (the "dropped files"),
pushed through the registry decode stage (sniff-by-parse, dead-letter on
unknown), and scanned back into typed columns — a full round trip whose
oracle is simply the original table.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.decode import PayloadDecoder


def frame_rows(
    ds: ray.data.Dataset,
    cols: list[str],
    group_mod: int,
    key_col: str,
    sep: str = "\t",
) -> ray.data.Dataset:
    """Frame table rows into payloads: one payload per ``key % group_mod``
    group, each a sep-joined text grid (≅ writing a .tsv file per shard,
    /root/reference/cmd/grate2tsv/main.go:231-259)."""

    def add_grp(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["grp"] = (df[key_col] % group_mod).astype("int64")
        return df

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col)
        lines = g[cols].astype(str).agg(sep.join, axis=1)
        return pd.DataFrame(
            {"payload_id": [int(g["grp"].iloc[0])], "payload": ["\n".join(lines)]}
        )

    return (
        ds.map_batches(add_grp, batch_format="pandas")
        .groupby("grp")
        .map_groups(frame, batch_format="pandas")
    )


def decode_payloads(
    payloads: ray.data.Dataset, ncols: int, concurrency=(1, 4)
) -> ray.data.Dataset:
    return payloads.map_batches(
        PayloadDecoder,
        fn_constructor_args=(ncols,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def scan_typed(
    decoded: ray.data.Dataset, names: list[str], types: list[pa.DataType]
) -> ray.data.Dataset:
    """Typed extraction of decoded string cells (≅ ``Scan``,
    /root/reference/commonxl/sheet.go:178-222 — the lenient parse-from-
    string variant, simple/simple.go:74-108, via Arrow string→typed casts)."""

    def cast(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["format"], "deadletter"))
        out = {}
        for i, (name, typ) in enumerate(zip(names, types)):
            out[name] = t[f"c{i}"].cast(typ)
        return pa.table(out)

    return decoded.map_batches(cast, batch_format="pyarrow")


def roundtrip(
    sf_dir: str,
    table: str,
    cols: list[str],
    types: list[pa.DataType],
    key_col: str,
    group_mod: int = 8,
    sep: str = "\t",
) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)
    payloads = frame_rows(ds, cols, group_mod, key_col, sep=sep)
    decoded = decode_payloads(payloads, ncols=len(cols))
    return scan_typed(decoded, cols, types)


def sniff_mixed_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministically frame each document as tsv / csv / malformed by
    doc_id % 3, sniff via the registry, count per detected format.
    Malformed payloads have no dominant column count (the >80% heuristic
    rejects them) and must dead-letter, never crash (FIXTURES.md F4)."""

    def mk_payloads(df: pd.DataFrame) -> pd.DataFrame:
        m = df["doc_id"] % 3
        fields = [
            df["doc_id"].astype(str),
            df["lang"].astype(str),
            df["source"].astype(str),
            df["n_chars"].astype(str),
        ]
        tsv = fields[0] + "\t" + fields[1] + "\t" + fields[2] + "\t" + fields[3]
        csvp = fields[0] + "," + fields[1] + "," + fields[2] + "," + fields[3]
        bad = "x\nx,x\nx,x,x\nx"  # counts {1:2, 2:1, 3:1} → no format accepts
        payload = tsv.where(m == 0, csvp.where(m == 1, bad))
        return pd.DataFrame({"payload_id": df["doc_id"], "payload": payload})

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )
    decoded = decode_payloads(ds.map_batches(mk_payloads, batch_format="pandas"), ncols=4)

    # one decoded row per payload here (single-line payloads) except
    # dead-letters which are also one row → count by format
    from ray.data.aggregate import Count

    return decoded.groupby("format").aggregate(Count(alias_name="n"))
