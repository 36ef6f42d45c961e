"""Extraction pipelines: frame → sniff/decode → typed scan (S1-S4, T4-T7).

These recast the reference's file-extraction loop over the driver's test
tables: rows are framed into textual payloads (the "dropped files"),
pushed through the registry decode stage (sniff-by-parse, dead-letter on
unknown), and scanned back into typed columns — a full round trip whose
oracle is simply the original table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.decode import PayloadDecoder


def _add_grp_arrow(cols: list[str], key_col: str, group_mod: int):
    """Arrow-native grouping-key stage: select + one numpy mod, no pandas
    conversion."""

    def add_grp(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select(cols).append_column("grp", pa.array(key % group_mod))

    return add_grp


def join_lines(
    t: pa.Table,
    cols: list[str],
    sep: str = "\t",
    override: dict[str, "np.ndarray"] | None = None,
) -> "np.ndarray":
    """Vectorized str()-compatible row rendering: each row becomes one
    sep-joined line (numpy shortest-roundtrip float repr == Python
    ``str``, so payloads parse back to identical doubles and keep their
    inferred cell types). ``override`` substitutes a pre-rendered column
    (e.g. SST ``@idx`` references). Auto-width unicode only — no
    truncating fixed-width casts."""
    parts = []
    for c in cols:
        if override and c in override:
            parts.append(np.asarray(override[c], dtype="U"))
            continue
        col = t[c]
        ty = col.type
        v = col.to_numpy(zero_copy_only=False)
        if pa.types.is_floating(ty):
            parts.append(v.astype("U32"))
        elif pa.types.is_integer(ty):
            parts.append(v.astype("U21"))
        elif pa.types.is_boolean(ty):
            parts.append(np.where(v, "True", "False"))
        else:
            parts.append(v.astype("U"))
    line = parts[0]
    for p in parts[1:]:
        line = np.char.add(np.char.add(line, sep), p)
    return line


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

    def frame(t: pa.Table) -> pa.Table:
        t = t.sort_by(key_col)
        lines = join_lines(t, cols, sep)
        return pa.table(
            {
                "payload_id": pa.array([int(t["grp"][0].as_py())], pa.int64()),
                "payload": pa.array(["\n".join(lines.tolist())], pa.string()),
            }
        )

    return (
        ds.map_batches(
            _add_grp_arrow(cols, key_col, group_mod), batch_format="pyarrow"
        )
        .groupby("grp")
        .map_groups(frame, batch_format="pyarrow")
    )


def decode_payloads(
    payloads: ray.data.Dataset, ncols: int, concurrency=None
) -> ray.data.Dataset:
    """Decode/sniff is a STATELESS stage (SURVEY.md §7.2) — the registry
    import is the only per-worker setup, so a pickled callable instance on
    plain tasks beats paying actor-pool startup per pipeline."""
    return payloads.map_batches(
        PayloadDecoder(ncols), batch_format="pyarrow"
    )


def scan_typed(
    decoded: ray.data.Dataset,
    names: list[str],
    types: list[pa.DataType],
    strict: bool = False,
) -> ray.data.Dataset:
    """Typed extraction of decoded string cells (≅ ``Scan``).

    ``strict=False`` (default): the lenient parse-from-string variant
    (/root/reference/simple/simple.go:74-108) — Arrow string→typed casts,
    a malformed cell fails the whole batch cast (caller guarantees clean
    cells). Timestamp destinations are REJECTED up front, mirroring the
    reference's lenient scan refusing ``*time.Time``
    (/root/reference/simple/simple.go:99) — use ``strict=True`` for
    typed timestamp extraction (the commonxl matrix supports it,
    sheet.go:208-213).

    ``strict=True``: the commonxl ``Scan`` contract
    (/root/reference/commonxl/sheet.go:178-222) — a cell that does not
    parse as its declared type is a per-ROW error; such rows are routed
    OUT (dead-letter semantics) and only cleanly-typed rows are returned.
    Detection is vectorized (pandas to_numeric/to_datetime coercion)."""
    import numpy as np
    import pandas as pd

    if not strict:
        for typ in types:
            if pa.types.is_timestamp(typ):
                raise TypeError(
                    "lenient Scan cannot extract into timestamps "
                    "(simple.go:99 contract); use strict=True"
                )

    def cast(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["format"], "deadletter"))
        out = {}
        for i, (name, typ) in enumerate(zip(names, types)):
            out[name] = t[f"c{i}"].cast(typ)
        return pa.table(out)

    def cast_strict(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["format"], "deadletter"))
        if t.num_rows == 0:
            return pa.table(
                {n: pa.array([], ty) for n, ty in zip(names, types)}
            )
        ok = np.ones(t.num_rows, dtype=bool)
        parsed: dict[str, pd.Series] = {}
        for i, (name, typ) in enumerate(zip(names, types)):
            s = t[f"c{i}"].to_pandas()
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                v = pd.to_numeric(s, errors="coerce")
                if pa.types.is_integer(typ):
                    frac = v.notna() & (v != np.floor(v))
                    v[frac] = np.nan
                ok &= v.notna().to_numpy() | s.isna().to_numpy()
            elif pa.types.is_timestamp(typ):
                v = pd.to_datetime(s, errors="coerce", format="ISO8601")
                ok &= v.notna().to_numpy() | s.isna().to_numpy()
            else:
                v = s
            parsed[name] = v
        out = {}
        for name, typ in zip(names, types):
            out[name] = pa.array(parsed[name][ok], from_pandas=True).cast(typ)
        return pa.table(out)

    return decoded.map_batches(
        cast_strict if strict else cast, batch_format="pyarrow"
    )


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


def frame_books(
    ds: ray.data.Dataset,
    cols: list[str],
    group_mod: int,
    key_col: str,
    name_col: str,
    hidden_names: frozenset[str] = frozenset(),
    styles: list[str] | None = None,
) -> ray.data.Dataset:
    """Frame rows into MULTI-TABLE container payloads (S5): one book per
    ``key % group_mod`` group; inside each book, one named table per
    distinct ``name_col`` value (≅ a workbook of sheets); names in
    ``hidden_names`` are marked hidden (S11)."""
    from ..sources.workbook import encode_book

    def frame(t: pa.Table) -> pa.Table:
        t = t.sort_by(key_col)
        lines = join_lines(t, cols)
        nm = t[name_col].to_numpy(zero_copy_only=False).astype("U")
        sections = []
        for name in sorted(np.unique(nm).tolist()):
            idx = np.flatnonzero(nm == name)
            sections.append(
                (name, name in hidden_names, lines[idx].tolist())
            )
        return pa.table(
            {
                "payload_id": pa.array([int(t["grp"][0].as_py())], pa.int64()),
                "payload": pa.array(
                    [encode_book(sections, styles=styles)], pa.string()
                ),
            }
        )

    return (
        ds.map_batches(
            _add_grp_arrow(cols, key_col, group_mod), batch_format="pyarrow"
        )
        .groupby("grp")
        .map_groups(frame, batch_format="pyarrow")
    )


def frame_sst_books(
    ds: ray.data.Dataset,
    cols: list[str],
    dict_col: str,
    group_mod: int,
    key_col: str,
    name_col: str,
) -> ray.data.Dataset:
    """Frame rows into shared-string books (S6): per book, the distinct
    values of ``dict_col`` become the ``#strings`` dictionary (sorted —
    deterministic) and every cell of that column is written as an
    ``@<idx>`` reference (≅ LabelSst cells referencing the workbook SST,
    /root/reference/xls/sheets.go:307-322)."""
    from ..sources.sst import encode_sst_book

    def frame(t: pa.Table) -> pa.Table:
        t = t.sort_by(key_col)
        vals = t[dict_col].to_numpy(zero_copy_only=False).astype("U")
        strings_arr = np.unique(vals)  # sorted — deterministic
        # vectorized @idx reference encoding via searchsorted
        refs = np.char.add(
            "@", np.searchsorted(strings_arr, vals).astype("U10")
        )
        lines = join_lines(t, cols, override={dict_col: refs})
        nm = t[name_col].to_numpy(zero_copy_only=False).astype("U")
        sections = []
        for name in sorted(np.unique(nm).tolist()):
            idx = np.flatnonzero(nm == name)
            sections.append((name, False, lines[idx].tolist()))
        return pa.table(
            {
                "payload_id": pa.array([int(t["grp"][0].as_py())], pa.int64()),
                "payload": pa.array(
                    [encode_sst_book(strings_arr.tolist(), sections)],
                    pa.string(),
                ),
            }
        )

    return (
        ds.map_batches(
            _add_grp_arrow(cols, key_col, group_mod), batch_format="pyarrow"
        )
        .groupby("grp")
        .map_groups(frame, batch_format="pyarrow")
    )


def workbook_sst_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """S6 round trip: customer framed as shared-string books (mktsegment
    dictionary-referenced), registry-sniffed (sst_book outranks book),
    refs resolved against the per-payload dictionary, typed scan back —
    the oracle is the original table."""
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)
    books = frame_sst_books(
        ds, cols, dict_col="c_mktsegment", group_mod=8,
        key_col="c_custkey", name_col="c_mktsegment",
    )
    decoded = decode_payloads(books, ncols=5)
    return scan_typed(
        decoded, cols,
        [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()],
    )


def workbook_get_building(sf_dir: str) -> ray.data.Dataset:
    """S5 `Get`: frame customer into multi-table books keyed by market
    segment, then extract ONE named table from every book and scan it
    typed — the List-then-Get flow of /root/reference/grate.go:12-21."""
    from ..sources.workbook import get_table

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)
    books = frame_books(
        ds, cols, group_mod=8, key_col="c_custkey", name_col="c_mktsegment",
        hidden_names=frozenset({"FURNITURE"}),
    )
    decoded = decode_payloads(books, ncols=5)
    got = decoded.map_batches(
        lambda t: get_table(t, "BUILDING"), batch_format="pyarrow"
    )
    return scan_typed(
        got, cols,
        [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()],
    )


def workbook_list_visible(sf_dir: str) -> ray.data.Dataset:
    """S5 `List` + S11 hidden filter: list visible table names across all
    books; count books per table name."""
    from ray.data.aggregate import Count

    from ..sources.workbook import list_tables

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)
    books = frame_books(
        ds, cols, group_mod=8, key_col="c_custkey", name_col="c_mktsegment",
        hidden_names=frozenset({"FURNITURE"}),
    )
    decoded = decode_payloads(books, ncols=5)
    listed = decoded.map_batches(
        lambda t: list_tables(t, include_hidden=False), batch_format="pyarrow"
    )
    return listed.groupby("table_name").aggregate(Count(alias_name="n_books"))


def scan_strict_customer(sf_dir: str) -> ray.data.Dataset:
    """T7 strict ``Scan``: frame customer with deliberately-corrupted
    acctbal cells (every 11th key), strict-scan routes those ROWS out —
    only cleanly-typed rows survive (≅ commonxl's wrong-type errors,
    /root/reference/commonxl/sheet.go:178-222)."""
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c_acctbal"] = df["c_acctbal"].astype(str)
        df.loc[df["c_custkey"] % 11 == 0, "c_acctbal"] = "N/A"
        return df

    payloads = frame_rows(
        ds.map_batches(corrupt, batch_format="pandas"),
        cols, group_mod=16, key_col="c_custkey", sep=",",
    )
    decoded = decode_payloads(payloads, ncols=5)
    return scan_typed(
        decoded, cols,
        [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()],
        strict=True,
    )


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


STYLE_SIDECAR = [
    "numfmt 164 #,##0.00",
    'numfmt 165 "$"#,##0.00',
    "numfmt 166 0.00%",
    "stylexf 0 0",
    "stylexf 2 1",
    "cellxf 9 0 0",    # apply off → strips to General (workbook.go:149-152)
    "cellxf 164 1 1",  # custom comma-grouped
    "cellxf 2 1 0",    # built-in 0.00
    "cellxf 165 1 1",  # custom currency
    "cellxf 166 1 0",  # custom percent
]


class StyledRenderer:
    """S7 apply stage (actor pool): parse each ingest unit's styles
    sidecar ONCE (cached per actor by sidecar text — ST1), then resolve
    every cell's style index through the xfs table and render the value
    column via the T8 compiler, one vectorized ``render_column`` per
    distinct format in the batch."""

    def __init__(self):
        self._cache: dict[str, object] = {}

    def _sidecar(self, text: str):
        sc = self._cache.get(text)
        if sc is None:
            from ..state.styles import parse_styles

            sc = parse_styles(text.split("\n"))
            self._cache[text] = sc
        return sc

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.format import _render_float_general
        from ..state.styles import format_codes, format_ids, render_styled

        t = t.filter(pc.is_valid(t["styles"]))
        keys = t["c0"].combine_chunks().cast(pa.int64())
        vals = t["c1"].combine_chunks().cast(pa.float64())
        sidx = t["c2"].combine_chunks().cast(pa.int64())
        out_id = np.empty(len(t), dtype=np.int32)
        out_code = np.empty(len(t), dtype=object)
        out_render = np.empty(len(t), dtype=object)
        sty = t["styles"].to_pylist()
        order = np.argsort(np.asarray(sty, dtype=object), kind="stable")
        pos = 0
        arr = np.asarray(sty, dtype=object)[order]
        while pos < len(arr):
            end = pos
            while end < len(arr) and arr[end] == arr[pos]:
                end += 1
            rows = pa.array(order[pos:end], pa.int64())
            sc = self._sidecar(arr[pos])
            si, v = sidx.take(rows), vals.take(rows)
            out_id[order[pos:end]] = format_ids(sc, si).to_numpy()
            out_code[order[pos:end]] = format_codes(sc, si).to_numpy(
                zero_copy_only=False
            )
            rendered = render_styled(sc, v, si).to_numpy(zero_copy_only=False)
            # fmt 0 (General) renders through the vectorized General
            # kernel for exact Strings() parity, not the numfmt planner
            fid = sc.xfs[np.asarray(si)]
            gmask = fid == 0
            if gmask.any():
                gen = _render_float_general(
                    v.take(pa.array(np.flatnonzero(gmask), pa.int64()))
                ).to_numpy(zero_copy_only=False)
                rendered = rendered.copy()
                rendered[gmask] = gen
            out_render[order[pos:end]] = rendered
            pos = end
        return pa.table(
            {
                "c_custkey": keys,
                "fmt_id": pa.array(out_id, pa.int32()),
                "fmt_code": pa.array(out_code, pa.string()),
                "rendered": pa.array(out_render, pa.string()),
            }
        )


def styled_render(sf_dir: str) -> ray.data.Dataset:
    """S7 end-to-end: customer framed into books that CARRY a styles
    sidecar (custom numFmts + stylexf/cellxf inheritance), decoded by the
    registry, then rendered through each cell's resolved style — the
    full parseStyles → xfs → Formatter.Apply flow of the reference
    (/root/reference/xlsx/workbook.go:104-182, commonxl/formats.go)."""
    import pandas as pd  # noqa: F401  (frame_books dependency)

    cols = ["c_custkey", "c_acctbal"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)

    def add_style(df):
        df = df.copy()
        df["style_idx"] = (df["c_custkey"] % 5).astype("int64")
        return df

    framed = frame_books(
        ds.map_batches(add_style, batch_format="pandas"),
        ["c_custkey", "c_acctbal", "style_idx"],
        group_mod=8,
        key_col="c_custkey",
        name_col="style_idx",
        styles=STYLE_SIDECAR,
    )
    decoded = decode_payloads(framed, ncols=3)
    return decoded.map_batches(
        StyledRenderer, batch_format="pyarrow", concurrency=(1, 4)
    )


def scan_lenient_customer(sf_dir: str) -> ray.data.Dataset:
    """T7 lenient ``Scan``: frame customer rows as CSV payloads, decode
    through the sniffing registry, then parse-from-string typed
    extraction (≅ the simple driver's lenient Scan,
    /root/reference/simple/simple.go:74-108) — Arrow casts per column,
    no per-row error routing (the caller guarantees clean cells; the
    timestamp-destination refusal at simple.go:99 is enforced by
    scan_typed and pytest-covered)."""
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)

    # frame_rows stringifies at the payload edge (str(float) round-trips
    # exactly through the lenient parse)
    payloads = frame_rows(ds, cols, group_mod=16, key_col="c_custkey", sep=",")
    decoded = decode_payloads(payloads, ncols=5)
    return scan_typed(
        decoded, cols,
        [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()],
        strict=False,
    )
