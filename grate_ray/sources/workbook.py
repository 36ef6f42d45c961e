"""Multi-table container source — the reference's core Source abstraction
(S5) recast for framed text payloads.

A "book" payload is a container of NAMED tables, the analogue of a
workbook of sheets (`List`/`Get` interface, /root/reference/grate.go:12-21;
xlsx workbook open /root/reference/xlsx/xlsx.go:44-133; sheet listing with
the hidden-state filter /root/reference/xls/sheets.go:15-34):

    #table <name> [hidden]
    <tsv rows>
    #table <name2>
    ...

``decode_book`` registers in the format registry at priority 3 (a
container format outranks the plaintext formats, like xlsx=5 vs tsv=10
in the reference registry, grate.go:83-92) and sniffs by the ``#table ``
header. Each section body must pass the same >80% column-count heuristic
as the plaintext decoders; the decoded grid carries ``_table`` /
``_hidden`` metadata columns that the decode stage surfaces as
``table_name`` / ``hidden``.

The `List`/`Get` surface (S11 hidden filter included):

- ``list_tables(decoded, include_hidden=False)`` ≅ ``Source.List`` /
  ``ListHidden`` (/root/reference/xls/sheets.go:15-34): table names per
  payload, hidden ones excluded unless asked.
- ``get_table(decoded, name)`` ≅ ``Source.Get``: the named table's rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .registry import NotInFormat, register
from .textual import _to_table

HEADER = "#table "
STYLES_HEADER = "#styles"


def encode_book(
    sections: list[tuple[str, bool, list[str]]],
    styles: list[str] | None = None,
) -> str:
    """sections = [(name, hidden, tsv_lines)] → one book payload.
    ``styles`` rows (S7 sidecar, see ``state/styles.py``) are emitted as
    a leading ``#styles`` block — per-ingest-unit state, like the xlsx
    styles part parsed before any sheet (workbook.go:72-78)."""
    out: list[str] = []
    if styles:
        out.append(STYLES_HEADER)
        out.extend(styles)
    for name, hidden, lines in sections:
        out.append(f"{HEADER}{name} hidden" if hidden else f"{HEADER}{name}")
        out.extend(lines)
    return "\n".join(out)


def decode_book(payload: str) -> pa.Table:
    """Parse a book payload into one grid with `_table`/`_hidden`
    metadata columns. All sections must share one column count (the
    engine's fixed-width decode contract); each section body passes the
    same 80% heuristic as the plaintext decoders."""
    lines = payload.split("\n")
    styles_rows: list[str] = []
    if lines and lines[0] == STYLES_HEADER:
        i = 1
        while i < len(lines) and not lines[i].startswith(HEADER):
            if lines[i]:
                styles_rows.append(lines[i])
            i += 1
        lines = lines[i:]
    if not lines or not lines[0].startswith(HEADER):
        raise NotInFormat("no #table header")
    sections: list[tuple[str, bool, list[str]]] = []
    name, hidden, body = None, False, []
    for ln in lines:
        if ln.startswith(HEADER):
            if name is not None:
                sections.append((name, hidden, body))
            head = ln[len(HEADER):].strip()
            hidden = head.endswith(" hidden")
            name = head[: -len(" hidden")] if hidden else head
            body = []
        else:
            body.append(ln)
    if name is not None:
        sections.append((name, hidden, body))

    parts: list[pa.Table] = []
    width = None
    for name, hidden, body in sections:
        rows = [ln.rstrip("\r").split("\t") for ln in body if ln != ""]
        t = _to_table(rows)  # 80% heuristic; raises NotInFormat
        if width is None:
            width = t.num_columns - 1
        elif t.num_columns - 1 != width:
            raise NotInFormat(
                f"section {name!r} width {t.num_columns - 1} != {width}"
            )
        t = t.append_column("_table", pa.array([name] * t.num_rows, pa.string()))
        t = t.append_column("_hidden", pa.array([hidden] * t.num_rows, pa.bool_()))
        if styles_rows:
            sidecar = "\n".join(styles_rows)
            t = t.append_column(
                "_styles", pa.array([sidecar] * t.num_rows, pa.string())
            )
        parts.append(t)
    if not parts:
        raise NotInFormat("empty book")
    return pa.concat_tables(parts)


def list_tables(decoded: pa.Table, include_hidden: bool = False) -> pa.Table:
    """``List`` over a decoded batch: (payload_id, table_name) of every
    table, hidden ones filtered unless ``include_hidden`` (S11,
    /root/reference/xls/sheets.go:15-34). Vectorized distinct."""
    t = decoded.filter(pc.equal(decoded["format"], "book"))
    if not include_hidden:
        t = t.filter(pc.invert(pc.fill_null(t["hidden"], False)))
    import pandas as pd

    df = pd.DataFrame(
        {
            "payload_id": t["payload_id"].to_pandas(),
            "table_name": t["table_name"].to_pandas(),
        }
    ).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def get_table(decoded: pa.Table, name: str) -> pa.Table:
    """``Get`` over a decoded batch: the named table's rows (hidden
    tables are still gettable by name, as in the reference)."""
    return decoded.filter(pc.equal(decoded["table_name"], name))


register("book", 3, decode_book)
