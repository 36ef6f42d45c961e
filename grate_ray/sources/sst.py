"""Shared-string table (S6) as a first-class stage.

The reference builds a per-workbook string dictionary ONCE and every sheet
resolves cells by index into it (xlsx SAX scan
/root/reference/xlsx/workbook.go:184-219; xls SST parse with continuation
records /root/reference/xls/strings.go:137-246; LabelSst resolution with
the bounds check that makes an invalid index a hard error,
/root/reference/xls/sheets.go:307-322).

Recast: an ``sst book`` payload opens with a ``#strings <n>`` section — the
per-ingest-unit dictionary, parsed once per payload — followed by a normal
multi-table book (sources/workbook.py) whose cells may be ``@<idx>``
references into it. Decoding resolves references vectorized
(``dictionary.take``); an out-of-range or malformed index raises
``UnknownFormat`` (the whole payload dead-letters — the engine's hardened
version of the reference's hard error; it must NOT fall through to another
format, which is why it is not ``NotInFormat``).

``SharedStringResolver`` is the same lookup as a standalone actor-pool
stage for pipelines where the dictionary is a broadcast sidecar rather
than inline: ``ray.put`` the dictionary once, each actor fetches it once
in ``__init__`` (zero-copy from the object store), every batch resolves
index columns by ``take`` — the ST1 load-once pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .registry import NotInFormat, UnknownFormat, register

STRINGS_HEADER = "#strings "


def encode_sst_book(
    strings: list[str], sections: list[tuple[str, bool, list[str]]]
) -> str:
    """strings + [(name, hidden, tsv_lines_with_@refs)] → one payload."""
    from .workbook import encode_book

    head = [f"{STRINGS_HEADER}{len(strings)}"] + list(strings)
    return "\n".join(head) + "\n" + encode_book(sections)


def resolve_refs(
    col: pa.Array | pa.ChunkedArray, dictionary: pa.Array
) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``@<idx>`` → dictionary[idx]; non-ref cells pass through.
    Out-of-range / malformed refs raise UnknownFormat (hard error, mirrors
    /root/reference/xls/sheets.go:312-314)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    is_ref = pc.starts_with(pc.fill_null(col, ""), "@")
    if not pc.any(is_ref).as_py():
        return col
    idx_str = pc.if_else(is_ref, pc.utf8_slice_codeunits(col, 1), None)
    try:
        idx = pc.cast(idx_str, pa.int64())
    except pa.ArrowInvalid as e:
        raise UnknownFormat(f"malformed shared-string ref: {e}") from None
    lo, hi = pc.min(idx).as_py(), pc.max(idx).as_py()
    if lo is not None and (lo < 0 or hi >= len(dictionary)):
        raise UnknownFormat(
            f"shared-string index out of range: [{lo}, {hi}] vs "
            f"{len(dictionary)} strings"
        )
    resolved = dictionary.take(pc.fill_null(idx, 0))
    return pc.if_else(is_ref, resolved, col)


def decode_sst_book(payload: str) -> pa.Table:
    """Parse the ``#strings`` dictionary once, decode the table sections,
    resolve every cell column's refs against the dictionary."""
    if not payload.startswith(STRINGS_HEADER):
        raise NotInFormat("no #strings header")
    nl = payload.find("\n")
    head = payload[len(STRINGS_HEADER) : nl if nl >= 0 else len(payload)]
    try:
        n = int(head.strip())
    except ValueError:
        raise NotInFormat("bad #strings count") from None
    rest = payload[nl + 1 :] if nl >= 0 else ""
    lines = rest.split("\n")
    if len(lines) < n:
        raise NotInFormat("truncated #strings section")
    # lazy: workbook may still be mid-import when the registry installs us
    from .workbook import decode_book

    dictionary = pa.array(lines[:n], pa.string())
    body = "\n".join(lines[n:])
    grid = decode_book(body)  # raises NotInFormat on a non-book body
    for name in grid.column_names:
        if name.startswith("c"):
            i = grid.column_names.index(name)
            grid = grid.set_column(i, name, resolve_refs(grid[name], dictionary))
    return grid


class SharedStringResolver:
    """Actor-pool stage: broadcast dictionary loaded once per actor
    (``ray.get`` of a ``ray.put`` ref in ``__init__`` — zero-copy, shared
    by every actor on a node), index columns resolved per batch by
    ``take``. Use for sidecar dictionaries shared across many payloads;
    inline per-payload dictionaries go through ``decode_sst_book``."""

    def __init__(self, dict_ref, cols: list[str]):
        import ray

        self.dictionary: pa.Array = ray.get(dict_ref)
        self.cols = cols

    def __call__(self, t: pa.Table) -> pa.Table:
        for name in self.cols:
            i = t.column_names.index(name)
            idx = t[name]
            if isinstance(idx, pa.ChunkedArray):
                idx = idx.combine_chunks()
            lo, hi = pc.min(idx).as_py(), pc.max(idx).as_py()
            if lo is not None and (lo < 0 or hi >= len(self.dictionary)):
                raise UnknownFormat(
                    f"shared-string index out of range in {name!r}"
                )
            t = t.set_column(i, name, self.dictionary.take(idx))
        return t


register("sst_book", 2, decode_sst_book)
