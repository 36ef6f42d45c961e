"""Range-write expansion: one logical event → N physical key-writes.

The reference's merged-cell expansion fills every covered cell of a
declared range with sentinel markers (xls
/root/reference/xls/sheets.go:374-420, xlsx xlsx/sheets.go:146-178;
sentinels ``→ ⇥ ↓ ⤓`` defined at grate.go:94-104) — SURVEY.md §2.2 T16
calls it "the pattern for multi-row derived events". The CDC recast: a
binlog event carrying a ``span`` covers ``span`` consecutive turn keys;
the anchor key keeps the payload text, covered keys get the continuation
sentinel. The expansion is a vectorized flat-map (np.repeat + per-run
offsets) that runs BEFORE the LWW reduce, so replay semantics are
unchanged — each derived write is an ordinary keyed event.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COVERED_SENTINEL = "⇥"  # continuation marker (≅ grate.go:94-104)

# the reference's directional merge sentinels (grate.go:94-104)
CONTINUE_ROW_MERGED = "↓"
END_ROW_MERGED = "⤓"


def expand_hyperlink_range(
    t: pa.Table,
    span_col: str = "span",
    display_col: str = "display",
    url_col: str = "url",
) -> pa.Table:
    """Hyperlink range fill, the reference's RecTypeHLink merge rules for
    a single-column range (/root/reference/xls/sheets.go:324-372): the
    anchor row renders ``display <url>``, covered rows get
    ContinueRowMerged and the last covered row EndRowMerged. Vectorized
    flat-map; emits (original columns minus span/display/url) + row_off +
    cell."""
    span = t[span_col].to_numpy(zero_copy_only=False).astype(np.int64)
    span = np.maximum(span, 1)
    tot = int(span.sum())
    idx = np.repeat(np.arange(len(span)), span)
    base = np.repeat(np.cumsum(span) - span, span)
    offset = np.arange(tot, dtype=np.int64) - base
    last = np.repeat(span - 1, span)

    disp = pc.fill_null(t[display_col], "")
    url = pc.fill_null(t[url_col], "")
    anchor_cell = pc.binary_join_element_wise(
        disp, pa.scalar(" <"), url, pa.scalar(">"), ""
    )
    anchor_taken = anchor_cell.take(pa.array(idx))
    is_anchor = pa.array(offset == 0)
    is_last = pa.array((offset == last) & (offset > 0))
    cell = pc.if_else(
        is_anchor,
        anchor_taken,
        pc.if_else(
            is_last, pa.scalar(END_ROW_MERGED), pa.scalar(CONTINUE_ROW_MERGED)
        ),
    )
    out = t.drop_columns([span_col, display_col, url_col]).take(pa.array(idx))
    return out.append_column("row_off", pa.array(offset)).append_column(
        "cell", cell
    )


def expand_range_events(t: pa.Table, span_col: str = "span") -> pa.Table:
    """Flat-map: each row with span s becomes s rows at turn_idx + 0..s-1;
    offset-0 keeps ``text``, covered offsets get the sentinel. The span
    column is consumed. Fully vectorized."""
    span = t[span_col].to_numpy(zero_copy_only=False).astype(np.int64)
    span = np.maximum(span, 1)
    tot = int(span.sum())
    idx = np.repeat(np.arange(len(span)), span)
    base = np.repeat(np.cumsum(span) - span, span)
    offset = np.arange(tot, dtype=np.int64) - base
    out = t.drop_columns([span_col]).take(pa.array(idx))
    turn = out["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64) + offset
    out = out.set_column(
        out.column_names.index("turn_idx"),
        "turn_idx",
        pa.array(turn.astype(np.int32)),
    )
    text = pc.if_else(
        pa.array(offset > 0), pa.scalar(COVERED_SENTINEL), out["text"]
    )
    return out.set_column(out.column_names.index("text"), "text", text)
