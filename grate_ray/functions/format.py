"""General-format cell rendering (T8 subset — SURVEY.md §7.5 keeps only
the *General* rendering semantics of the reference's number-format
library; full format-code fidelity is a non-goal).

Mirrors ``identFunc``'s Excel "General" behavior
(/root/reference/commonxl/fmt.go:57-84): integers render without a decimal
point, floats trim trailing zeros, and values whose default rendering
exceeds 11 characters fall back to scientific notation with the mantissa
budgeted to fit (Excel's 11-character column rule). Booleans render
TRUE/FALSE (/root/reference/commonxl/cell.go:111-116); None renders ""
(blank ≡ empty string, §1.2).
"""

from __future__ import annotations

import pyarrow as pa

MAX_GENERAL_WIDTH = 11


def format_general(value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        s = str(value)
        if len(s) <= MAX_GENERAL_WIDTH:
            return s
        return format_general(float(value))
    if isinstance(value, float):
        if value == int(value) and abs(value) < 1e11:
            s = str(int(value))
            if len(s) <= MAX_GENERAL_WIDTH:
                return s
        s = repr(value)
        if len(s) <= MAX_GENERAL_WIDTH:
            return s
        # scientific with mantissa digits budgeted into 11 chars
        for prec in range(10, -1, -1):
            s = f"{value:.{prec}E}"
            mant, exp = s.split("E")
            mant = mant.rstrip("0").rstrip(".")
            s = f"{mant}E{exp}"
            if len(s) <= MAX_GENERAL_WIDTH:
                return s
        return s
    return str(value)


# --- Formats() projection (T6) ----------------------------------------------
#
# The reference's ``Formats()`` returns each cell's number-format code
# string, falling back to the numeric id (/root/reference/commonxl/
# sheet.go:162-172); codes come from the built-in id→code table
# (formats.go:227-307) and each format id implies a cell type
# (builtInFormatTypes, formats.go:310-382). The engine inverts that last
# mapping: a decoded string cell's inferred type yields the canonical
# built-in format id + code for that type.

BUILTIN_FORMAT_CODES: dict[int, str] = {
    0: "General",  # formats.go:229
    1: "0",        # formats.go:230
    2: "0.00",     # formats.go:231
    14: "mm-dd-yy",  # formats.go:243 (date)
    49: "@",       # formats.go:307 (text)
}

CELL_TYPE_TO_FORMAT_ID: dict[str, int] = {
    "blank": 0,
    "integer": 1,
    "float": 2,
    "boolean": 0,   # bools render through General (cell.go:111-116)
    "date": 14,
    "string": 49,
}


def infer_formats(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """Per-cell (format id, format code) — the queryable ``Formats()``
    projection. Vectorized: classify once, then map via index_in+take."""
    import pyarrow.compute as pc

    from .typed import infer_cell_types

    ct = infer_cell_types(col)
    if isinstance(ct, pa.ChunkedArray):
        ct = ct.combine_chunks()
    types = list(CELL_TYPE_TO_FORMAT_ID)
    ids = pa.array([CELL_TYPE_TO_FORMAT_ID[t] for t in types], pa.int32())
    codes = pa.array([BUILTIN_FORMAT_CODES[CELL_TYPE_TO_FORMAT_ID[t]] for t in types])
    idx = pc.index_in(ct, value_set=pa.array(types))
    return ids.take(idx), codes.take(idx)


def render_strings(t: pa.Table) -> pa.Table:
    """The ``Strings()`` projection (T4): every column rendered to its
    General string form (/root/reference/commonxl/sheet.go:129-148)."""
    cols = {}
    for name in t.column_names:
        cols[name] = pa.array(
            [format_general(v) for v in t[name].to_pylist()], pa.string()
        )
    return pa.table(cols)
