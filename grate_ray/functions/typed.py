"""Cell-type inference over string cells (SURVEY.md §1.2 / T5).

Mirrors the reference's lenient string→type sniffing
(/root/reference/simple/simple.go:74-108 and the public type-name contract
at grate.go:32-35): each cell is classified as
``blank | integer | float | boolean | date | string``. The patterns are
RE2, mirrored verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

INT_RE = r"^-?[0-9]+$"
FLOAT_RE = r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$|^-?[0-9]+[eE][+-]?[0-9]+$"
BOOL_RE = r"^(true|false|TRUE|FALSE)$"
DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def infer_cell_types(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized type-name classification of a string column."""
    filled = pc.fill_null(col, "")
    blank = pc.equal(filled, "")
    is_int = pc.match_substring_regex(filled, INT_RE)
    is_float = pc.match_substring_regex(filled, FLOAT_RE)
    is_bool = pc.match_substring_regex(filled, BOOL_RE)
    is_date = pc.match_substring_regex(filled, DATE_RE)
    out = pa.nulls(len(filled), pa.string())
    # precedence: blank > integer > float > boolean > date > string
    out = pc.if_else(blank, pa.scalar("blank"), out)
    for mask, name in [
        (is_int, "integer"),
        (is_float, "float"),
        (is_bool, "boolean"),
        (is_date, "date"),
    ]:
        out = pc.if_else(pc.and_(pc.is_null(out), mask), pa.scalar(name), out)
    return pc.fill_null(out, "string")


# the same classification as a SQL CASE (same precedence, same RE2 patterns)
CELL_TYPE_SQL_CASE = """
CASE WHEN {col} IS NULL OR {col} = '' THEN 'blank'
     WHEN regexp_matches({col}, '^-?[0-9]+$') THEN 'integer'
     WHEN regexp_matches({col}, '^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$')
          OR regexp_matches({col}, '^-?[0-9]+[eE][+-]?[0-9]+$') THEN 'float'
     WHEN regexp_matches({col}, '^(true|false|TRUE|FALSE)$') THEN 'boolean'
     WHEN regexp_matches({col}, '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$') THEN 'date'
     ELSE 'string' END
"""


# BIFF BoolErr error-code → display label (T13 tail): the reference's
# ``berrLookup`` table verbatim (/root/reference/xls/sheets.go:441-450).
BERR_LABELS: dict[int, str] = {
    0x00: "#NULL!",
    0x07: "#DIV/0!",
    0x0F: "#VALUE!",
    0x17: "#REF!",
    0x1D: "#NAME?",
    0x24: "#NUM!",
    0x2A: "#N/A",
    0x2B: "#GETTING_DATA",
}


def error_labels(codes: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized BoolErr error-label decode: integer error codes →
    display labels per ``berrLookup``; codes OUTSIDE the table decode to
    null so the caller's validate/split step routes them to the
    dead-letter sink (the reference silently renders unknown codes as
    empty — we surface them instead). One 256-slot take, no per-row
    Python."""
    import numpy as np

    lut = np.full(256, None, dtype=object)
    for k, v in BERR_LABELS.items():
        lut[k] = v
    table = pa.array(lut, pa.string())
    idx = pc.cast(codes, pa.int64())
    # out-of-range codes (not uint8) → null index → null label
    oob = pc.or_(pc.less(idx, 0), pc.greater(idx, 255))
    idx = pc.if_else(oob, pa.scalar(None, pa.int64()), idx)
    if isinstance(idx, pa.ChunkedArray):
        idx = idx.combine_chunks()
    return table.take(idx)


# the same decode as a SQL CASE (unknown codes → NULL, same table)
BERR_SQL_CASE = """
CASE {col}
     WHEN 0 THEN '#NULL!'
     WHEN 7 THEN '#DIV/0!'
     WHEN 15 THEN '#VALUE!'
     WHEN 23 THEN '#REF!'
     WHEN 29 THEN '#NAME?'
     WHEN 36 THEN '#NUM!'
     WHEN 42 THEN '#N/A'
     WHEN 43 THEN '#GETTING_DATA'
     ELSE NULL END
"""
