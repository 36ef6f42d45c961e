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
