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


def render_strings(t: pa.Table) -> pa.Table:
    """The ``Strings()`` projection (T4): every column rendered to its
    General string form (/root/reference/commonxl/sheet.go:129-148)."""
    cols = {}
    for name in t.column_names:
        cols[name] = pa.array(
            [format_general(v) for v in t[name].to_pylist()], pa.string()
        )
    return pa.table(cols)
