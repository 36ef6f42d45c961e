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


# --- date-format translation (T10) ------------------------------------------
#
# Excel date codes → strftime layouts, including the minute-vs-month
# disambiguation: an `m`/`mm` token flanked by hour/second tokens means
# MINUTE (the reference resolves this with its `h.*m.*s` regex scan,
# /root/reference/commonxl/formats.go:94-128; layout table
# dates.go:47-78). Tokens are matched longest-first.

_DATE_TOKENS = [
    ("yyyy", "%Y"), ("yy", "%y"),
    ("mmmm", "%B"), ("mmm", "%b"),
    ("dddd", "%A"), ("ddd", "%a"), ("dd", "%d"), ("d", "%-d"),
    ("hh", "%H"), ("h", "%-H"),
    ("ss", "%S"), ("s", "%-S"),
    ("am/pm", "%p"), ("a/p", "%p"),
]


def translate_date_code(code: str) -> str:
    """Excel date/time format code → strftime layout. Two passes:
    tokenize, then resolve each ``m`` run — MINUTE iff the nearest time
    token before it is an hour, or (failing that) the nearest time token
    after it is a second; month otherwise."""
    toks: list[tuple[str, str]] = []  # (kind, text) kind ∈ {tok, m, lit}
    i, n = 0, len(code)
    low = code.lower()
    while i < n:
        matched = False
        for tok, fmt in _DATE_TOKENS:
            if low.startswith(tok, i):
                toks.append(("tok", fmt))
                i += len(tok)
                matched = True
                break
        if matched:
            continue
        if low[i] == "m":
            run = 1
            while i + run < n and low[i + run] == "m":
                run += 1
            toks.append(("m", "mm" if run >= 2 else "m"))
            i += run
        else:
            toks.append(("lit", code[i]))
            i += 1

    def time_kind(fmt: str) -> str | None:
        if fmt in ("%H", "%-H"):
            return "h"
        if fmt in ("%S", "%-S"):
            return "s"
        return None

    out: list[str] = []
    for j, (kind, text) in enumerate(toks):
        if kind != "m":
            out.append(text)
            continue
        prev_t = next(
            (time_kind(t) for k, t in reversed(toks[:j]) if k == "tok" and time_kind(t)),
            None,
        )
        next_t = next(
            (time_kind(t) for k, t in toks[j + 1 :] if k == "tok" and time_kind(t)),
            None,
        )
        minute = prev_t == "h" or (prev_t is None and next_t == "s")
        if minute:
            out.append("%M" if text == "mm" else "%-M")
        else:
            out.append("%m" if text == "mm" else "%-m")
    return "".join(out)


def render_datetime(col: pa.ChunkedArray | pa.Array, code: str) -> pa.Array | pa.ChunkedArray:
    """Render a timestamp column through an Excel date code (vectorized
    Arrow strftime). Non-padded / locale tokens (%-d, %B, %p) fall back to
    pandas dt.strftime."""
    import pyarrow.compute as pc

    fmt = translate_date_code(code)
    if "%-" not in fmt and "%B" not in fmt and "%p" not in fmt:
        # Arrow's %S appends the fractional part for sub-second timestamp
        # TYPES; Excel ss is whole seconds — cast to second resolution
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        secs = pc.cast(col, pa.timestamp("s"), safe=False)  # truncate
        return pc.strftime(secs, format=fmt)
    s = (col.to_pandas() if hasattr(col, "to_pandas") else col).dt.strftime(fmt)
    return pa.array(s, pa.string())


# --- fraction approximation (T11) --------------------------------------------


def approx_fraction(value: float, max_digits: int) -> tuple[int, int, int]:
    """Best rational approximation (whole, num, den) of ``value`` with the
    denominator budgeted to ``max_digits`` decimal digits (the `# ?/?`
    format family, /root/reference/commonxl/numbers.go:10-74 — same
    continued-fraction idea, independent implementation). Returns
    (whole_part, numerator, denominator) with 0 ≤ num/den < 1."""
    import math

    sign = -1 if value < 0 else 1
    value = abs(value)
    whole = int(math.floor(value))
    frac = value - whole
    limit = 10**max_digits - 1
    # Stern–Brocot walk: best approximation with den ≤ limit
    best_n, best_d, best_err = 0, 1, frac
    lo_n, lo_d, hi_n, hi_d = 0, 1, 1, 1
    for _ in range(64):
        mid_n, mid_d = lo_n + hi_n, lo_d + hi_d
        if mid_d > limit:
            break
        err = abs(frac - mid_n / mid_d)
        if err < best_err:
            best_n, best_d, best_err = mid_n, mid_d, err
        if mid_n / mid_d < frac:
            lo_n, lo_d = mid_n, mid_d
        else:
            hi_n, hi_d = mid_n, mid_d
    if abs(frac - 1.0) < best_err:
        whole, best_n, best_d = whole + 1, 0, 1
    return sign * whole, best_n, best_d


def render_fraction(value: float, max_digits: int = 1) -> str:
    """`# ?/?` rendering: '<whole> <num>/<den>', fraction omitted when 0."""
    whole, n, d = approx_fraction(value, max_digits)
    if n == 0:
        return str(whole)
    if whole == 0:
        return f"{n}/{d}"
    return f"{whole} {n}/{d}"


def _render_float_general(arr) -> pa.Array:
    """Vectorized General rendering of a float64 column, bit-identical to
    ``format_general``: integral values < 1e11 render as ints, others via
    numpy's shortest round-trip repr (== Python ``repr`` for doubles); the
    rare > 11-char strings get the scientific budget loop per value."""
    import numpy as np

    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    valid = ~np.isnan(v) if arr.null_count else np.ones(len(v), dtype=bool)
    safe = np.where(valid, v, 0.0)
    is_int = (safe == np.trunc(safe)) & (np.abs(safe) < 1e11)
    out = np.empty(len(v), dtype=object)
    if is_int.any():
        ints = safe[is_int].astype(np.int64).astype("U")
        out[is_int] = ints
    rest = ~is_int
    if rest.any():
        reprs = safe[rest].astype("U32")
        out[rest] = reprs
    # integral strings can exceed 11 chars only at |v| ≥ 1e11 (excluded
    # above); non-integral > 11 chars fall back to the scalar budget
    lens = np.char.str_len(out.astype("U32"))
    for i in np.flatnonzero((lens > MAX_GENERAL_WIDTH) & valid):
        out[i] = format_general(float(v[i]))
    out[~valid] = ""
    return pa.array(out, pa.string())


def render_strings(t: pa.Table) -> pa.Table:
    """The ``Strings()`` projection (T4): every column rendered to its
    General string form (/root/reference/commonxl/sheet.go:129-148).
    Vectorized on the hot paths — int/float/bool/string columns render via
    Arrow casts / numpy repr; only exotic column types (timestamps through
    General, nested) take the per-value Python fallback."""
    import pyarrow.compute as pc

    cols = {}
    for name in t.column_names:
        col = t[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            cols[name] = pc.fill_null(col, "")
        elif pa.types.is_boolean(typ):
            cols[name] = pc.fill_null(
                pc.if_else(col, pa.scalar("TRUE"), pa.scalar("FALSE")), ""
            )
        elif pa.types.is_integer(typ):
            # int64 maxes at 19 digits > 11: route the long ones through
            # the float fallback like format_general does
            s = pc.fill_null(pc.cast(col, pa.string()), "")
            long = pc.greater(pc.utf8_length(s), MAX_GENERAL_WIDTH)
            if pc.any(long).as_py():
                fixed = pa.array(
                    [format_general(v) for v in col.to_pylist()], pa.string()
                )
                s = pc.if_else(long, fixed, s)
            cols[name] = s
        elif pa.types.is_floating(typ):
            cols[name] = _render_float_general(pc.cast(col, pa.float64()))
        else:
            cols[name] = pa.array(
                [format_general(v) for v in col.to_pylist()], pa.string()
            )
    return pa.table(cols)
