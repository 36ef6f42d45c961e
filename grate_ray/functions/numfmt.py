"""Full number-format compiler (T8): Excel format codes → render closures.

Mirrors the reference's formatter semantics — the combinator set of
/root/reference/commonxl/fmt.go (addCommas fmt.go:34-55, addNegParens
fmt.go:24-32, surround fmt.go:18-22, zeroDash fmt.go:150-162, the 4-way
pos/neg/zero/text section switch fmt.go:186-212, sprintfFunc fmt.go:86-103,
fracFmtFunc fmt.go:164-182) and the custom-code parser ``makeFormatter``
(/root/reference/commonxl/formats.go:76-196): bracket-section strip,
escaped/quoted-literal handling, date-vs-number dispatch on the presence of
``ymdhs``, width/precision inference from the 0/#/. positions, comma
grouping from ',', percent ×100, and prefix/suffix surround split on the
first ``[0#?,.]+`` run. The built-in id→code and id→type tables mirror
formats.go:227-382; the built-in id→func table mirrors fmt.go:215-303.

Deliberate deviations from the reference (documented, Excel-correct where
the Go code's is an artifact of Go's layout strings):

- Custom DATE codes translate through ``translate_date_code``
  (functions/format.py, T10), which resolves minute-vs-month by scanning
  both directions; the reference's single ``h.*m.*s`` regex + replace-first
  pass (formats.go:97-124) mis-renders codes like ``h:mm`` (no seconds) as
  months. Built-in date ids are hardcoded layouts in both engines and agree.
- Quoted literals inside date codes render WITHOUT the quotes (Excel
  semantics); Go's time.Format keeps them as literal characters.
- ``sprintf``-style formats applied to ints when the verb is f/E format the
  int as a float; Go's ``fmt.Sprintf("%4.2f", int64)`` prints a
  ``%!f(int64=...)`` error artifact.

State model: a ``Formatter`` is per-ingest-unit codec state (ST2) — build
once in an actor's ``__init__``, apply per batch.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa

from .format import approx_fraction, format_general, translate_date_code

# --- cell-type tags (reference commonxl/cell.go:29-48) -----------------------

INTEGER, FLOAT, STRING, DATE = "integer", "float", "string", "date"


# --- serial-date conversion (dates.go:10-45) ----------------------------------


_EPOCH_1900 = datetime(1899, 12, 30, tzinfo=timezone.utc)
_EPOCH_1904 = datetime(1904, 1, 1, tzinfo=timezone.utc)


def convert_serial_date(val: float, mode1904: bool = False) -> datetime:
    """Excel serial day-number → datetime; serials < 61 go through the
    Julian-day arithmetic (the Lotus 1900-leap-year quirk path,
    /root/reference/commonxl/dates.go:12-36)."""
    v = int(val)
    if v < 61:
        jdate = val + 0.5 + (2416480.5 if mode1904 else 2415018.5)
        jd = int(jdate)
        frac = jdate - jd
        L = jd + 68569
        n = 4 * L // 146097
        L = L - (146097 * n + 3) // 4
        i = 4000 * (L + 1) // 1461001
        L = L - 1461 * i // 4 + 31
        j = 80 * L // 2447
        day = L - 2447 * j // 80
        L = j // 11
        month = j + 2 - 12 * L
        year = 100 * (n - 49) + i + L
        base = datetime(year, month, day, tzinfo=timezone.utc)
        return base + timedelta(hours=24 * frac)
    frac = val - v
    base = _EPOCH_1904 if mode1904 else _EPOCH_1900
    return base + timedelta(days=v, hours=24 * frac)


# --- scalar coercion (fmt.go:105-147) -----------------------------------------


def _to_float(v) -> tuple[float, bool]:
    """convertToFloat64: bool→1/0, numerics, and numeric STRINGS parse."""
    if isinstance(v, bool):
        return (1.0, True) if v else (0.0, True)
    if isinstance(v, (int, float, np.integer, np.floating)):
        return float(v), True
    if isinstance(v, str):
        try:
            return float(v), True
        except ValueError:
            return 0.0, False
    return 0.0, False


# --- combinators (fmt.go) ------------------------------------------------------


def static_fmt(s: str):
    return lambda v: s


def surround(pre: str, ff, post: str):
    return lambda v: pre + ff(v) + post


def add_neg_parens(ff):
    def f(v):
        s = ff(v)
        if s.startswith("-"):
            return "(" + s[1:] + ")"
        return s

    return f


def _insert_commas(s: str) -> str:
    """Comma-group the integer digits of an already-rendered number
    (everything before the first of ``.eE``), sign-aware."""
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    end = len(s)
    for i, ch in enumerate(s):
        if ch in ".eE":
            end = i
            break
    while end > 3:
        end -= 3
        s = s[:end] + "," + s[end:]
    return "-" + s if neg else s


def add_commas(ff):
    return lambda v: _insert_commas(ff(v))


def zero_dash(ff):
    def f(v):
        fval, ok = _to_float(v)
        if not ok:
            return format_general(v)
        if fval == 0.0:
            return "-"
        return ff(v)

    return f


def sprintf_fmt(fs: str, mul: int = 1):
    """The printf-core renderer: ``%<w>.<p>{d|f|E}`` with an optional
    percent ×100 multiplier; %d truncates floats toward zero."""
    want_int = "%d" in fs or re.search(r"%\d+d", fs) is not None

    def f(v):
        if isinstance(v, bool) or not isinstance(
            v, (int, float, np.integer, np.floating)
        ):
            return format_general(v)
        val = float(v) * mul
        if want_int:
            return fs % int(val)
        return fs % val

    return f


def frac_fmt(n: int):
    """`# ?/?` family (fmt.go:164-182): sign carried on the numerator when
    the whole part is zero."""

    def f(v):
        fval, ok = _to_float(v)
        if not ok:
            return format_general(v)
        whole, num, den = approx_fraction(fval, n)
        if num == 0:
            return str(whole)
        if whole == 0:
            if fval < 0 and num > 0:
                num = -num
            return f"{num}/{den}"
        return f"{whole} {num}/{den}"

    return f


def switch_fmt(pos, *others):
    """pos;neg;zero;text section dispatch (fmt.go:186-212): non-numeric →
    text section (default General); 0 → zero section (default pos);
    negative → neg section (default pos)."""
    text_ff = format_general
    zero_ff = pos
    neg_ff = pos
    if len(others) > 0:
        neg_ff = others[0]
        if len(others) > 1:
            zero_ff = others[1]
            if len(others) > 2:
                text_ff = others[2]
    def f(v):
        val, ok = _to_float(v)
        if not ok:
            return text_ff(v)
        if val == 0.0:
            return zero_ff(v)
        if val < 0.0:
            return neg_ff(v)
        return pos(v)

    return f


def time_fmt(strf: str, mode1904: bool = False, cn: bool = False, frac_digit: bool = False):
    """Render a datetime (or an Excel serial number) through a strftime
    layout; ``cn`` swaps the AM/PM marker for 上午/下午 (fmt.go's
    cnTimeFmtFunc, dates.go:63-78); ``frac_digit`` appends tenths (the
    ``.0``/``.9`` codes strftime can't express)."""

    def f(v):
        if isinstance(v, datetime):
            t = v
        else:
            fval, ok = _to_float(v)
            if not ok:
                return format_general(v)
            t = convert_serial_date(fval, mode1904)
        s = t.strftime(strf)
        if frac_digit:
            s += f".{t.microsecond // 100_000}"
        if cn:
            s = s.replace("AM", "上午", 1).replace("PM", "下午", 1)
        return s

    return f


# --- the custom-code compiler (formats.go:76-196) ------------------------------

_BRACKETS = re.compile(r"\[[^\]]*\]")
_TEXT_LITERAL = re.compile(r'"[^"]*"')
_NON_ESC_QUOTE = re.compile(r'([^"]|^)"')
_SQUASH = re.compile(r"[*_].")
_FIX_ESC = re.compile(r"\\(.)")
_E_EXP = re.compile(r"[eE]+[+-]0+")
_NUM_RUN = re.compile(r"[0#?,.]+")


def _clean_literal(s: str) -> str:
    s = _NON_ESC_QUOTE.sub(r"\1", s)
    s = _SQUASH.sub("", s)
    return _FIX_ESC.sub(r"\1", s)


def make_formatter(code: str, mode1904: bool = False):
    """Compile a format code → (render closure, cell-type tag). The
    positive section's type tags the cell (formats.go:82-87)."""
    s = _BRACKETS.sub("", code)
    if ";" in s:
        parts = s.split(";")
        pos, ctype = make_formatter(parts[0], mode1904)
        rest = [make_formatter(p, mode1904)[0] for p in parts[1:]]
        return switch_fmt(pos, *rest), ctype

    # escaped chars + quoted text are invisible to the date/number sniff
    s2 = _FIX_ESC.sub("", s)
    s2 = _TEXT_LITERAL.sub("", s2)

    if any(ch in s2 for ch in "ymdhs"):
        strf = translate_date_code(_clean_literal(s))
        return time_fmt(strf, mode1904), DATE

    if any(ch in s2 for ch in ".Ee"):
        verb = "E" if ("E" in s2 or "e" in s2) else "f"
        sn = _E_EXP.sub("", s)
        s2n = sn.replace(",", "")
        i1 = _index_any(s2n, "0")
        i2 = s2n.find(".")
        i3 = _last_index_any(s2n, "0.")
        mul = 100 if "%" in s2n else 1
        ff = sprintf_fmt(f"%{i3 - i1}.{i3 - i2}{verb}", mul)
        ctype = FLOAT
        s = sn
    else:
        s2n = s.replace(",", "")
        i1 = _index_any(s2n, "0")
        i2 = _last_index_any(s2n, "0.")
        mul = 100 if "%" in s2n else 1
        width = i2 - i1
        ff = sprintf_fmt("%d" if width == 0 else f"%{width}d", mul)
        ctype = INTEGER

    if "," in s:
        ff = add_commas(ff)

    prepost = _NUM_RUN.split(s, maxsplit=1)
    if len(prepost) == 1:
        lit = _clean_literal(prepost[0])
        if lit == "@":
            return format_general, STRING
        return static_fmt(lit), STRING
    pre, post = _clean_literal(prepost[0]), _clean_literal(prepost[1])
    if pre or post:
        ff = surround(pre, ff, post)
    return ff, ctype


def _index_any(s: str, chars: str) -> int:
    for i, ch in enumerate(s):
        if ch in chars:
            return i
    return -1


def _last_index_any(s: str, chars: str) -> int:
    for i in range(len(s) - 1, -1, -1):
        if s[i] in chars:
            return i
    return -1


# --- built-in tables (formats.go:227-382) --------------------------------------

BUILTIN_FORMATS: dict[int, str] = {
    0: "General", 1: "0", 2: "0.00", 3: "#,##0", 4: "#,##0.00",
    9: "0%", 10: "0.00%", 11: "0.00E+00", 12: "# ?/?", 13: "# ??/??",
    14: "mm-dd-yy", 15: "d-mmm-yy", 16: "d-mmm", 17: "mmm-yy",
    18: "h:mm AM/PM", 19: "h:mm:ss AM/PM", 20: "h:mm", 21: "h:mm:ss",
    22: "m/d/yy h:mm",
    37: "#,##0 ;(#,##0)", 38: "#,##0 ;[Red](#,##0)",
    39: "#,##0.00;(#,##0.00)", 40: "#,##0.00;[Red](#,##0.00)",
    41: '_(* #,##0_);_(* \\(#,##0\\);_(* "-"_);_(@_)',
    42: '_("$"* #,##0_);_("$"* \\(#,##0\\);_("$"* "-"_);_(@_)',
    43: '_(* #,##0.00_);_(* \\(#,##0.00\\);_(* "-"??_);_(@_)',
    44: '_("$"* #,##0.00_);_("$"* \\(#,##0.00\\);_("$"* "-"??_);_(@_)',
    45: "mm:ss", 46: "[h]:mm:ss", 47: "mmss.0", 48: "##0.0E+0", 49: "@",
    27: 'yyyy"年"m"月"', 28: 'm"月"d"日"', 29: 'm"月"d"日"', 30: "m-d-yy",
    31: 'yyyy"年"m"月"d"日"', 32: 'h"时"mm"分"', 33: 'h"时"mm"分"ss"秒"',
    34: '上午/下午 h"时"mm"分"', 35: '上午/下午 h"时"mm"分"ss"秒"',
    36: 'yyyy"年"m"月"', 50: 'yyyy"年"m"月"', 51: 'm"月"d"日"',
    52: 'yyyy"年"m"月"', 53: 'm"月"d"日"', 54: 'm"月"d"日"',
    55: '上午/下午 h"时"mm"分"', 56: '上午/下午 h"时"mm"分"ss"秒',
    57: 'yyyy"年"m"月"', 58: 'm"月"d"日"',
    59: "0", 60: "0.00", 61: "#,##0", 62: "#,##0.00",
    67: "0%", 68: "0.00%", 69: "# ?/?", 70: "# ??/??",
    71: "d/m/yyyy", 72: "d-mmm-yy", 73: "d-mmm", 74: "mmm-yy",
    75: "h:mm", 76: "h:mm:ss", 77: "d/m/yyyy h:mm", 78: "mm:ss",
    79: "[h]:mm:ss", 80: "mm:ss.0", 81: "d/m/bb",
}

BUILTIN_FORMAT_TYPES: dict[int, str] = {
    **{i: INTEGER for i in (1, 3, 37, 38, 41, 42, 59, 61)},
    **{i: FLOAT for i in (2, 4, 9, 10, 11, 12, 13, 39, 40, 43, 44, 48,
                          60, 62, 67, 68, 69, 70)},
    **{i: DATE for i in (14, 15, 16, 17, 18, 19, 20, 21, 22, 27, 28, 29,
                         30, 31, 32, 33, 34, 35, 36, 45, 46, 47, 50, 51,
                         52, 53, 54, 55, 56, 57, 58, 71, 72, 73, 74, 75,
                         76, 77, 78, 79, 80, 81)},
    49: STRING,
}


def _builtin_funcs(mode1904: bool = False) -> dict[int, "object"]:
    """id → render closure, transliterated from fmt.go:215-303 (the Go
    layout strings become the equivalent strftime layouts)."""
    t = lambda f, **kw: time_fmt(f, mode1904, **kw)  # noqa: E731
    d = {
        0: format_general, 49: format_general,
        14: t("%m-%d-%y"), 15: t("%-d-%b-%y"), 16: t("%-d-%b"), 17: t("%b-%y"),
        20: t("%H:%M"), 21: t("%H:%M:%S"), 22: t("%-m/%-d/%y %H:%M"),
        45: t("%M:%S"), 46: t("%-I:%M:%S"), 47: t("%M%S", frac_digit=True),
        27: t("%Y年%-m月"), 28: t("%-m月%-d日"), 29: t("%-m月%-d日"),
        30: t("%-m-%-d-%y"), 31: t("%Y年%-m月%-d日"),
        32: t("%H时%M分"), 33: t("%H时%M分%S秒"),
        36: t("%Y年%-m月"), 50: t("%Y年%-m月"), 51: t("%-m月%-d日"),
        52: t("%Y年%-m月"), 53: t("%-m月%-d日"), 54: t("%-m月%-d日"),
        57: t("%Y年%-m月"), 58: t("%-m月%-d日"),
        71: t("%-d/%-m/%Y"), 72: t("%-d-%b-%y"), 73: t("%-d-%b"),
        74: t("%b-%y"), 75: t("%H:%M"), 76: t("%H:%M:%S"),
        77: t("%-d/%-m/%Y %H:%M"), 78: t("%M:%S"), 79: t("%H:%M:%S"),
        80: t("%M:%S", frac_digit=True), 81: t("%-d/%-m/%y"),
        18: t("%-I:%M %p"), 19: t("%-I:%M:%S %p"),
        34: t("%p %-I时%M分", cn=True), 35: t("%p %-I时%M分%S秒", cn=True),
        55: t("%p %-I时%M分", cn=True), 56: t("%p %-I时%M分%S秒", cn=True),
        12: frac_fmt(1), 13: frac_fmt(2), 69: frac_fmt(1), 70: frac_fmt(2),
        1: sprintf_fmt("%d"), 59: sprintf_fmt("%d"),
        2: sprintf_fmt("%4.2f"), 60: sprintf_fmt("%4.2f"),
        9: sprintf_fmt("%d%%", 100), 67: sprintf_fmt("%d%%", 100),
        10: sprintf_fmt("%4.2f%%", 100), 68: sprintf_fmt("%4.2f%%", 100),
        3: add_commas(sprintf_fmt("%d")), 61: add_commas(sprintf_fmt("%d")),
        37: add_neg_parens(add_commas(sprintf_fmt("%d"))),
        38: add_neg_parens(add_commas(sprintf_fmt("%d"))),
        4: add_commas(sprintf_fmt("%4.2f")),
        62: add_commas(sprintf_fmt("%4.2f")),
        39: add_neg_parens(add_commas(sprintf_fmt("%4.2f"))),
        40: add_neg_parens(add_commas(sprintf_fmt("%4.2f"))),
        11: sprintf_fmt("%4.2E"), 48: sprintf_fmt("%3.1E"),
        41: zero_dash(add_commas(sprintf_fmt("%d"))),
        43: zero_dash(add_commas(sprintf_fmt("%4.2f"))),
        42: switch_fmt(
            surround("$", add_commas(sprintf_fmt("%d")), ""),
            surround("$(", add_commas(sprintf_fmt("%d")), ")"),
            static_fmt("$-"),
        ),
        44: switch_fmt(
            surround("$", add_commas(sprintf_fmt("%4.2f")), ""),
            surround("$(", add_commas(sprintf_fmt("%4.2f")), ")"),
            static_fmt("$-"),
        ),
    }
    return d


class Formatter:
    """Per-ingest-unit format registry (ST2): built-ins + custom codes.
    Mirrors the Add/Get/Apply surface of formats.go:32-224 — built-in ids
    can't be replaced, ids register once, 'General' aliases to id 0."""

    def __init__(self, mode1904: bool = False):
        self.mode1904 = mode1904
        self._builtins = _builtin_funcs(mode1904)
        self.custom: dict[int, object] = {}
        self.custom_types: dict[int, str] = {}

    def add(self, fmt_id: int, code: str) -> None:
        if code.lower() == "general":
            self.custom[fmt_id] = self._builtins[0]
            return
        if fmt_id in self._builtins:
            raise ValueError("cannot replace default number formats")
        if fmt_id in self.custom:
            raise ValueError("cannot replace existing number formats")
        self.custom[fmt_id], self.custom_types[fmt_id] = make_formatter(
            code, self.mode1904
        )

    def get_cell_type(self, fmt_id: int) -> str | None:
        return BUILTIN_FORMAT_TYPES.get(fmt_id) or self.custom_types.get(fmt_id)

    def get(self, fmt_id: int):
        ff = self._builtins.get(fmt_id) or self.custom.get(fmt_id)
        return ff if ff is not None else format_general

    def apply(self, fmt_id: int, val) -> str:
        return self.get(fmt_id)(val)


# --- vectorized column renderer -------------------------------------------------

_COMMA_RE = re.compile(r"(\d)(\d{3})(?=[.,eE]|$)")


def _vec_commas(s: "pd.Series") -> "pd.Series":  # noqa: F821
    """Comma-group rendered numbers, vectorized: repeated regex insert from
    the right until fixpoint (≤ digits/3 passes, all C-speed)."""
    while True:
        s2 = s.str.replace(_COMMA_RE, r"\1,\2", regex=True)
        if s2.equals(s):
            return s2
        s = s2


def render_column(col: pa.Array | pa.ChunkedArray, code: str) -> pa.Array:
    """Render a numeric column through a format code, vectorized for the
    sprintf/commas/neg-parens/surround family (np.char.mod + C-regex comma
    grouping); date/fraction/section codes fall back to the compiled
    closure per value (render-time path, not the CDC hot path)."""
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    plan = _vector_plan(code)
    if plan is None:
        ff, _ = make_formatter(code)
        return pa.array(
            [None if v is None else ff(v) for v in col.to_pylist()], pa.string()
        )
    fs, mul, commas, negparens, pre, post = plan
    vals = col.to_numpy(zero_copy_only=False).astype(np.float64) * mul
    if "d" in fs:
        rendered = np.char.mod(fs, np.nan_to_num(vals).astype(np.int64))
    else:
        rendered = np.char.mod(fs, np.nan_to_num(vals))
    s = pd.Series(rendered)
    if commas:
        s = _vec_commas(s)
    if negparens:
        neg = s.str.startswith("-")
        s = s.where(~neg, "(" + s.str.slice(1) + ")")
    if pre or post:
        s = pre + s + post
    out = pa.array(s.to_numpy(dtype=object), pa.string())
    if col.null_count:
        import pyarrow.compute as pc

        out = pc.if_else(pc.is_valid(col), out, pa.scalar(None, pa.string()))
    return out


def _vector_plan(code: str):
    """Decompose a section-free numeric code into (printf fmt, mul, commas,
    negparens, pre, post) when the compiled tree is exactly that family;
    None → scalar fallback."""
    s = _BRACKETS.sub("", code)
    if ";" in s:
        return None
    s2 = _FIX_ESC.sub("", s)
    s2 = _TEXT_LITERAL.sub("", s2)
    if any(ch in s2 for ch in "ymdhs") or "?" in s:
        return None
    if any(ch in s2 for ch in ".Ee"):
        sn = _E_EXP.sub("", s)
        s2n = sn.replace(",", "")
        i1, i2, i3 = _index_any(s2n, "0"), s2n.find("."), _last_index_any(s2n, "0.")
        verb = "E" if ("E" in s2 or "e" in s2) else "f"
        fs = f"%{i3 - i1}.{i3 - i2}{verb}"
        s = sn
    else:
        s2n = s.replace(",", "")
        i1, i2 = _index_any(s2n, "0"), _last_index_any(s2n, "0.")
        if i1 < 0:
            return None
        width = i2 - i1
        fs = "%d" if width == 0 else f"%{width}d"
    mul = 100 if "%" in s2n else 1
    parts = _NUM_RUN.split(s, maxsplit=1)
    if len(parts) == 1:
        return None
    pre, post = _clean_literal(parts[0]), _clean_literal(parts[1])
    return fs, mul, "," in s, False, pre, post
