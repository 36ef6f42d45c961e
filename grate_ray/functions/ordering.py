"""Cross-type cell ordering (§1.2 surface): the reference's ``Cell.Less``
(/root/reference/commonxl/cell.go:346-463) defines a total-ish order across
nil/bool/int/float/string with string→number sniffing; ``cell_less`` is the
exact scalar mirror and ``cell_sort_key`` is the vectorized kernel a
distributed sort actually uses.

Semantics mirrored from the reference:

- nil is never less than anything, and nothing is less than nil (the
  reference's relation is NOT a strict weak order — nil compares "equal"
  to everything, and bool-vs-number uses truthiness, so True ≈ 5).
- bool: False < anything truthy (bool true, number ≠ 0, string in the
  truthy half of the yes/no/t/f/1/0/on/off table); True is never less.
- int vs float: numeric compare with the reference's MinInt64/MaxInt64
  clamp guards.
- number vs string: sniff a leading numeric prefix off the string (the
  reference uses ``fmt.Sscanf`` "%d"/"%g", which accepts trailing junk —
  "12abc" sniffs as 12); if the string has no numeric prefix, compare
  the number's string form lexically (deviation: floats render via
  Python ``repr`` — shortest round-trip — where Go's %v switches to
  exponent notation at different magnitudes; affects only the lexical
  fallback of float-vs-non-numeric-string).

``cell_sort_key`` canonicalizes to (class, numeric, lexical) — null first,
then everything with a numeric interpretation (bools as 0/1, numeric
strings sniffed) by value, then non-numeric strings lexically. On pairs
where ``cell_less`` is antisymmetric the key agrees with it; where the
reference's relation is non-transitive (nil, bool-vs-number ties) the key
imposes the nearest consistent total order — which is what a distributed
sort needs.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# cell.go:111-116 — the truthy/falsy string table
BOOL_STRINGS: dict[str, bool] = {
    "yes": True, "true": True, "t": True, "y": True, "1": True, "on": True,
    "no": False, "false": False, "f": False, "n": False, "0": False, "off": False,
    "YES": True, "TRUE": True, "T": True, "Y": True, "1.0": True, "ON": True,
    "NO": False, "FALSE": False, "F": False, "N": False, "0.0": False, "OFF": False,
}

_INT_PREFIX = re.compile(r"^\s*[+-]?\d+")
_FLOAT_PREFIX = re.compile(r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?")

_MIN_I64, _MAX_I64 = -(2**63), 2**63 - 1


def _sniff_int(s: str) -> int | None:
    m = _INT_PREFIX.match(s)
    return int(m.group(0)) if m else None


def _sniff_float(s: str) -> float | None:
    m = _FLOAT_PREFIX.match(s)
    return float(m.group(0)) if m else None


def _sprint(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def cell_less(v1, v2) -> bool:
    """Exact scalar mirror of Cell.Less (see module docstring)."""
    if v1 is None or v2 is None:
        return False
    if isinstance(v1, bool):
        if v1:
            return False
        if isinstance(v2, bool):
            return v2
        if isinstance(v2, (int, float)):
            return v2 != 0
        if isinstance(v2, str):
            return BOOL_STRINGS.get(v2, False)
        return False
    if isinstance(v1, int):
        if isinstance(v2, bool):
            return v1 < (1 if v2 else 0)
        if isinstance(v2, int):
            return v1 < v2
        if isinstance(v2, float):
            if v2 < _MIN_I64:
                return False
            if v2 > _MAX_I64:
                return True
            return float(v1) < v2
        if isinstance(v2, str):
            x = _sniff_int(v2)
            if x is not None:
                return v1 < x
            return _sprint(v1) < v2
        return False
    if isinstance(v1, float):
        if isinstance(v2, bool):
            return v1 < (1.0 if v2 else 0.0)
        if isinstance(v2, int):
            if v1 < _MIN_I64:
                return True
            if v1 > _MAX_I64:
                return False
            return v1 < float(v2)
        if isinstance(v2, float):
            return v1 < v2
        if isinstance(v2, str):
            x = _sniff_float(v2)
            if x is not None:
                return v1 < x
            return _sprint(v1) < v2
        return False
    if isinstance(v1, str):
        if isinstance(v2, bool):
            return v2 and not BOOL_STRINGS.get(v1, False)
        if isinstance(v2, int):
            x = _sniff_int(v1)
            if x is not None:
                return x < v2
            return v1 < _sprint(v2)
        if isinstance(v2, float):
            x = _sniff_float(v1)
            if x is not None:
                return x < v2
            return v1 < _sprint(v2)
        if isinstance(v2, str):
            return v1 < v2
        return False
    raise TypeError(f"unable to compare cells: {type(v1)}")


def cell_sort_key(values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (class, numeric, lexical) sort key for a mixed-type cell
    column (Python list, numpy object array, or Arrow array): class 0 =
    null, 1 = numeric-comparable (bools, numbers, numeric-prefix strings),
    2 = plain strings. Sort by the tuple columns in order. The numeric
    sniff runs once per UNIQUE string via pandas factorize."""
    import pandas as pd

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    n = len(values)
    cls = np.full(n, 2, dtype=np.int8)
    num = np.zeros(n, dtype=np.float64)
    lex = np.empty(n, dtype=object)
    lex[:] = ""
    str_idx, str_vals = [], []
    for i, v in enumerate(values):
        if v is None:
            cls[i] = 0
        elif isinstance(v, bool):
            cls[i] = 1
            num[i] = 1.0 if v else 0.0
        elif isinstance(v, (int, float, np.integer, np.floating)):
            cls[i] = 1
            num[i] = float(v)
        else:
            str_idx.append(i)
            str_vals.append(str(v))
    if str_idx:
        codes, uniques = pd.factorize(np.asarray(str_vals, dtype=object))
        sniffed = np.array(
            [(_sniff_float(u) if u not in BOOL_STRINGS
              else float(BOOL_STRINGS[u])) for u in uniques],
            dtype=object,
        )
        for j, i in enumerate(str_idx):
            s = sniffed[codes[j]]
            if s is not None:
                cls[i] = 1
                num[i] = float(s)
            lex[i] = str_vals[j]
    return cls, num, lex


def sort_mixed_cells(values) -> list:
    """Sort a mixed cell list by the canonical cross-type order."""
    cls, num, lex = cell_sort_key(values)
    order = np.lexsort((lex, num, cls))
    return [values[i] for i in order]


def _sscanf_g(s: str) -> float:
    """Go ``fmt.Sscanf(s, "%g", &v)`` semantics: parse a leading float
    (whitespace-skipping, trailing junk ignored); on no parse the Go
    variable keeps its zero value — so 0.0."""
    x = _sniff_float(s)
    return 0.0 if x is None else x


def cell_equal(v1, v2) -> bool:
    """Exact scalar mirror of the reference's type-coercing ``Cell.Equal``
    (/root/reference/commonxl/cell.go:319-344) — the kernel its own golden
    tests compare states with (xls/simple_test.go:77):

    - If EITHER side is numeric (int/float cell): both coerce to float —
      numerics directly, anything else via Sscanf "%g" of its printed
      form ("true"/"false" for bools per Go's fmt.Sprint, which fails to
      parse and leaves 0.0). Mirrored QUIRK: the reference re-parses the
      FIRST cell's print into the second operand (cell.go:336 uses c[0],
      not other[0]), so e.g. Cell(5).Equal(Cell("abc")) is true — kept
      verbatim so goldens match the reference bit-for-bit, documented
      here so nobody "fixes" it silently.
    - Otherwise: equal iff neither is Less than the other (which makes
      nil compare equal to everything, per Less's nil rules).

    Bools are NOT IntegerCells here (the reference stores them as
    BooleanCell; its cell.go:147 Set path renders bool→"TRUE"/"FALSE"
    when coerced through a string-typed column — that conversion happens
    before Equal ever sees the value, so Equal itself treats a live bool
    via the non-numeric branch)."""
    n1 = isinstance(v1, (int, float)) and not isinstance(v1, bool)
    n2 = isinstance(v2, (int, float)) and not isinstance(v2, bool)
    if n1 or n2:
        a = float(v1) if n1 else _sscanf_g(_go_sprint(v1))
        b = float(v2) if n2 else _sscanf_g(_go_sprint(v1))  # quirk: v1
        return a == b
    return cell_less(v1, v2) == cell_less(v2, v1)


def _go_sprint(v) -> str:
    """Go fmt.Sprint for the non-numeric cell payloads Equal coerces."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def cells_equal(col_a, col_b) -> np.ndarray:
    """Vectorized ``cell_equal`` over two aligned mixed-type columns
    (Python lists / Arrow arrays) — the comparison a golden-state test
    drives across a whole table at once."""
    if isinstance(col_a, (pa.Array, pa.ChunkedArray)):
        col_a = col_a.to_pylist()
    if isinstance(col_b, (pa.Array, pa.ChunkedArray)):
        col_b = col_b.to_pylist()
    return np.fromiter(
        (cell_equal(a, b) for a, b in zip(col_a, col_b)),
        dtype=bool,
        count=len(col_a),
    )
