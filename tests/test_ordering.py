"""Cross-type Cell.Less golden tests mirroring the semantics of
/root/reference/commonxl/cell.go:346-463 (§1.2 surface). Pure kernels —
no Ray."""

import numpy as np
import pytest

from grate_ray.functions.ordering import cell_less, cell_sort_key, sort_mixed_cells


def test_nil_never_less_and_never_greater():
    for v in (None, True, False, 5, -1, 3.2, "x", ""):
        assert cell_less(None, v) is False
        assert cell_less(v, None) is False


def test_bool_ordering():
    # F < truthy; T never less (cell.go:353-374)
    assert cell_less(False, True)
    assert not cell_less(True, False)
    assert not cell_less(True, True)
    assert not cell_less(False, False)
    assert cell_less(False, 5)
    assert cell_less(False, 0.5)
    assert not cell_less(False, 0)
    assert not cell_less(False, 0.0)
    assert cell_less(False, "yes") and cell_less(False, "TRUE")
    assert not cell_less(False, "no") and not cell_less(False, "weird")
    assert not cell_less(True, 99)  # truthiness, not magnitude


def test_numeric_ordering():
    assert cell_less(1, 2) and not cell_less(2, 1)
    assert cell_less(1, 1.5) and cell_less(1.5, 2)
    assert cell_less(-3.0, -2) and not cell_less(-2, -3.0)
    # int-vs-bool compares against 0/1 (cell.go:381-386)
    assert cell_less(0, True) and not cell_less(5, True)
    assert cell_less(0.5, True) and not cell_less(1.5, True)
    # MinInt64/MaxInt64 clamp guards (cell.go:389-395)
    assert cell_less(7, 1e300) and not cell_less(7, -1e300)
    assert cell_less(-1e300, 7) and not cell_less(1e300, 7)


def test_string_number_sniffing():
    # Sscanf-style prefix parse: trailing junk allowed (cell.go:397-404)
    assert cell_less(5, "12") and not cell_less(15, "12")
    assert cell_less(5, "12abc")
    assert cell_less("12", 15) and not cell_less("12", 5)
    assert cell_less("2.5", 3.0) and not cell_less("2.5", 2.0)
    assert cell_less(2.0, "2.5xyz")
    # non-numeric string: number renders to string, lexical compare
    assert cell_less(5, "abc")  # "5" < "abc"
    assert cell_less("abc", 5) is False
    assert cell_less("abc", "abd") and not cell_less("abd", "abc")


def test_string_bool_table():
    # string-vs-bool via the yes/no table (cell.go:440)
    assert cell_less("no", True)
    assert not cell_less("yes", True)
    assert not cell_less("no", False)
    assert cell_less("anything", True)  # not in table → falsy → < True


def test_sort_key_total_order():
    vals = [None, "banana", 3, True, "2.5", 0.5, False, "apple", None, 10]
    out = sort_mixed_cells(vals)
    # nulls first, numerics (incl. sniffed "2.5" and bools) by value,
    # then plain strings lexically
    assert out[:2] == [None, None]
    assert out[2:8] == [False, 0.5, True, "2.5", 3, 10]
    assert out[8:] == ["apple", "banana"]
    # key agrees with cell_less WITHIN a key class, bools excluded (the
    # reference's relation has genuine cycles — "banana" < True ≈ 5 <
    # "banana" across classes, and "2.5" < True by truthiness while
    # 2.5 > 1 by magnitude — so no total order can match every strict
    # pair; the key resolves them by class/value, documented in
    # ordering.py)
    cls, num, lex = cell_sort_key(vals)
    keys = list(zip(cls, num, lex))
    for i in range(len(vals)):
        for j in range(len(vals)):
            a, b = vals[i], vals[j]
            if a is None or b is None or cls[i] != cls[j]:
                continue
            if isinstance(a, bool) != isinstance(b, bool):
                continue
            if cell_less(a, b) and not cell_less(b, a):  # strict pair
                if keys[i] != keys[j]:
                    assert keys[i] < keys[j], (a, b)
