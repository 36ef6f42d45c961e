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


def test_cell_equal_golden_table():
    """Cell.Equal mirror (cell.go:319-344) golden table, including the
    documented reference quirk (second operand re-parses the FIRST
    cell's print when non-numeric) and nil-equal-to-everything."""
    from grate_ray.functions.ordering import cell_equal

    golden = [
        # numeric promotions
        (5, 5.0, True), (5, 5, True), (5.0, 5.0, True), (5, 6, False),
        (-1, -1.0, True), (0, 0.0, True),
        # numeric vs numeric-string (string first: parses its own print)
        ("5", 5, True), ("5.5", 5.5, True), ("5.5e1", 55.0, True),
        ("6", 5, False),
        # the c[0]-reparse quirk: with a NUMERIC first cell the second
        # operand re-parses the first cell's print, so ANY non-numeric
        # second operand compares equal — including a different number
        # spelled as a string (cell.go:336 uses c[0], kept verbatim)
        (5, "5", True), (5, "6", True), (5, "abc", True), (0, "abc", True),
        # reverse order: junk first parses 0.0
        ("abc", 5, False), ("abc", 0, True), ("abc", 0.0, True),
        # bools through the numeric branch print as true/false → 0.0
        (True, 0.0, True), (True, 1.0, False), (False, 0, True),
        # non-numeric branch: Less-symmetry
        ("a", "a", True), ("a", "b", False),
        (True, True, True), (True, False, False), (False, False, True),
        (None, "x", True), (None, None, True), ("x", None, True),
        # bool vs truthy string (non-numeric branch, boolStrings table)
        (True, "yes", True), (False, "no", True), (False, "yes", False),
    ]
    for a, b, want in golden:
        assert cell_equal(a, b) is want, (a, b, want)


def test_cells_equal_wires_lake_golden(ray_session, tmp_path):
    """The reference compares decoded states against goldens with
    Cell.Equal (simple_test.go:77); mirror that: a replayed lake state
    must compare cell-equal to the DuckDB arg_max golden column-wise,
    and a perturbed copy must NOT."""
    import duckdb
    import numpy as np

    from grate_ray.functions.ordering import cells_equal
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import ingest, read_lake

    bl, lk = str(tmp_path / "binlog"), str(tmp_path / "lake")
    generate_binlog(bl, GenSpec(num_events=4_000, num_convs=30, chunk_rows=2_000))
    ingest(bl, lk, num_partitions=4, files_per_microbatch=None)
    got = (
        read_lake(lk)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        with w as (
          select *, row_number() over (
            partition by conv_id, turn_idx order by ts desc, lsn desc) rn
          from read_parquet('{bl}/*.parquet'))
        select conv_id, turn_idx, role, text from w
        where rn = 1 and op <> 'D' order by conv_id, turn_idx
        """
    ).df()
    assert len(got) == len(want) > 0
    for col in ("conv_id", "role", "text"):
        eq = cells_equal(
            got[col].where(got[col].notna(), None).tolist(),
            want[col].where(want[col].notna(), None).tolist(),
        )
        assert eq.all(), col
    # a perturbed state must fail the same comparison
    bad = got["text"].copy()
    bad.iloc[0] = (bad.iloc[0] or "") + "-corrupted"
    assert not cells_equal(
        bad.where(bad.notna(), None).tolist(),
        want["text"].where(want["text"].notna(), None).tolist(),
    ).all()
