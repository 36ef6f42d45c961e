"""T8 full number-format compiler golden tests, mirroring the reference's
commonxl/fmt_test.go:14-82 (comma grouping table, bool-section formatter)
plus the makeFormatter combinator matrix (formats.go:76-196) the reference's
disabled basic2/multi_test fixtures exercise (xls/simple_test.go:17-21).

No Ray needed — these are pure scalar/vector kernels."""

import numpy as np
import pyarrow as pa
import pytest

from grate_ray.functions.numfmt import (
    BUILTIN_FORMAT_TYPES,
    BUILTIN_FORMATS,
    Formatter,
    add_commas,
    convert_serial_date,
    make_formatter,
    render_column,
)
from grate_ray.functions.format import format_general


# the reference's TestCommas table (fmt_test.go:14-73), restricted to rows
# where the Go fixture agrees with identFunc's code path (the fixture's
# large-float rows assume fmt.Sprint, which identFunc as written short-cuts;
# see fmt.go:69-77)
COMMAS_GOLDEN = [
    (10, "10"), (10.0, "10"), (10.12345, "10.12345"),
    (-10, "-10"), (-10.0, "-10"), (-9.87655, "-9.87655"),
    (100, "100"), (100.0, "100"), (100.12345, "100.12345"),
    (-100, "-100"), (-99.87655, "-99.87655"),
    (1000, "1,000"), (1000.0, "1,000"), (1000.12345, "1,000.12345"),
    (-1000, "-1,000"), (-999.87655, "-999.87655"),
    (10000, "10,000"), (10000.12345, "10,000.12345"),
    (100000, "100,000"), (-100000, "-100,000"),
    (1000000, "1,000,000"), (-1000000, "-1,000,000"),
    (10000000, "10,000,000"), (100000000, "100,000,000"),
]


def test_commas_golden_table():
    cf = add_commas(format_general)
    for v, want in COMMAS_GOLDEN:
        assert cf(v) == want, (v, cf(v), want)


def test_bool_sections_formatter():
    # fmt_test.go TestBoolFormats: `"yes";"yes";"no"`
    ff, ctype = make_formatter('"yes";"yes";"no"')
    assert ctype == "string"
    for v in (False, 0, 0.0):
        assert ff(v) == "no", v
    for v in (True, 99, -4, 4.0, -99.0):
        assert ff(v) == "yes", v


def test_make_formatter_number_matrix():
    cases = [
        # code, value, expected, cell type
        ("0", 12.7, "12", "integer"),            # %d truncates toward zero
        ("0", -12.7, "-12", "integer"),
        ("0.00", 3.14159, "3.14", "float"),
        ("#,##0", 1234567, "1,234,567", "integer"),
        ("#,##0.00", 9561.951, "9,561.95", "float"),
        ("#,##0.00", -9561.951, "-9,561.95", "float"),
        ("0%", 0.123, "12%", "integer"),          # percent ×100
        ("0.00%", 0.12345, "12.35%", "float"),
        ("0.00E+00", 12345.0, "1.23E+04", "float"),
        ('"$"#,##0.00', 1234.5, "$1,234.50", "float"),
        ('"$"#,##0.00', -1234.5, "$-1,234.50", "float"),  # custom neg keeps sign
        ("#,##0;(#,##0)", -1234.5, "(-1,234)", "integer"),  # section keeps sign
        ("#,##0;(#,##0)", 1234.5, "1,234", "integer"),
        ('0;(0);"zero"', 0, "zero", "integer"),
        ('0;(0);"zero"', -3, "(-3)", "integer"),
        ("@", "hello", "hello", "string"),
        ('"flag"', 77, "flag", "string"),          # pure literal → static
    ]
    for code, v, want, wtype in cases:
        ff, ctype = make_formatter(code)
        assert ff(v) == want, (code, v, ff(v), want)
        assert ctype == wtype, (code, ctype, wtype)


def test_builtin_funcs_match_reference_table():
    # spot the hardcoded goFormatters combinators (fmt.go:215-303)
    fmt = Formatter()
    assert fmt.apply(1, 42.9) == "42"
    assert fmt.apply(2, 42.9) == "42.90"
    assert fmt.apply(3, 1234567) == "1,234,567"
    assert fmt.apply(4, -1234.5) == "-1,234.50"
    assert fmt.apply(9, 0.42) == "42%"
    assert fmt.apply(10, 0.4256) == "42.56%"
    assert fmt.apply(11, 98765.0) == "9.88E+04"
    assert fmt.apply(37, -1234567) == "(1,234,567)"   # built-in neg-parens strips sign
    assert fmt.apply(39, -1234.5) == "(1,234.50)"
    assert fmt.apply(41, 0) == "-"                    # zero-dash
    assert fmt.apply(41, 1234567) == "1,234,567"
    assert fmt.apply(42, 1234) == "$1,234"
    assert fmt.apply(42, -1234) == "$(-1,234)"
    assert fmt.apply(42, 0) == "$-"
    assert fmt.apply(12, 0.5) == "1/2"
    assert fmt.apply(12, -0.5) == "-1/2"              # sign on numerator
    assert fmt.apply(13, 2.333333) == "2 1/3"
    assert fmt.apply(49, "txt") == "txt"


def test_builtin_date_funcs():
    from datetime import datetime

    fmt = Formatter()
    t = datetime(2014, 3, 27, 9, 37, 5)
    assert fmt.apply(14, t) == "03-27-14"
    assert fmt.apply(15, t) == "27-Mar-14"
    assert fmt.apply(20, t) == "09:37"
    assert fmt.apply(21, t) == "09:37:05"
    assert fmt.apply(22, t) == "3/27/14 09:37"
    assert fmt.apply(18, t) == "9:37 AM"
    assert fmt.apply(31, t) == "2014年3月27日"
    assert fmt.apply(34, t) == "上午 9时37分"


def test_serial_date_conversion():
    # Excel serials in the 1900 system: 61 = 1900-03-01 (first clean day
    # after the Lotus leap-year quirk window), 25569 = 1970-01-01
    assert convert_serial_date(61.0).strftime("%Y-%m-%d") == "1900-03-01"
    assert convert_serial_date(25569.0).strftime("%Y-%m-%d") == "1970-01-01"
    assert convert_serial_date(25569.5).strftime("%H:%M") == "12:00"
    # Julian path below 61: the reference's formula (dates.go:12-36) gives
    # the REAL calendar date (1899-12-31), correcting the Lotus quirk that
    # makes Excel itself display serial 1 as 1900-01-01
    assert convert_serial_date(1.0).strftime("%Y-%m-%d") == "1899-12-31"
    # 1904 mode shifts the epoch
    assert convert_serial_date(100.0, mode1904=True).strftime("%Y-%m-%d") == "1904-04-10"
    # a numeric value through a date format id
    fmt = Formatter()
    assert fmt.apply(14, 25569.0) == "01-01-70"


def test_custom_date_code_via_compiler():
    from datetime import datetime

    ff, ctype = make_formatter("yyyy-mm-dd hh:mm:ss")
    assert ctype == "date"
    assert ff(datetime(2021, 7, 4, 5, 6, 7)) == "2021-07-04 05:06:07"
    ff2, _ = make_formatter('m/d/yy h:mm:ss')
    assert ff2(datetime(2021, 7, 4, 5, 6, 7)) == "7/4/21 5:06:07"


def test_formatter_registry_rules():
    fmt = Formatter()
    with pytest.raises(ValueError):
        fmt.add(4, "0.00")      # can't replace built-ins
    fmt.add(164, "#,##0.0")
    with pytest.raises(ValueError):
        fmt.add(164, "0")       # can't replace existing
    fmt.add(165, "General")     # aliases to id 0
    assert fmt.apply(165, 12.5) == "12.5"
    assert fmt.apply(164, 1234.56) == "1,234.6"
    assert fmt.get_cell_type(164) == "float"
    assert fmt.get_cell_type(4) == "float"


def test_builtin_tables_complete():
    # every typed id has a code and a compiled func (formats.go:227-382)
    fmt = Formatter()
    for fid in BUILTIN_FORMAT_TYPES:
        assert fid in BUILTIN_FORMATS
        assert fmt.get(fid) is not None
    assert len(BUILTIN_FORMATS) == 70  # 0..81 minus gaps (5-8, 23-26, 63-66)


def test_render_column_vectorized_matches_scalar():
    vals = pa.array([0.0, 1234.567, -9876.5, 0.125, None, 42.0], pa.float64())
    for code in ("#,##0.00", "0%", "0.00E+00", '"$"#,##0.00', "0"):
        got = render_column(vals, code).to_pylist()
        ff, _ = make_formatter(code)
        want = [None if v is None else ff(v) for v in vals.to_pylist()]
        assert got == want, (code, got, want)
    # section codes fall back to the compiled closure
    got = render_column(vals, '0;(0);"zero"').to_pylist()
    assert got == ["zero", "1234", "(-9876)", "0", None, "42"]
