"""General-format rendering unit tests (≅ /root/reference/commonxl/fmt_test.go)."""

import pyarrow as pa

from grate_ray.functions.format import format_general, render_strings


def test_integers():
    assert format_general(0) == "0"
    assert format_general(-42) == "-42"
    assert format_general(12345678901) == "12345678901"  # exactly 11 chars


def test_floats_trim():
    assert format_general(1.5) == "1.5"
    assert format_general(2.0) == "2"
    assert format_general(-0.25) == "-0.25"


def test_wide_values_go_scientific():
    s = format_general(123456789012345.0)
    assert len(s) <= 11 and "E" in s
    s2 = format_general(1.23456789012345e-10)
    assert len(s2) <= 11


def test_bool_blank():
    assert format_general(True) == "TRUE"
    assert format_general(False) == "FALSE"
    assert format_general(None) == ""


def test_render_strings_projection():
    t = pa.table({"a": [1, None], "b": [1.5, 2.0], "c": ["x", None]})
    out = render_strings(t)
    assert out["a"].to_pylist() == ["1", ""]
    assert out["b"].to_pylist() == ["1.5", "2"]
    assert out["c"].to_pylist() == ["x", ""]
    assert all(str(f.type) == "string" for f in out.schema)
