"""Styles/numFmt sidecar (S7) — parseStyles recast
(/root/reference/xlsx/workbook.go:104-182)."""

import pyarrow as pa
import pytest

from grate_ray.state.styles import (
    format_codes,
    format_ids,
    parse_styles,
    render_styled,
)


SIDECAR = [
    "numfmt 164 #,##0.00",
    'numfmt 165 "$"#,##0.00',
    "stylexf 0 0",
    "stylexf 2 1",
    "cellxf 9 0 0",    # apply off → strips to General
    "cellxf 164 1 1",
    "cellxf 2 1 0",
    "cellxf 165 1 1",
]


def test_parse_resolves_xfs_like_reference():
    sc = parse_styles(SIDECAR)
    # apply="0" strips to 0 regardless of own/base id; apply="1" takes
    # the cell xf's own numFmtId (workbook.go:149-156)
    assert sc.xfs.tolist() == [0, 164, 2, 165]
    assert sc.code_of(164) == "#,##0.00"
    assert sc.code_of(0) == "General"
    assert sc.code_of(2) == "0.00"


def test_custom_cannot_replace_builtin_or_reregister():
    with pytest.raises(ValueError):
        parse_styles(["numfmt 2 0.000"])  # builtin id (formats.go:40-44)
    with pytest.raises(ValueError):
        parse_styles(["numfmt 164 0.0", "numfmt 164 0.00"])


def test_unknown_row_and_bad_xfid_rejected():
    with pytest.raises(ValueError):
        parse_styles(["wat 1 2"])
    with pytest.raises(ValueError):
        parse_styles(["stylexf 0 1", "cellxf 2 1 7"])  # xfId out of range


def test_format_ids_and_codes_vectorized():
    sc = parse_styles(SIDECAR)
    idx = pa.array([0, 1, 2, 3, 1], pa.int64())
    assert format_ids(sc, idx).to_pylist() == [0, 164, 2, 165, 164]
    assert format_codes(sc, idx).to_pylist() == [
        "General", "#,##0.00", "0.00", '"$"#,##0.00', "#,##0.00",
    ]
    with pytest.raises(IndexError):
        format_ids(sc, pa.array([4], pa.int64()))


def test_render_styled_per_distinct_format():
    sc = parse_styles(SIDECAR)
    vals = pa.array([1234.5, 1234.5, -7.125, 1e6], pa.float64())
    idx = pa.array([1, 2, 3, 1], pa.int64())
    out = render_styled(sc, vals, idx).to_pylist()
    # -7.125 → "$-7.12": C-printf half-to-even, same as the SQL mirror
    assert out == ["1,234.50", "1234.50", "$-7.12", "1,000,000.00"]


def test_empty_sidecar_is_valid():
    sc = parse_styles([])
    assert sc.xfs.tolist() == []
    assert sc.code_of(0) == "General"
