"""Round-5 kernels vs naive references: HLINK binary decode (all moniker
branches), hyperlink range fill, auto-width LSH sizing, CSR triangle
counting."""

import struct

import numpy as np
import pyarrow as pa
import pytest


# --- HLINK decode (T15 full parity, hyperlinks.go:11-146) ------------------


def test_hyperlink_roundtrip_all_kinds():
    from grate_ray.functions.text import decode_hyperlink, encode_hyperlink

    for kind in ("url_moniker", "moniker_str", "location"):
        d, u = decode_hyperlink(
            encode_hyperlink("Quarterly report", "https://x.example/a?b=1", kind)
        )
        assert (d, u) == ("Quarterly report", "https://x.example/a?b=1"), kind


def test_hyperlink_trims_reference_charset():
    from grate_ray.functions.text import decode_hyperlink, encode_hyperlink

    d, u = decode_hyperlink(
        encode_hyperlink("  padded \t", "https://x.example/ \r\n", "moniker_str")
    )
    assert d == "padded"
    assert u == "https://x.example/"


def test_hyperlink_url_moniker_guid_tail_stripped():
    # hand-build the URL-moniker block: utf16 url + NUL + 24-byte tail;
    # the decoder must strip the tail via the terminator check
    from grate_ray.functions.text import (
        HL_HAS_DISPLAY,
        HL_HAS_MONIKER,
        URL_MONIKER_CLSID,
        decode_hyperlink,
    )

    url = "http://e.example/zz"
    u = url.encode("utf-16-le") + b"\x00\x00" + b"\x77" * 24
    raw = (
        b"\x00" * 16
        + struct.pack("<II", 2, HL_HAS_DISPLAY | HL_HAS_MONIKER)
        + struct.pack("<I", 1) + "D".encode("utf-16-le")
        + URL_MONIKER_CLSID
        + struct.pack("<I", len(u))
        + u
    )
    d, link = decode_hyperlink(raw)
    assert (d, link) == ("D", url)


def test_hyperlink_file_moniker_ansi_and_unicode():
    from grate_ray.functions.text import (
        FILE_MONIKER_CLSID,
        HL_HAS_MONIKER,
        decode_hyperlink,
    )

    def file_moniker(ansi: bytes, unicode_path: str | None) -> bytes:
        blk = FILE_MONIKER_CLSID
        blk += struct.pack("<H", 0)  # cAnti
        blk += struct.pack("<I", len(ansi)) + ansi
        blk += b"\x00" * 24  # misc fixed properties
        if unicode_path is None:
            blk += struct.pack("<I", 0)
        else:
            up = unicode_path.encode("utf-16-le")
            blk += struct.pack("<I", len(up) + 6) + b"\x00" * 6 + up
        return b"\x00" * 16 + struct.pack("<II", 2, HL_HAS_MONIKER) + blk

    _, link = decode_hyperlink(file_moniker(b"C:\\docs\\a.xls", None))
    assert link == "C:\\docs\\a.xls"
    _, link = decode_hyperlink(file_moniker(b"ignored", "D:\\b\\c.xls"))
    assert link == "D:\\b\\c.xls"


def test_hyperlink_unknown_version_and_moniker_raise():
    from grate_ray.functions.text import (
        HL_HAS_MONIKER,
        decode_hyperlink,
        encode_hyperlink,
    )

    bad_ver = bytearray(encode_hyperlink("d", "u", "moniker_str"))
    bad_ver[16:20] = struct.pack("<I", 3)
    with pytest.raises(ValueError):
        decode_hyperlink(bytes(bad_ver))
    bad_clsid = (
        b"\x00" * 16 + struct.pack("<II", 2, HL_HAS_MONIKER) + b"\xEE" * 16
    )
    with pytest.raises(ValueError):
        decode_hyperlink(bad_clsid)


def test_hyperlink_range_fill_sentinels():
    from grate_ray.stages.expand import (
        CONTINUE_ROW_MERGED,
        END_ROW_MERGED,
        expand_hyperlink_range,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "span": pa.array([1, 2, 3], pa.int64()),
            "display": pa.array(["a", "b", "c"]),
            "url": pa.array(["u1", "u2", "u3"]),
        }
    )
    out = expand_hyperlink_range(t)
    assert out["cell"].to_pylist() == [
        "a <u1>",
        "b <u2>", END_ROW_MERGED,
        "c <u3>", CONTINUE_ROW_MERGED, END_ROW_MERGED,
    ]
    assert out["row_off"].to_pylist() == [0, 0, 1, 0, 1, 2]


# --- auto-width LSH sizing ---------------------------------------------------


def test_auto_nbits_matches_float_rule_and_sql_formula():
    from grate_ray.functions.ann import PLANE_PREFIX_WIDTH, auto_nbits

    for n in [1, 2, 23, 24, 25, 48, 49, 100, 1000, 24 * 2**10, 24 * 2**10 + 1,
              10**6, 10**9, 10**12]:
        want = int(np.clip(np.ceil(np.log2(max(n, 2) / 24)), 8,
                           PLANE_PREFIX_WIDTH))
        assert auto_nbits(n) == want, n
        # the SQL mirror: least(greatest(length(bin((n+23)//24 max 2 - 1)),8),24)
        m = max(-(-n // 24), 2)
        sql = min(max(len(bin(m - 1)[2:]), 8), PLANE_PREFIX_WIDTH)
        assert auto_nbits(n) == sql, n


def test_hyperplanes_prefix_stable():
    from grate_ray.functions.ann import PLANE_PREFIX_WIDTH, hyperplanes

    full = hyperplanes(64, PLANE_PREFIX_WIDTH, 5)
    for nbits in (4, 8, 16):
        np.testing.assert_array_equal(hyperplanes(64, nbits, 5),
                                      full[:, :nbits])


# --- CSR triangle counter ----------------------------------------------------


def _naive_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    count = 0
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            count += sum(1 for c in adj[a] & adj[b] if c > b)
    return count


def test_triangle_counter_csr_vs_naive(ray_session):
    import ray
    import ray.data

    from grate_ray.functions.graph import triangle_count

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 400)
    b = rng.integers(0, 40, 400)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    # include duplicate edges on purpose: the counter must dedup
    t = pa.table({"a": pa.array(lo), "b": pa.array(hi)})
    got = triangle_count(ray.data.from_arrow(t)).to_pandas()
    want = _naive_triangles(set(zip(lo.tolist(), hi.tolist())))
    assert got["n_triangles"].iloc[0] == want


def test_triangle_counter_empty_and_cap(ray_session):
    import ray.data

    from grate_ray.functions.graph import triangle_count

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = triangle_count(ray.data.from_arrow(empty)).to_pandas()
    assert out["n_triangles"].iloc[0] == 0
    t = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([2, 3], pa.int64())})
    with pytest.raises(ValueError):
        triangle_count(ray.data.from_arrow(t), max_edges=1)


# --- behavior kernels vs naive references ------------------------------------


def _naive_sessions(rows, gap_us):
    # rows: (user, ts, eid) — sorted per user by (ts, eid)
    from collections import defaultdict

    per = defaultdict(list)
    for u, ts, eid in rows:
        per[u].append((ts, eid))
    out = {}
    for u, evs in per.items():
        evs.sort()
        sessions = 1
        for (a, _), (b, _) in zip(evs, evs[1:]):
            if b - a > gap_us:
                sessions += 1
        out[u] = (sessions, len(evs))
    return out


def test_session_windows_vs_naive(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from grate_ray.pipelines.behavior import session_windows

    rng = np.random.default_rng(11)
    n = 3_000
    u = rng.integers(0, 25, n)
    ts = np.sort(rng.integers(0, 10**10, n))
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "user_id": pa.array(u.astype(np.int64)),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.zeros(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path / "events.parquet"
    pq.write_table(t, d)
    got = session_windows(str(tmp_path), gap_minutes=30).to_pandas()
    want = _naive_sessions(
        list(zip(u.tolist(), ts.tolist(), range(n))), 30 * 60 * 1_000_000
    )
    assert len(got) == len(want)
    for _, r in got.iterrows():
        s, e = want[r["user_id"]]
        assert (r["n_sessions"], r["n_events"]) == (s, e), r["user_id"]


def test_funnel_conversion_chaining(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from grate_ray.pipelines.behavior import funnel_conversion

    # user 1: view->click->purchase in order (reaches all 3)
    # user 2: click before view (click after? no) -> only view
    # user 3: view, purchase, click (purchase before click: stops at click? view->click yes, purchase BEFORE click: not counted)
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "click"), (2, 20, "view"),
        (3, 10, "view"), (3, 20, "purchase"), (3, 30, "click"),
        (4, 10, "purchase"), (4, 20, "signup"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64) * 1_000_000
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = funnel_conversion(str(tmp_path)).to_pandas().sort_values("step")
    # step0: users 1,2,3 viewed; step1: 1 and 3 clicked after view;
    # step2: only 1 purchased after its click
    assert got["n_users"].tolist() == [3, 2, 1]
    assert got["conversion"].tolist() == [1.0, round(2 / 3, 6), round(1 / 3, 6)]


def test_retention_cohorts_dedup(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from grate_ray.pipelines.behavior import retention_cohorts

    wk = 7 * 24 * 3600 * 1_000_000
    # user 1: weeks 0,0,1 (dup in week 0); user 2: weeks 1,3
    rows = [(1, 0), (1, wk // 2), (1, wk + 5), (2, wk), (2, 3 * wk)]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64)
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        retention_cohorts(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    # cohort 0 (user 1): offsets 0 and 1; cohort 1 (user 2): offsets 0 and 2
    cells = set(
        zip(got["cohort_week"], got["week_offset"], got["n_users"])
    )
    assert cells == {(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 2, 1)}


# --- A1/R1C1 ref kernel (types.go:46-80 parity) -------------------------------


def test_col2int_reference_goldens():
    from grate_ray.functions.refs import col2int, int2col

    # the reference's own doc examples: "A"=0, "B"=1, "AA"=26, "BB"=53
    for s, want in (("A", 0), ("B", 1), ("Z", 25), ("AA", 26), ("BB", 53)):
        assert col2int(s) == want, s
        assert int2col(want) == s, want
    for i in range(0, 20_000, 137):
        assert col2int(int2col(i)) == i


def test_ref_to_indexes_modes():
    from grate_ray.functions.refs import ref_to_indexes

    assert ref_to_indexes("A1") == (0, 0)
    assert ref_to_indexes("BB54") == (53, 53)
    assert ref_to_indexes("AA27") == (26, 26)
    # R1C1 (offset quirk resolved — see refs.py docstring)
    assert ref_to_indexes("R3C7") == (7, 2)
    # malformed → (-1, -1), the reference's contract
    for bad in ("", "A", "1A", "7", "R3C", "ABC"):
        assert ref_to_indexes(bad) == (-1, -1), bad


def test_refs_to_indexes_vectorized_matches_scalar():
    import numpy as np

    from grate_ray.functions.refs import int2col, ref_to_indexes, refs_to_indexes

    refs = np.array(
        [int2col(i % 800) + str(i + 1) for i in range(0, 4000, 7)]
        + ["R2C9", "bogus", None],
        dtype=object,
    )
    cols, rows = refs_to_indexes(refs)
    for i, r in enumerate(refs):
        want = ref_to_indexes(r) if isinstance(r, str) else (-1, -1)
        assert (cols[i], rows[i]) == want, r


# --- fixed-width decoder sniffing ---------------------------------------------


def test_fixedwidth_decoder_accepts_aligned_and_rejects_others():
    from grate_ray.sources.registry import open_payload
    from grate_ray.sources.textual import decode_fixedwidth

    good = "1    alpha   2.5\n23   beta    4.0\n456  gamma  10.25"
    name, t = open_payload(good)
    assert name == "fixedw"
    assert t.num_rows == 3 and t.num_columns == 4  # row_idx + c0..c2
    assert t["c1"].to_pylist() == ["alpha", "beta", "gamma"]

    import pytest as _pytest

    from grate_ray.sources.registry import NotInFormat

    with _pytest.raises(NotInFormat):
        decode_fixedwidth("a\tb\nc\td")  # tabs → not fixed-width
    with _pytest.raises(NotInFormat):
        decode_fixedwidth("single-column\nlines\nonly")
    # <80% consistent column counts
    with _pytest.raises(NotInFormat):
        decode_fixedwidth("a  b\nc  d  e\nf  g  h\ni  j  k  l\nm  n  o  p  q")


def test_fixedwidth_single_spaces_stay_in_cell():
    from grate_ray.sources.textual import decode_fixedwidth

    t = decode_fixedwidth("New York  10\nSan Francisco  20")
    assert t["c0"].to_pylist() == ["New York", "San Francisco"]
    assert t["c1"].to_pylist() == ["10", "20"]


from hypothesis import given, settings
from hypothesis import strategies as st

_cell = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(_cell, min_size=2, max_size=5),
        min_size=1,
        max_size=20,
    )
)
def test_fixedwidth_property_roundtrip(rows):
    # normalize to a rectangle (fixed-width layouts are rectangular)
    from grate_ray.sources.textual import decode_fixedwidth

    ncols = min(len(r) for r in rows)
    rows = [r[:ncols] for r in rows]
    widths = [max(len(r[j]) for r in rows) + 2 for j in range(ncols)]
    lines = [
        "".join(
            r[j].ljust(widths[j]) if j < ncols - 1 else r[j]
            for j in range(ncols)
        )
        for r in rows
    ]
    t = decode_fixedwidth("\n".join(lines))
    for j in range(ncols):
        assert t[f"c{j}"].to_pylist() == [r[j] for r in rows]
