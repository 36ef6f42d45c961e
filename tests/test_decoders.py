"""Decoder registry + sniffing heuristics (SURVEY.md §2.1 S1-S4) and text
kernels — mirrors the reference's format-detection tests."""

import pyarrow as pa
import pytest

from grate_ray.sources.registry import (
    NotInFormat,
    UnknownFormat,
    open_payload,
    register,
    registered,
)
from grate_ray.sources.textual import decode_csv, decode_tsv
from grate_ray.functions.text import (
    fingerprint64,
    lang_id,
    normalize_text,
    quality_features,
    token_count,
)


def test_registry_priority_order():
    names = registered()
    assert names.index("tsv") < names.index("csv")  # tsv=10 before csv=15


def test_tsv_accepts_and_decodes():
    fmt, t = open_payload("a\tb\tc\n1\t2\t3\n")
    assert fmt == "tsv"
    assert t["c0"].to_pylist() == ["a", "1"]
    assert t["c2"].to_pylist() == ["c", "3"]


def test_csv_fallback():
    fmt, t = open_payload("a,b\n1,2\n")
    assert fmt == "csv"
    assert t["c1"].to_pylist() == ["b", "2"]


def test_ragged_within_20pct_budget_padded_blank():
    # 5 rows, 1 ragged (20%) → accepted; short row padded with blank
    payload = "a\tb\n1\t2\n3\t4\n5\t6\nx\n"
    with pytest.raises(NotInFormat):
        decode_tsv(payload)  # 4/5 = 80% is NOT > 80% (strict, like >80% in tsv.go)
    payload = "a\tb\n1\t2\n3\t4\n5\t6\n7\t8\nx\n"
    t = decode_tsv(payload)  # 5/6 > 80%
    assert t.num_rows == 6
    assert t["c1"].to_pylist()[-1] == ""


def test_malformed_deadletters():
    with pytest.raises(UnknownFormat):
        open_payload("x\nx,x\nx,x,x\nx")
    with pytest.raises(UnknownFormat):
        open_payload("just a single line of prose")


def test_blank_rows_skipped():
    t = decode_tsv("a\tb\n\n\nc\td\n")
    assert t.num_rows == 2
    assert t["row_idx"].to_pylist() == [0, 3]


def test_custom_register_overrides_and_prioritizes():
    def decode_pipe(p):
        if "|" not in p:
            raise NotInFormat("no pipes")
        rows = [ln.split("|") for ln in p.splitlines()]
        from grate_ray.sources.textual import _to_table

        return _to_table(rows)

    register("pipe", 1, decode_pipe)  # outranks every builtin (sst_book=2)
    try:
        assert registered()[0] == "pipe"
        fmt, t = open_payload("a|b\nc|d")
        assert fmt == "pipe" and t.num_rows == 2
    finally:
        import grate_ray.sources.registry as R

        R._REGISTRY = [e for e in R._REGISTRY if e.name != "pipe"]


def test_normalize_and_tokens():
    col = pa.array(["  a\t\tb \n c ", "", "one"])
    norm = normalize_text(col)
    assert norm.to_pylist() == ["a b c", "", "one"]
    assert token_count(norm).to_pylist() == [3, 0, 1]


def test_quality_features_deterministic():
    t = pa.table({"doc_id": [1, 2], "text": ["hi there you five words ok", "1,2,3!!"]})
    out = quality_features(t)
    assert out["n_tokens"].to_pylist()[0] == 6
    assert out["quality_ok"].to_pylist() == [1, 0]


def test_lang_id_marker_order():
    col = pa.array(
        ["the cat sat", "le chat the", "我 的 猫", "no markers here"]
    )
    assert lang_id(normalize_text(col)).to_pylist() == ["en", "fr", "zh", "und"]


def test_fingerprint_stable_and_distinct():
    a = fingerprint64(pa.array(["x", "y", "x", ""]))
    assert a[0] == a[2]
    assert a[0] != a[1]
    assert fingerprint64(pa.array(["x"]))[0] == a[0]


def test_jsonl_decoder_and_priority():
    from grate_ray.sources.textual import decode_jsonl

    payload = '{"b": 1, "a": "x"}\n{"a": "y", "b": 2}\n'
    fmt, t = open_payload(payload)
    assert fmt == "jsonl"  # priority 5, before tsv/csv
    assert t.column_names == ["row_idx", "c0", "c1"]  # keys sorted: a, b
    assert t["c0"].to_pylist() == ["x", "y"]
    assert t["c1"].to_pylist() == ["1", "2"]
    with pytest.raises(NotInFormat):
        decode_jsonl("a\tb\n1\t2")  # not json
    with pytest.raises(NotInFormat):
        decode_jsonl('{"only_one_key": 1}\n{"only_one_key": 2}')
    # json line payloads don't get mis-sniffed by tsv/csv, and vice versa
    assert open_payload("a\tb\n1\t2")[0] == "tsv"
    assert open_payload("a,b\n1,2")[0] == "csv"


def test_sst_book_roundtrip_and_bounds():
    """S6: per-payload dictionary parsed once, @refs resolved vectorized;
    invalid index is a HARD error (UnknownFormat → dead-letter), not a
    fall-through to another format."""
    import pytest

    from grate_ray.sources.registry import UnknownFormat, open_payload
    from grate_ray.sources.sst import decode_sst_book, encode_sst_book

    payload = encode_sst_book(
        ["alpha", "beta"],
        [("t1", False, ["1\t@0", "2\t@1"]), ("t2", False, ["3\t@0", "4\tplain"])],
    )
    fmt, grid = open_payload(payload)
    assert fmt == "sst_book"
    assert grid["c1"].to_pylist() == ["alpha", "beta", "alpha", "plain"]
    assert grid["_table"].to_pylist() == ["t1", "t1", "t2", "t2"]

    bad = encode_sst_book(["only"], [("t", False, ["1\t@7"])])
    with pytest.raises(UnknownFormat):
        decode_sst_book(bad)
    # a plain book payload is NOT claimed by the sst decoder
    from grate_ray.sources.workbook import encode_book

    fmt2, _ = open_payload(encode_book([("t", False, ["1\tx"])]))
    assert fmt2 == "book"


@pytest.mark.usefixtures("ray_session")
def test_shared_string_resolver_actor_stage():
    """ST1 load-once: dictionary ray.put once, resolved per batch by an
    actor pool."""
    import ray
    import ray.data

    from grate_ray.sources.sst import SharedStringResolver

    dictionary = pa.array(["red", "green", "blue"])
    ref = ray.put(dictionary)
    t = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "color": pa.array([2, 0, 1, 2], pa.int64())})
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            SharedStringResolver,
            fn_constructor_args=(ref, ["color"]),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("k")
    )
    assert out["color"].tolist() == ["blue", "red", "green", "blue"]


@pytest.mark.usefixtures("ray_session")
def test_scan_strict_lenient_timestamp_matrix(sf_dir):
    """The reference's Scan matrix: strict supports *time.Time
    (commonxl/sheet.go:208-213), lenient rejects it (simple.go:99)."""
    import ray.data

    from grate_ray.pipelines.extract import decode_payloads, frame_rows, scan_typed

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def iso(df):
        df = df.copy()
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
        return df

    framed = frame_rows(
        ds.limit(64).map_batches(iso, batch_format="pandas"),
        ["event_id", "ts"], group_mod=4, key_col="event_id",
    )
    decoded = decode_payloads(framed, ncols=2)
    # strict: ISO timestamps parse into timestamp columns
    got = scan_typed(
        decoded, ["event_id", "ts"], [pa.int64(), pa.timestamp("us")], strict=True
    ).to_pandas()
    assert len(got) == 64 and got["ts"].notna().all()
    # lenient: timestamp destination rejected up front
    with pytest.raises(TypeError, match="lenient Scan"):
        scan_typed(decoded, ["event_id", "ts"], [pa.int64(), pa.timestamp("us")])


def test_berr_lookup_golden_mirrors_reference():
    """BoolErr error-label table golden — mirrors berrLookup
    (/root/reference/xls/sheets.go:441-450) entry for entry; unknown
    codes decode to null (dead-letter route), never a wrong label."""
    import pyarrow as pa

    from grate_ray.functions.typed import BERR_LABELS, error_labels

    golden = {
        0x00: "#NULL!",
        0x07: "#DIV/0!",
        0x0F: "#VALUE!",
        0x17: "#REF!",
        0x1D: "#NAME?",
        0x24: "#NUM!",
        0x2A: "#N/A",
        0x2B: "#GETTING_DATA",
    }
    assert BERR_LABELS == golden

    codes = list(golden) + [1, 2, 6, 44, 128, 255, 256, -1, None]
    got = error_labels(pa.array(codes, pa.int64())).to_pylist()
    assert got[: len(golden)] == list(golden.values())
    assert all(v is None for v in got[len(golden):])
