"""CFB/OLE2 container (S8) + basic-RC4 decryption (S10) — spec-level
round trips mirroring the reference's cfb/crypto layers
(/root/reference/xls/cfb/cfb.go, /root/reference/xls/crypto/)."""

import hashlib
import random

import pytest

from grate_ray.sources import cfb, crypto


def _rand_bytes(n: int, seed: int = 0) -> bytes:
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(n))


# -- CFB writer/parser -----------------------------------------------------


def test_cfb_roundtrip_mixed_streams():
    streams = {
        "tiny": b"hello world",
        "empty": b"",
        "mini_edge": _rand_bytes(4095, 1),  # last mini-stream size
        "big_edge": _rand_bytes(4096, 2),  # first regular-FAT size
        "big": _rand_bytes(100_000, 3),
        "Workbook": b"A\t1\nB\t2\n" * 300,
    }
    doc = cfb.parse(cfb.write_cfb(streams))
    assert doc.list_streams() == sorted(
        (n, len(b)) for n, b in streams.items()
    )
    for n, b in streams.items():
        assert doc.read_stream(n) == b


def test_cfb_writer_deterministic():
    streams = {"a": b"x" * 10, "b": _rand_bytes(9000, 4)}
    assert cfb.write_cfb(streams) == cfb.write_cfb(dict(reversed(streams.items())))


def test_cfb_v4_roundtrip_mixed_streams():
    # MajorVersion 4: 4096-byte sectors, version-switched shift
    # (reference accepts both, cfb.go:125-158,254)
    streams = {
        "tiny": b"hello world",
        "empty": b"",
        "mini_edge": _rand_bytes(4095, 11),  # last mini-stream size
        "big_edge": _rand_bytes(4096, 12),  # exactly one v4 payload sector
        "big": _rand_bytes(200_000, 13),  # multi-sector regular chain
        "Workbook": b"A\t1\nB\t2\n" * 300,
    }
    blob = cfb.write_cfb(streams, version=4)
    # header struct says major=4 / shift=12 and the first block is one
    # full 4096-byte sector
    assert blob[26:28] == (4).to_bytes(2, "little")
    assert blob[30:32] == (12).to_bytes(2, "little")
    assert len(blob) % 4096 == 0
    doc = cfb.parse(blob)
    assert doc.list_streams() == sorted(
        (n, len(b)) for n, b in streams.items()
    )
    for n, b in streams.items():
        assert doc.read_stream(n) == b


def test_cfb_v4_multi_directory_sector():
    # >32 entries per 4096-byte dir sector: force a chained directory
    # and a populated v4 directory-sector count header field
    streams = {f"s{i:03d}": _rand_bytes(100 + i, i) for i in range(70)}
    blob = cfb.write_cfb(streams, version=4)
    ndirsect = int.from_bytes(blob[40:44], "little")
    assert ndirsect >= 3  # 71 entries / 32 per sector
    doc = cfb.parse(blob)
    for n, b in streams.items():
        assert doc.read_stream(n) == b


def test_cfb_v4_rejects_wrong_shift():
    blob = bytearray(cfb.write_cfb({"a": b"x"}, version=4))
    blob[30:32] = (9).to_bytes(2, "little")  # v4 must use shift 12
    with pytest.raises(cfb.CorruptCFB):
        cfb.parse(bytes(blob))


def test_cfb_same_streams_both_versions_equal_content():
    streams = {"a": _rand_bytes(3000, 21), "b": _rand_bytes(50_000, 22)}
    d3 = cfb.parse(cfb.write_cfb(streams, version=3))
    d4 = cfb.parse(cfb.write_cfb(streams, version=4))
    assert d3.list_streams() == d4.list_streams()
    for n in streams:
        assert d3.read_stream(n) == d4.read_stream(n) == streams[n]


def test_cfb_difat_spill_chain():
    # >109 FAT sectors (~7 MB) forces chained DIFAT sectors — the
    # reference's cfb.go:183-212 path
    streams = {f"s{i:03d}": _rand_bytes(500_000, i) for i in range(16)}
    blob = cfb.write_cfb(streams)
    assert len(blob) > 109 * 128 * 512  # DIFAT header slots exhausted
    doc = cfb.parse(blob)
    for n, b in streams.items():
        assert doc.read_stream(n) == b


def test_cfb_sniff_rejects_foreign_payloads():
    for junk in (b"", b"PK\x03\x04zipzip", b"\x00" * 2048, b"#table x\n1\t2"):
        with pytest.raises(cfb.NotCFB):
            cfb.parse(junk)


def test_cfb_full_assertions_reject_corrupt_header():
    blob = bytearray(cfb.write_cfb({"s": b"data"}))
    blob[8] = 0xAB  # non-zero CLSID → CorruptCFB (cfb.go:121-123)
    with pytest.raises(cfb.CorruptCFB):
        cfb.parse(bytes(blob))
    blob2 = bytearray(cfb.write_cfb({"s": b"data"}))
    blob2[30] = 0x08  # sector shift 8 invalid for v3 (cfb.go:138-141)
    with pytest.raises(cfb.CorruptCFB):
        cfb.parse(bytes(blob2))


def test_cfb_missing_stream_raises_keyerror():
    doc = cfb.parse(cfb.write_cfb({"s": b"data"}))
    with pytest.raises(KeyError):
        doc.read_stream("nope")


# -- RC4 / MS-OFFCRYPTO ----------------------------------------------------


def test_rc4_public_vectors():
    # classic published RC4 vectors
    assert crypto._RC4(b"Key").crypt(b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert crypto._RC4(b"Wiki").crypt(b"pedia").hex() == "1021bf0420"
    assert (
        crypto._RC4(b"Secret").crypt(b"Attack at dawn").hex()
        == "45a01f645fc35b383552544b9bf5"
    )


def test_filepass_verify_and_reject():
    fp = crypto.make_filepass()
    h = crypto.BasicRC4(fp).verify()  # VelvetSweatshop default
    assert len(h) == 16
    with pytest.raises(crypto.VerifyFailed):
        crypto.BasicRC4(fp).verify("wrong password")
    with pytest.raises(crypto.BadFilePass):
        crypto.BasicRC4(fp[:-1])  # 51 bytes
    bad_minor = bytearray(fp)
    bad_minor[2] = 9
    with pytest.raises(crypto.BadFilePass):
        crypto.BasicRC4(bytes(bad_minor))


def test_stream_crypt_block_rekey_and_reset():
    h = crypto.derive_std97_key("pw", b"\x11" * 16)
    data = _rand_bytes(5000, 5)  # crosses four 1024-byte boundaries
    enc = crypto.crypt_stream(h, data)
    assert enc != data
    assert crypto.crypt_stream(h, enc) == data  # symmetric
    # block counter resets per stream: a prefix encrypts identically
    assert crypto.crypt_stream(h, data[:700]) == enc[:700]
    # ...but block 1 is rekeyed, not a keystream continuation
    tail = crypto.crypt_stream(h, data[1024:2048])
    assert tail != enc[1024:2048]


def test_std97_key_derivation_shape():
    h1 = crypto.derive_std97_key("a", b"\x00" * 16)
    h2 = crypto.derive_std97_key("b", b"\x00" * 16)
    assert h1 != h2 and len(h1) == len(h2) == 16
    # deterministic
    assert h1 == crypto.derive_std97_key("a", b"\x00" * 16)
    with pytest.raises(ValueError):
        crypto.derive_std97_key("", b"\x00" * 16)


# -- end-to-end container pipelines ---------------------------------------


@pytest.mark.parametrize("encrypt", [False, True])
def test_container_roundtrip_pipeline(ray_session, sf_dir, encrypt):
    import pandas as pd

    from grate_ray.pipelines.container import cfb_roundtrip

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    got = (
        cfb_roundtrip(sf_dir, encrypt=encrypt)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{sf_dir}/customer.parquet", columns=cols)
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    got = got[cols].astype({c: want[c].dtype.name for c in cols})
    pd.testing.assert_frame_equal(got, want)


def test_wrong_password_deadletters_container(ray_session, tmp_path):
    """A container the stage cannot verify must dead-letter, not crash
    (the engine's hardening of xls.go:210-226's fail-fast)."""
    import ray

    from grate_ray.pipelines.container import CFBExtractor
    from grate_ray.pipelines.extract import decode_payloads

    h = crypto.BasicRC4(crypto.make_filepass("realpass")).verify("realpass")
    streams = {
        "FilePass": crypto.make_filepass("realpass"),
        "data": crypto.crypt_stream(h, b"1\ta\n2\tb"),
    }
    p = tmp_path / "enc.cfb"
    p.write_bytes(cfb.write_cfb(streams))

    ds = ray.data.read_binary_files(str(tmp_path), include_paths=True)
    extracted = ds.map_batches(
        CFBExtractor,
        fn_constructor_kwargs={"password": "not-the-password"},
        batch_format="pyarrow",
        concurrency=1,
    )
    out = decode_payloads(extracted, ncols=2).to_pandas()
    assert (out["format"] == "deadletter").all()
    assert "verification failed" in out["payload"].iloc[0]


# -- property: arbitrary stream dicts survive the round trip ---------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N"), max_codepoint=0x2FF
            ),
            min_size=1,
            max_size=31,
        ),
        st.binary(max_size=12_000),
        min_size=1,
        max_size=6,
    )
)
def test_cfb_roundtrip_property(streams):
    doc = cfb.parse(cfb.write_cfb(streams))
    assert doc.list_streams() == sorted(
        (n, len(b)) for n, b in streams.items()
    )
    for n, b in streams.items():
        assert doc.read_stream(n) == b
