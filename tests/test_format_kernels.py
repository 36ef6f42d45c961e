"""Date-format translation (T10), fraction approximation (T11), RK decode
(T12) kernel tests — the reference's fmt/frac unit-test strategy
(SURVEY.md §5.3) applied to the engine's own kernels."""

import numpy as np
import pyarrow as pa


def test_translate_date_code_minute_vs_month():
    from grate_ray.functions.format import translate_date_code as tr

    # m flanked by date tokens is MONTH
    assert tr("yyyy-mm-dd") == "%Y-%m-%d"
    assert tr("m/d/yyyy") == "%-m/%-d/%Y"
    # m after an hour (or before a second) is MINUTE
    assert tr("hh:mm:ss") == "%H:%M:%S"
    assert tr("h:mm") == "%-H:%M"
    assert tr("mm:ss") == "%M:%S"
    # mixed: date month AND time minute in one code
    assert tr("yyyy-mm-dd hh:mm:ss") == "%Y-%m-%d %H:%M:%S"


def test_render_datetime_truncates_to_seconds():
    import pandas as pd

    from grate_ray.functions.format import render_datetime

    ts = pa.array([pd.Timestamp("2024-03-05 07:09:03.789")]).cast(pa.timestamp("us"))
    assert render_datetime(ts, "yyyy-mm-dd hh:mm:ss").to_pylist() == [
        "2024-03-05 07:09:03"
    ]
    assert render_datetime(ts, "m/d/yyyy").to_pylist() == ["3/5/2024"]


def test_approx_fraction_known_values():
    from grate_ray.functions.format import approx_fraction, render_fraction

    assert approx_fraction(0.5, 1) == (0, 1, 2)
    assert approx_fraction(2.75, 1) == (2, 3, 4)
    # pi: best 1-digit denominator is 1/7 of the fractional part (22/7)
    assert approx_fraction(np.pi, 1) == (3, 1, 7)
    # best 3-digit approximation of pi is the famous 355/113
    w, n, d = approx_fraction(np.pi, 3)
    assert (w, n, d) == (3, 16, 113)  # 3 + 16/113 == 355/113
    assert render_fraction(2.75, 1) == "2 3/4"
    assert render_fraction(3.0, 1) == "3"
    assert render_fraction(0.5, 1) == "1/2"
    # rounding up across the integer boundary
    assert render_fraction(1.999999, 1) == "2"


def test_rk_decode_all_modes():
    from grate_ray.functions.rk import decode_rk, encode_rk_int

    # int mode round trip incl. negatives and x100
    vals = np.array([0, 1, -1, 12345, -536870912, 536870911])
    w = encode_rk_int(vals)
    assert decode_rk(w).tolist() == vals.astype(float).tolist()
    w100 = encode_rk_int(vals, mul100=np.ones(len(vals), dtype=bool))
    assert decode_rk(w100).tolist() == (vals / 100.0).tolist()

    # float mode: high 30 bits of an IEEE double (low 34 bits zero)
    for x in (1.0, -2.5, 1024.0):
        bits = int(np.array([x], dtype=np.float64).view(np.uint64)[0])
        assert bits & ((1 << 34) - 1) == 0  # representable as RK
        word = np.array([(bits >> 32) & 0xFFFFFFFC], dtype=np.uint32)
        assert decode_rk(word)[0] == x
        word100 = word | 1
        assert decode_rk(word100)[0] == x / 100.0


def test_bmp_codec_roundtrip():
    """Real BMP semantics: bottom-up row order and BGR channel order must
    be undone exactly — an asymmetric image catches flips."""
    from grate_ray.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    assert blob[:2] == b"BM"
    w, h, back = decode_bmp(blob)
    assert (w, h) == (8, 6)
    assert np.array_equal(back, img)
    # corner checks: top-left pixel of the logical image is the LAST row
    # in the file (bottom-up), stored B,G,R
    offset = int.from_bytes(blob[10:14], "little")
    row_bytes = 8 * 3
    last_row = blob[offset + 5 * row_bytes : offset + 6 * row_bytes]
    assert last_row[0:3] == bytes(img[0, 0, ::-1])


def test_png_codec_roundtrip_all_filters():
    """Real PNG semantics: CRC-checked chunk walk, zlib IDAT, and ALL five
    scanline filters (None/Sub/Up/Average/Paeth) must reconstruct exactly."""
    from grate_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    # default encoder cycles row % 5 → every filter id appears
    blob = encode_png(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, back = decode_png(blob)
    assert (w, h) == (9, 11)
    assert np.array_equal(back, img)
    # each filter id alone must also round-trip (isolates a broken branch)
    for f in range(5):
        blob_f = encode_png(img, row_filters=[f] * 11)
        assert np.array_equal(decode_png(blob_f)[2], img), f"filter {f}"
    # gray and RGBA layouts
    for ch in (1, 4):
        im = rng.integers(0, 256, size=(5, 6, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(im))[2], im)


def test_png_codec_rejects_corruption():
    """A flipped bit anywhere in a chunk fails its CRC32 — corrupt payloads
    dead-letter instead of mis-decoding."""
    import pytest

    from grate_ray.functions.multimodal import decode_png, encode_png

    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    blob = bytearray(encode_png(img))
    blob[30] ^= 0x01  # inside IHDR payload
    with pytest.raises(ValueError):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_wav_codec_roundtrip_and_stdlib_crosscheck():
    """WAV round-trip (mono + stereo), cross-validated against the stdlib
    `wave` module — an independent reader of our encoder's output."""
    import io
    import wave as stdlib_wave

    from grate_ray.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    blob = encode_wav(mono, rate=16000, channels=1)
    rate, ch, back = decode_wav(blob)
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(back.reshape(-1), mono)

    # independent decode of our bytes via the stdlib wave reader
    with stdlib_wave.open(io.BytesIO(blob)) as r:
        assert r.getframerate() == 16000
        assert r.getnchannels() == 1
        assert r.getsampwidth() == 2
        assert np.array_equal(
            np.frombuffer(r.readframes(r.getnframes()), dtype="<i2"), mono
        )

    # our decode of stdlib-written bytes (stereo), plus unknown-chunk skip
    stereo = rng.integers(-32768, 32768, size=(64, 2), dtype=np.int16)
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as wr:
        wr.setnchannels(2)
        wr.setsampwidth(2)
        wr.setframerate(44100)
        wr.writeframes(stereo.tobytes())
    rate, ch, back = decode_wav(buf.getvalue())
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(back, stereo)


def test_sql_round_matches_duckdb_exactly():
    """sql_round must be bit-for-bit DuckDB round(x, 2) — including the
    half-away-from-zero cases Arrow/numpy get wrong."""
    import duckdb
    import pyarrow as pa

    from grate_ray.functions.num import sql_round

    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            rng.uniform(-1e9, 1e9, 200),
            np.round(rng.uniform(-1e6, 1e6, 200), 3),  # many exact .xx5
            np.array([133316085.785, -133316085.785, 0.005, -0.005, 2.675]),
        ]
    )
    got = sql_round(pa.array(xs), 2).to_numpy(zero_copy_only=False)
    con = duckdb.connect()
    expect = np.array(
        [con.sql(f"SELECT round(CAST({x!r} AS DOUBLE), 2)").fetchall()[0][0] for x in xs]
    )
    assert np.array_equal(got, expect)


def test_md5_lower64_matches_duckdb_exactly():
    """_md5_lower64 must equal DuckDB md5_number_lower, including unicode
    and empty strings — the LSH oracles hang off this equality."""
    import duckdb

    from grate_ray.functions.dedup import _md5_lower64

    vals = ["", "hello", "a b c", "的 世界", "x" * 1000, "naïve café", "11tok"]
    got = _md5_lower64(np.array(vals, dtype=object))
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (e,) = con.execute("SELECT md5_number_lower(?)", [v]).fetchone()
        assert int(g) == int(e), v


def test_png_wav_property_roundtrip():
    """Property: any uint8 image (any shape/channels, any filter plan) and
    any int16 sample block survive encode→decode bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grate_ray.functions.multimodal import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def png_prop(h, w, ch, seed, data):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        w2, h2, back = decode_png(encode_png(img, row_filters=filters))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, img)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 300),
        ch=st.sampled_from([1, 2]),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_prop(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        r2, c2, back = decode_wav(encode_wav(s, rate=rate, channels=ch))
        assert (r2, c2) == (rate, ch)
        assert np.array_equal(back, s.reshape(-1, ch))

    png_prop()
    wav_prop()


def test_jpeg_codec_flat_exact_and_lossy_bounds():
    """Real baseline JPEG: flat blocks decode to the exact DC-quantization
    arithmetic (all 256 gray levels), multi-block files exercise DC
    prediction, and arbitrary images stay within normal JPEG loss."""
    from grate_ray.functions.multimodal import decode_jpeg_gray, encode_jpeg_gray

    def expected_flat(v):
        dcq = int(np.floor((8.0 * (v - 128)) / 16 + 0.5))
        return int(np.clip(np.floor(128.0 + dcq * 2.0 + 0.5), 0, 255))

    for v in range(0, 256, 3):
        img = np.full((8, 8), v, np.uint8)
        w, h, back = decode_jpeg_gray(encode_jpeg_gray(img))
        assert (w, h) == (8, 8)
        assert (back == expected_flat(v)).all(), v

    # 6 blocks with distinct values → nonzero DC diffs through the stream
    img = np.zeros((16, 24), np.uint8)
    blocks = [(y, x) for y in range(0, 16, 8) for x in range(0, 24, 8)]
    for b, (by, bx) in enumerate(blocks):
        img[by : by + 8, bx : bx + 8] = (b * 37 + 5) % 256
    _, _, back = decode_jpeg_gray(encode_jpeg_gray(img))
    for b, (by, bx) in enumerate(blocks):
        assert (back[by : by + 8, bx : bx + 8] == expected_flat((b * 37 + 5) % 256)).all()

    # lossy but bounded on noise (worst case for JPEG), tight on gradients
    rng = np.random.default_rng(6)
    im = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    _, _, back = decode_jpeg_gray(encode_jpeg_gray(im))
    assert np.abs(back.astype(int) - im.astype(int)).mean() <= 30
    yy, xx = np.mgrid[0:32, 0:32]
    im = np.clip(128 + 60 * np.sin(yy / 6.0) + 40 * np.cos(xx / 5.0), 0, 255).astype(np.uint8)
    _, _, back = decode_jpeg_gray(encode_jpeg_gray(im))
    assert np.abs(back.astype(int) - im.astype(int)).max() <= 30


def test_jpeg_codec_rejects_bad_and_unsupported():
    import pytest

    from grate_ray.functions.multimodal import decode_jpeg_gray, encode_jpeg_gray

    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg")
    # truncating the entropy stream must raise, not mis-decode
    blob = bytearray(encode_jpeg_gray(np.full((16, 16), 77, np.uint8)))
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(blob[: len(blob) // 2]))


def test_avi_mjpeg_container_roundtrip():
    """Real RIFF/AVI walk: nested LISTs, word-aligned odd-size chunks,
    frame payloads preserved byte-exactly; non-MJPEG streams rejected."""
    import pytest

    from grate_ray.functions.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
        encode_jpeg_gray,
    )

    frames = [
        encode_jpeg_gray(np.full((8, 8), v, np.uint8)) for v in (10, 100, 200)
    ]
    odd = frames[0] + b"\x01"  # odd payload exercises RIFF word alignment
    w, h, n, out = decode_avi_frames(encode_avi_mjpeg([odd] + frames[1:], 8, 8))
    assert (w, h, n) == (8, 8, 3)
    assert out == [odd] + frames[1:]
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_color_jpeg_flat_exact_and_lossy_bounds():
    """4:4:4 color baseline JPEG: flat RGB blocks decode to the exact
    RGB→YCbCr→DC-quant→RGB floor(+0.5) chain; interleaved MCUs exercise
    three DC predictors; smooth images stay within normal JPEG loss; a
    color stream dead-letters in the gray entry point."""
    import pytest

    from grate_ray.functions.multimodal import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_color,
    )

    def chain(r, g, bl):
        y = int(np.floor(0.299 * r + 0.587 * g + 0.114 * bl + 0.5))
        cb = int(np.floor(-0.168736 * r - 0.331264 * g + 0.5 * bl + 128 + 0.5))
        cr = int(np.floor(0.5 * r - 0.418688 * g - 0.081312 * bl + 128 + 0.5))
        y2 = int(np.clip(np.floor(np.floor((8.0 * (y - 128)) / 16 + 0.5) * 16 / 8.0 + 128 + 0.5), 0, 255))
        cb2 = int(np.clip(np.floor(np.floor((8.0 * (cb - 128)) / 17 + 0.5) * 17 / 8.0 + 128 + 0.5), 0, 255))
        cr2 = int(np.clip(np.floor(np.floor((8.0 * (cr - 128)) / 17 + 0.5) * 17 / 8.0 + 128 + 0.5), 0, 255))
        return (
            int(np.clip(np.floor(y2 + 1.402 * (cr2 - 128) + 0.5), 0, 255)),
            int(np.clip(np.floor(y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128) + 0.5), 0, 255)),
            int(np.clip(np.floor(y2 + 1.772 * (cb2 - 128) + 0.5), 0, 255)),
        )

    img = np.zeros((16, 16, 3), np.uint8)
    vals = [(10, 200, 60), (250, 3, 99), (128, 128, 128), (0, 255, 17)]
    for b, v in enumerate(vals):
        img[(b // 2) * 8 : (b // 2) * 8 + 8, (b % 2) * 8 : (b % 2) * 8 + 8] = v
    blob = encode_jpeg_color(img)
    w, h, back = decode_jpeg(blob)
    assert (w, h) == (16, 16) and back.shape == (16, 16, 3)
    for b, v in enumerate(vals):
        by, bx = (b // 2) * 8, (b % 2) * 8
        block = back[by : by + 8, bx : bx + 8]
        assert (block == np.array(chain(*v), np.uint8)).all(), (b, v)

    # smooth gradient: bounded loss per channel
    yy, xx = np.mgrid[0:16, 0:16]
    im = np.stack(
        [
            np.clip(128 + 50 * np.sin(yy / 5.0), 0, 255),
            np.clip(128 + 50 * np.cos(xx / 5.0), 0, 255),
            np.full((16, 16), 90.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    _, _, back = decode_jpeg(encode_jpeg_color(im))
    assert np.abs(back.astype(int) - im.astype(int)).max() <= 40

    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(blob)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob[: len(blob) // 2]))


def test_adpcm_codec_tracks_signal_and_rejects_truncation():
    """IMA ADPCM: decode replays the encoder's state machine exactly
    (decoded == encoder-side reconstruction), tracks a smooth signal
    within the current quantizer step, achieves ~4:1 compression, and
    refuses truncated/foreign streams."""
    import pytest

    from grate_ray.functions.multimodal import (
        _adpcm_quantize,
        decode_adpcm,
        encode_adpcm,
    )

    # smooth signal: reconstruction tracks within a few steps
    t = np.arange(256)
    sig = (8000 * np.sin(t / 10.0)).astype(np.int16)
    blob = encode_adpcm(sig)
    back = decode_adpcm(blob)
    assert len(back) == len(sig)
    assert len(blob) == 8 + 128  # 4:1 vs int16
    # after the attack phase the tracker locks on
    assert np.abs(back[32:].astype(int) - sig[32:].astype(int)).max() < 2000

    # decode must equal the encoder's own reconstruction bit for bit
    pred, idx = 0, 0
    recon = []
    for s in sig:
        _, pred, idx = _adpcm_quantize(int(s), pred, idx)
        recon.append(pred)
    assert (back.astype(int) == np.array(recon)).all()

    # extremes clamp to int16 range, never wrap
    ext = np.array([32767, -32768] * 50, dtype=np.int16)
    dec = decode_adpcm(encode_adpcm(ext)).astype(int)
    assert dec.min() >= -32768 and dec.max() <= 32767

    with pytest.raises(ValueError):
        decode_adpcm(b"WAVE1234")
    with pytest.raises(ValueError):
        decode_adpcm(blob[: len(blob) // 2])


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 baseline: flat MCUs decode exactly (chroma box-average is
    identity on flats); smooth images stay within normal loss; dims must
    be MCU multiples; gray/4:4:4 paths unchanged."""
    import pytest

    from grate_ray.functions.multimodal import decode_jpeg, encode_jpeg_color

    img = np.zeros((32, 48, 3), np.uint8)
    rng = np.random.default_rng(17)
    vals = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(6)]
    for m, v in enumerate(vals):
        my, mx = (m // 3) * 16, (m % 3) * 16
        img[my : my + 16, mx : mx + 16] = v
    w, h, back = decode_jpeg(encode_jpeg_color(img, subsample=True))
    assert (w, h) == (48, 32)
    # each MCU uniform and within the quantization-chain error of the
    # 4:4:4 fixture (flat chroma average is identity)
    from grate_ray.functions.multimodal import encode_jpeg_color as enc444

    _, _, b444 = decode_jpeg(enc444(img[:16, :16 * 3]))
    for m, v in enumerate(vals):
        my, mx = (m // 3) * 16, (m % 3) * 16
        mcu = back[my : my + 16, mx : mx + 16]
        assert all(len(np.unique(mcu[..., c])) == 1 for c in range(3)), m
    # cross-check against the 4:4:4 decode of the same flat values
    assert (back[:16, : 16 * 3] == b444).all()

    with pytest.raises(ValueError):
        encode_jpeg_color(np.zeros((24, 24, 3), np.uint8), subsample=True)

    yy, xx = np.mgrid[0:32, 0:32]
    im = np.stack(
        [
            np.clip(128 + 50 * np.sin(yy / 6.0), 0, 255),
            np.clip(128 + 50 * np.cos(xx / 6.0), 0, 255),
            np.full((32, 32), 90.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    _, _, b2 = decode_jpeg(encode_jpeg_color(im, subsample=True))
    assert np.abs(b2.astype(int) - im.astype(int)).max() <= 40


def test_jpeg_restart_markers():
    """DRI/RSTn: restart intervals decode identically to the plain
    stream (byte-aligned markers, DC predictor resets), and an
    out-of-sequence RSTn dead-letters."""
    import pytest

    from grate_ray.functions.multimodal import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)  # 12 MCUs
    ref = decode_jpeg_gray(encode_jpeg_gray(img))[2]
    for ri in (1, 2, 5):
        blob = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in blob  # DRI present
        assert (decode_jpeg_gray(blob)[2] == ref).all(), ri

    corrupted = bytearray(encode_jpeg_gray(img, restart_interval=2))
    i = corrupted.find(b"\xff\xd0")
    corrupted[i + 1] = 0xD5
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))


def test_png_adam7_interlaced_roundtrip():
    """Adam7: seven filtered sub-images over the pass grid must scatter
    back exactly — including degenerate sizes where some passes are
    empty; truncated interlaced streams dead-letter."""
    import pytest

    from grate_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(23)
    for shape in [(11, 9, 3), (5, 6, 1), (8, 8, 4), (1, 1, 3), (2, 3, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_png(img, interlace=True)
        w, h, back = decode_png(blob)
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(back, img), shape

    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    blob = encode_png(img, interlace=True)
    # corrupt: flip the interlace byte to 0 without fixing the stream —
    # the length check must catch the mismatch (CRC is recomputed here
    # to isolate the structural check)
    import struct as _s
    import zlib as _z

    ihdr_payload = bytearray(blob[16:29])
    ihdr_payload[-1] = 0
    fixed = bytearray(blob)
    fixed[16:29] = ihdr_payload
    fixed[29:33] = _s.pack(">I", _z.crc32(b"IHDR" + bytes(ihdr_payload)) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        decode_png(bytes(fixed))


def test_progressive_jpeg_equals_baseline_decode():
    """SOF2 six-scan ladder (DC first/refine, AC spectral bands with
    successive approximation, EOBRUN): after all scans the decoded image
    must equal the baseline decode EXACTLY (the scans reconstruct the
    same quantized coefficients bit for bit); dispatch through
    decode_jpeg/decode_jpeg_gray works; truncated streams dead-letter."""
    import pytest

    from grate_ray.functions.multimodal import (
        decode_jpeg,
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(41)
    for shape in [(8, 8), (16, 16), (24, 32), (64, 64)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in blob  # SOF2
        base = decode_jpeg_gray(encode_jpeg_gray(img))[2]
        assert (decode_jpeg_progressive(blob)[2] == base).all(), shape
        # generic entry points dispatch on SOF2
        assert (decode_jpeg(blob)[2] == base).all()
        assert (decode_jpeg_gray(blob)[2] == base).all()

    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg_progressive(blob[: len(blob) * 2 // 3])


def test_progressive_jpeg_color_equals_baseline_color():
    """Color (4:4:4) progressive: interleaved DC scans + per-component
    AC band scans reconstruct the exact coefficients — decode equals the
    baseline color decode bit for bit; gray entry point dead-letters."""
    import pytest

    from grate_ray.functions.multimodal import (
        decode_jpeg,
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_color,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(43)
    for shape in [(8, 8, 3), (16, 16, 3), (16, 24, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_jpeg_progressive(img)
        base = decode_jpeg(encode_jpeg_color(img))[2]
        assert (decode_jpeg_progressive(blob)[2] == base).all(), shape
        assert (decode_jpeg(blob)[2] == base).all()
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(encode_jpeg_progressive(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))


def test_gif_roundtrip_all_paths():
    """GIF LZW round-trips: random images (code-width growth through 10,
    11, 12 bits and the 4096 CLEAR-reset), structured runs (long LZW
    matches incl. KwKwK), flat images, interlace on and off, and a small
    palette; corrupt magic and truncated streams raise."""
    import numpy as np
    import pytest

    from grate_ray.functions.multimodal import (
        _gif_palette,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(42)
    pal = _gif_palette()
    cases = [
        rng.integers(0, 256, size=(7, 9)).astype(np.uint8),
        (np.arange(30 * 40) % 5).astype(np.uint8).reshape(30, 40),
        np.zeros((13, 17), np.uint8),  # KwKwK-heavy
        rng.integers(0, 256, size=(80, 80)).astype(np.uint8),  # 4096 reset
        np.ones((1, 1), np.uint8),
    ]
    for idx in cases:
        for interlace in (False, True):
            blob = encode_gif(idx, pal, interlace=interlace)
            w, h, px = decode_gif(blob)
            assert (w, h) == (idx.shape[1], idx.shape[0])
            assert np.array_equal(px, pal[idx])

    # small local palette (4 colors → 2-bit min code size)
    small = np.array([[10, 20, 30], [40, 10, 20]], np.uint8)
    idx4 = rng.integers(0, 4, size=(6, 6)).astype(np.uint8)
    pal4 = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    blob = encode_gif(idx4, pal4)
    assert np.array_equal(decode_gif(blob)[2], pal4[idx4])
    del small

    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOTGIF" + bytes(20))
    good = encode_gif(idx4, pal4)
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])


def test_ulaw_codec_properties():
    """µ-law: quantization error bounded by the segment step (≤512 at
    full scale), exact on segment-representable values, monotone, and
    sign-symmetric; every possible byte decodes without error."""
    import numpy as np

    from grate_ray.functions.multimodal import decode_ulaw, encode_ulaw

    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, 50_000).astype(np.int16)
    y = decode_ulaw(encode_ulaw(x)).astype(np.int64)
    err = np.abs(y - np.clip(x.astype(np.int64), -32635, 32635))
    assert err.max() <= 512
    # sign symmetry
    v = np.arange(0, 32636, 17, dtype=np.int64)
    yp = decode_ulaw(encode_ulaw(v.astype(np.int32).astype(np.int16)))
    # (cast via clip to avoid int16 overflow for the +32635 edge)
    vv = np.clip(v, 0, 32635).astype(np.int16)
    yp = decode_ulaw(encode_ulaw(vv)).astype(np.int64)
    yn = decode_ulaw(encode_ulaw((-vv).astype(np.int16))).astype(np.int64)
    assert (yp == -yn).all()
    # monotone non-decreasing on magnitudes
    assert (np.diff(yp) >= 0).all()
    # all 256 codes decode
    allb = bytes(range(256))
    out = decode_ulaw(allb)
    assert len(out) == 256


def test_tiff_roundtrip_and_errors():
    """TIFF: single- and multi-strip round-trips, inline vs offset tag
    values, corrupt/unsupported payloads dead-letter as ValueError."""
    import numpy as np
    import pytest

    from grate_ray.functions.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (7, 10), (16, 5), (33, 31)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for rps in (None, 1, 4):
            blob = encode_tiff(px, rows_per_strip=rps)
            w2, h2, back = decode_tiff(blob)
            assert (w2, h2) == (w, h)
            assert np.array_equal(back, px)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(30))
    good = encode_tiff(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        decode_tiff(good[:20])
    # wrong magic number after a valid byte-order mark
    bad = bytearray(good)
    bad[2] = 43
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(bytes(bad))


def test_alaw_codec_properties():
    """A-law: bounded quantization error, sign symmetry, monotone
    magnitudes, all 256 codes decode, segment-0 midpoints exact."""
    import numpy as np

    from grate_ray.functions.multimodal import decode_alaw, encode_alaw

    rng = np.random.default_rng(9)
    x = rng.integers(-32768, 32768, 50_000).astype(np.int16)
    y = decode_alaw(encode_alaw(x)).astype(np.int64)
    err = np.abs(y - np.clip(x.astype(np.int64), -32767, 32767))
    assert err.max() <= 512
    v = np.arange(0, 32767, 13, dtype=np.int64).astype(np.int16)
    yp = decode_alaw(encode_alaw(v)).astype(np.int64)
    yn = decode_alaw(encode_alaw((-v).astype(np.int16))).astype(np.int64)
    assert (yp[1:] == -yn[1:]).all()  # v=0 encodes positive both ways
    assert (np.diff(yp) >= 0).all()
    assert len(decode_alaw(bytes(range(256)))) == 256
    # segment 0 decodes to the 16-step midpoints
    small = np.arange(0, 256, 16, dtype=np.int16)
    assert decode_alaw(encode_alaw(small)).tolist() == [
        int(s) + 8 for s in small
    ]
