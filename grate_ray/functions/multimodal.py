"""Multimodal (binary-payload) operators: real Ray-side schema/batch/actor
mechanics throughout, with FOUR real dependency-free codecs:

- uncompressed 24-bit BMP (header parsing + numpy pixel math),
- PNG (8-bit gray/RGB/RGBA, non-interlaced: zlib inflate, chunk CRC
  verification, and all five scanline filters — None/Sub/Up/Average/Paeth),
- JPEG: baseline grayscale, 4:4:4 color, 4:2:0 chroma-subsampled color,
  restart markers (DRI/RSTn), AND progressive (SOF2, grayscale and
  4:4:4 color: spectral selection, successive approximation, EOBRUN
  coding, interleaved DC scans) — real JFIF markers, in-file Huffman
  tables, dual quant tables, per-component DC prediction, dequantize +
  IDCT, YCbCr→RGB,
- WAV (RIFF chunk walk, 16-bit PCM),
- IMA/DVI ADPCM compressed audio (4-bit step-table state machine, 4:1).

Only the perceptual audio/video codecs (MP3/AAC/H.26x — patent-grade
DSP, no stdlib path) remain STUBBED behind ``NotImplementedError`` in
MediaDecoder (AVI/MJPEG containers are real — see encode_avi_mjpeg).

Pattern for 100 TB media pipelines: binary columns stay in Arrow
(``batch_format="pyarrow"`` end to end — binary does not survive pandas
object dtype cleanly), batches are kept small (payload-size aware), and
the decoder is an actor pool whose (real) model/codec loads once per actor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def synthesize_binary_column(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic fake media payloads: utf-8 bytes of the text with a
    4-byte magic header. Stands in for image/audio blobs in tests."""
    blobs = [
        b"IMG0" + (v or "").encode("utf-8") for v in t[text_col].to_pylist()
    ]
    return t.append_column("payload", pa.array(blobs, pa.binary()))


# --- real BMP codec (no external libs) ---------------------------------------

BMP_W, BMP_H = 8, 6  # synthesized size; W*3 is 4-byte aligned → no row pad


def encode_bmp(pixels_rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP bytes (BITMAPFILEHEADER
    + BITMAPINFOHEADER, rows bottom-up, channels BGR — the real format)."""
    h, w, _ = pixels_rgb.shape
    row_bytes = w * 3
    assert row_bytes % 4 == 0, "caller must pick W with aligned rows"
    data = pixels_rgb[::-1, :, ::-1].tobytes()  # bottom-up, BGR
    file_size = 14 + 40 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes → (width, height, (H, W, 3) uint8 RGB). Parses the real
    headers (magic, pixel offset, dimensions, bpp), un-flips the
    bottom-up rows and the BGR channel order."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", blob, 10)
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", blob, 14)
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP supported, got {bpp}")
    row_bytes = ((w * 3 + 3) // 4) * 4
    px = np.frombuffer(blob, dtype=np.uint8, count=abs(h) * row_bytes, offset=offset)
    px = px.reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        px = px[::-1]  # bottom-up → top-down
    return w, abs(h), px[:, :, ::-1]  # BGR → RGB


def synthesize_bmp_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real BMP payloads: pixel channel c of flat pixel i is
    ``(doc_id*7 + i*3 + c*11) % 256`` — pure arithmetic, so the SQL oracle
    can reproduce the decoded channel means exactly."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_px = BMP_W * BMP_H
    i = np.arange(n_px, dtype=np.int64)
    blobs = []
    for d in ids:
        chans = [
            ((d * 7 + i * 3 + c * 11) % 256).astype(np.uint8) for c in range(3)
        ]
        rgb = np.stack(chans, axis=1).reshape(BMP_H, BMP_W, 3)
        blobs.append(encode_bmp(rgb))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class BmpFeatureExtractor:
    """Actor-pool stage: REAL decode of the binary column (BMP headers,
    bottom-up rows, BGR) → per-image features (width, height, per-channel
    means in float64, 6dp). The external-lib codecs stay stubbed in
    MediaDecoder; this is the real end-to-end path for the one format the
    environment can decode without dependencies."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_bmp(blob)
            ws.append(w)
            hs.append(h)
            means = px.reshape(-1, 3).mean(axis=0)
            mr.append(round(float(means[0]), 6))
            mg.append(round(float(means[1]), 6))
            mb.append(round(float(means[2]), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_r", pa.array(mr, pa.float64()))
        out = out.append_column("mean_g", pa.array(mg, pa.float64()))
        out = out.append_column("mean_b", pa.array(mb, pa.float64()))
        return out


class FrameSampler:
    """Video-style frame sampling plumbing: binary payload → list<binary>
    of every ``stride``-th fixed-size "frame". The frame extraction is the
    deterministic stub (byte slices — a real implementation would seek
    keyframes via a codec); the Ray-side mechanics (nested list<binary>
    output schema, pyarrow-only batches, small batch sizes) are real and
    are what a 100 TB video pipeline needs to get right."""

    def __init__(self, frame_bytes: int = 16, stride: int = 4, payload_col: str = "payload"):
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        frames_col = []
        for blob in t[self.payload_col].to_pylist():
            blob = blob or b""
            frames = [
                blob[i : i + self.frame_bytes]
                for i in range(0, len(blob), self.frame_bytes)
            ]
            frames_col.append(frames[:: self.stride])
        out = t.drop_columns([self.payload_col])
        out = out.append_column(
            "frames", pa.array(frames_col, pa.list_(pa.binary()))
        )
        out = out.append_column(
            "n_frames", pc.cast(pc.list_value_length(out["frames"]), pa.int64())
        )
        return out


# --- real PNG codec (stdlib zlib + numpy; no external libs) -------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_W, PNG_H = 8, 6  # synthesized size (small media payloads, many rows)

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, truecolor RGB, RGBA


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(px: np.ndarray, ch: int, row_filters=None) -> bytearray:
    """Filter a (rows, stride) int32 image into PNG scanline bytes.
    ``row_filters`` picks the filter id (0-4) per row; the default cycles
    ``row % 5`` so every filter type appears. Prediction uses the
    ORIGINAL bytes (what the decoder will have reconstructed), so it is
    fully vectorized per row."""
    nrows, stride = px.shape
    bpp = ch
    raw = bytearray()
    prior = np.zeros(stride, np.int32)
    for r in range(nrows):
        row = px[r]
        f = int(row_filters[r]) if row_filters is not None else r % 5
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - prior
        elif f == 3:
            out = row - ((left + prior) >> 1)
        elif f == 4:
            out = row - _paeth_vec(left, prior, upleft)
        else:
            raise ValueError(f"bad PNG filter id {f}")
        raw.append(f)
        raw += (out & 0xFF).astype(np.uint8).tobytes()
        prior = row
    return raw


def encode_png(pixels: np.ndarray, row_filters=None, interlace: bool = False) -> bytes:
    """(H, W, C) uint8 (C∈{1,3,4}) → real PNG bytes: signature, IHDR,
    one zlib-compressed IDAT of filtered scanlines, IEND — with correct
    per-chunk CRC32s.

    ``row_filters`` picks the filter id (0-4) per row; the default cycles
    ``row % 5`` so every filter type (None/Sub/Up/Average/Paeth) appears in
    the stream and the decoder's unfilter path is genuinely exercised.
    ``interlace=True`` writes Adam7: seven sequentially-filtered
    sub-images over the standard pass grid (each pass restarts its
    prior-row state, per spec)."""
    h, w, ch = pixels.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    px = pixels.astype(np.int32)
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _png_filter_rows(
                sub.reshape(sub.shape[0], -1), ch, row_filters=None
            )
    else:
        raw = _png_filter_rows(px.reshape(h, -1), ch, row_filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → (width, height, (H, W, C) uint8). REAL decode:
    signature + chunk walk with CRC32 verification, multi-IDAT concat,
    zlib inflate, and reconstruction of all five scanline filters.

    Supports 8-bit gray / RGB / RGBA, non-interlaced AND Adam7
    interlaced (seven unfiltered sub-images scattered over the pass
    grid); 16-bit and palette raise ``NotImplementedError`` so callers
    dead-letter rather than mis-decode. Sub/Average/Paeth reconstruction
    is sequential within a scanline by definition (each byte depends on
    the reconstructed left neighbour); the Up filter and whole-row ops
    stay vectorized.
    """
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + ln)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit gray/RGB/RGBA PNG supported (depth={depth} ctype={ctype})"
        )
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace not in (0, 1):
        raise NotImplementedError(f"unknown interlace method {interlace}")
    if not interlace:
        recon, rp = _png_unfilter(raw, 0, h, w * ch, ch)
        if rp != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        return w, h, recon.reshape(h, w, ch)
    # Adam7: seven independent filtered sub-images, scattered back
    out = np.zeros((h, w, ch), np.uint8)
    rp = 0
    for x0, y0, dx, dy in _ADAM7:
        ph = len(range(y0, h, dy))
        pw = len(range(x0, w, dx))
        if ph == 0 or pw == 0:
            continue
        sub, rp = _png_unfilter(raw, rp, ph, pw * ch, ch)
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
    if rp != len(raw):
        raise ValueError("PNG IDAT length mismatch")
    return w, h, out


def _png_unfilter(
    raw: bytes, rp: int, nrows: int, stride: int, ch: int
) -> tuple[np.ndarray, int]:
    """Reconstruct ``nrows`` filtered scanlines of ``stride`` bytes
    starting at offset ``rp``; returns (rows, new offset)."""
    if rp + nrows * (stride + 1) > len(raw):
        raise ValueError("PNG IDAT length mismatch")
    recon = np.zeros((nrows, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    for r in range(nrows):
        f = raw[rp]
        row = np.frombuffer(raw, np.uint8, stride, rp + 1).astype(np.int32)
        rp += 1 + stride
        if f == 0:
            cur = row
        elif f == 2:
            cur = (row + prior) & 0xFF
        elif f in (1, 3, 4):
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter id {f}")
        recon[r] = cur
        prior = cur
    return recon, rp


def synthesize_png_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real PNG payloads: channel c of flat pixel i is
    ``(doc_id*5 + i*3 + c*7) % 256`` — pure arithmetic, so the SQL oracle
    reproduces the decoded channel means exactly. Rows cycle through all
    five scanline filters (``row % 5``) so decode exercises each one."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_px = PNG_W * PNG_H
    i = np.arange(n_px, dtype=np.int64)
    blobs = []
    for d in ids:
        chans = [
            ((d * 5 + i * 3 + c * 7) % 256).astype(np.uint8) for c in range(3)
        ]
        rgb = np.stack(chans, axis=1).reshape(PNG_H, PNG_W, 3)
        blobs.append(encode_png(rgb))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class PngFeatureExtractor:
    """Actor-pool stage: REAL PNG decode (CRC-checked chunk walk, inflate,
    all-filter reconstruction) → per-image (width, height, channel means).
    Same contract as BmpFeatureExtractor; per-image loop is inherent to
    per-payload codec work and bounded by payload-aware batch sizes."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_png(blob)
            if px.shape[2] == 1:  # gray → replicate for a uniform schema
                px = np.repeat(px, 3, axis=2)
            ws.append(w)
            hs.append(h)
            means = px.reshape(-1, px.shape[2])[:, :3].mean(axis=0)
            mr.append(round(float(means[0]), 6))
            mg.append(round(float(means[1]), 6))
            mb.append(round(float(means[2]), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_r", pa.array(mr, pa.float64()))
        out = out.append_column("mean_g", pa.array(mg, pa.float64()))
        out = out.append_column("mean_b", pa.array(mb, pa.float64()))
        return out


# --- real baseline JPEG codec (grayscale; no external libs) -------------------
#
# A spec-correct JFIF baseline codec for single-component (grayscale)
# images with 8x8-multiple dimensions: real marker segments (APP0, DQT,
# SOF0, DHT, SOS), canonical Huffman coding with byte stuffing, zigzag,
# quantization, and an orthonormal DCT-II/IDCT in numpy. The DECODER
# rebuilds its Huffman tables from the file's own DHT segments (as any
# conformant reader must), so the bitstream is externally decodable.
# Progressive scans and subsampled chroma raise NotImplementedError so
# callers dead-letter rather than mis-decode; 1- and 3-component (4:4:4)
# baseline scans decode for real.
#
# Rounding convention (both sides): floor(x + 0.5) — chosen so the lossy
# arithmetic of DC-only (flat) blocks is exactly mirrorable in SQL.

# ITU-T T.81 Annex K luminance quantization table (public spec constants)
JPEG_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

JPEG_QTABLE_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# canonical Huffman table specs (bits-per-length + symbol list); the
# decoder never assumes these — it reads whatever DHT the file carries
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = (
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A]
    + [x for hi in range(4, 9) for x in range(hi * 16 + 3, hi * 16 + 11)]
    + [x for hi in range(9, 14) for x in range(hi * 16 + 2, hi * 16 + 11)]
    + list(range(0xE1, 0xEB))
    + list(range(0xF1, 0xFB))
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG construction."""
    codes = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
)


def _dct_mat() -> np.ndarray:
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    d = np.cos((2 * j + 1) * i * np.pi / 16) / 2.0
    d[0, :] /= np.sqrt(2.0)
    return d


def _fl_round(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def restart(self, k: int) -> None:
        """Byte-align and emit the RSTn marker (raw, never stuffed)."""
        self.pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (k % 8)])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(
    bw: "_BitWriter",
    block8: np.ndarray,
    q: np.ndarray,
    d: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns the new DC
    predictor. Shared by the gray and color encoders."""
    block = block8.astype(np.float64) - 128.0
    # snap float-DCT noise (~1e-13) before quantizing: true coefficients
    # of integer blocks are exact at this precision, so floor(x+0.5)
    # ties are deterministic (and SQL-mirrorable for flat-block fixtures)
    coef = np.round(d @ block @ d.T, 6)
    qc = _fl_round(coef / q)
    zz = qc.reshape(-1)[_ZIGZAG]
    # DC: predicted difference, category + extend bits
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    mag, size = abs(diff), 0
    while mag:
        mag >>= 1
        size += 1
    bw.write(*dc_codes[size])
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    # AC: run-length of zeros + category, ZRL for 16-runs, EOB
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(*ac_codes[0xF0])
            run -= 16
        mag, size = abs(v), 0
        while mag:
            mag >>= 1
            size += 1
        bw.write(*ac_codes[(run << 4) | size])
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        bw.write(*ac_codes[0x00])  # EOB
    return new_dc


def encode_jpeg_gray(
    pixels: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) uint8 grayscale (8x8-multiple dims) → real baseline JFIF
    bytes: DQT + SOF0 + DHT (DC and AC tables) + SOS entropy stream with
    canonical Huffman codes, DC prediction, EOB/run-length AC coding and
    byte stuffing. ``restart_interval`` > 0 writes a DRI segment and an
    RSTn marker (byte-aligned, DC predictor reset) every that many MCUs
    — the error-resilience feature most camera JPEGs carry."""
    q = JPEG_QTABLE if qtable is None else qtable
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires 8x8-multiple dimensions")
    d = _dct_mat()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu_i = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.restart(mcu_i // restart_interval - 1)
                prev_dc = 0
            mcu_i += 1
            prev_dc = _encode_block(
                bw, pixels[by : by + 8, bx : bx + 8], q, d, dc_codes, ac_codes, prev_dc
            )
    data = bw.flush()

    qzz = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out = b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + qzz)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += data + b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf) or self.buf[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker that must follow a
        completed restart interval; n cycles 0..7."""
        self.acc = 0
        self.nbits = 0  # discard pad bits
        if self.pos + 1 >= len(self.buf) or self.buf[self.pos] != 0xFF:
            raise ValueError("missing restart marker")
        m = self.buf[self.pos + 1]
        if m != 0xD0 + (expect % 8):
            raise ValueError("restart marker out of sequence")
        self.pos += 2

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decoder(bits: list[int], vals: list[int]):
    """DHT spec → {(length, code): symbol} lookup."""
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray]:
    """JFIF bytes → (width, height, pixels): (H, W) uint8 for grayscale,
    (H, W, 3) uint8 RGB for 4:4:4 YCbCr color. REAL baseline decode:
    marker walk, DQT/DHT parsed FROM THE FILE, SOF0 dims + per-component
    table selectors, interleaved-MCU Huffman entropy decode (one DC
    predictor per component, AC run-length + EOB, byte unstuffing),
    dequantize, IDCT, level shift / YCbCr→RGB, clamp. Progressive scans,
    subsampled chroma and 16-bit quant tables raise NotImplementedError
    (dead-letter, never mis-decode)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    restart_interval = 0
    comps: list[tuple[int, int]] = []  # (component id, quant selector)
    sels: dict[int, tuple[int, int]] = {}  # cid → (dc sel, ac sel)
    data = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", blob, pos + 2)
        if pos + 2 + ln > len(blob):
            raise ValueError("truncated JPEG segment")
        payload = blob[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = zz
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(payload):
                    raise ValueError("truncated JPEG DHT segment")
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or ncomp not in (1, 3):
                raise NotImplementedError(
                    f"only 8-bit 1- or 3-component baseline supported "
                    f"(prec={prec} ncomp={ncomp})"
                )
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                # per-component: id, sampling (H<<4|V), quant selector
                hh, vv = samp >> 4, samp & 0xF
                if hh not in (1, 2) or vv not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hh}x{vv} unsupported (1 or 2 only)"
                    )
                comps.append((cid, hh, vv, tq))
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xC2:
            # progressive stream: hand the whole blob to the multi-scan
            # decoder (grayscale; color progressive dead-letters there)
            return decode_jpeg_progressive(blob)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("non-baseline JPEG scan unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            if ns != len(comps):
                raise NotImplementedError("partial-scan JPEG unsupported")
            for c in range(ns):
                cid = payload[1 + 2 * c]
                sel = payload[2 + 2 * c]
                sels[cid] = (sel >> 4, sel & 0xF)
            data = blob[pos + 2 + ln : -2]
            break
        pos += 2 + ln
    if h is None or data is None or not comps:
        raise ValueError("JPEG missing SOF0/SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if h % (8 * vmax) or w % (8 * hmax):
        raise NotImplementedError("partial MCUs unsupported (pad to MCU size)")
    d = _dct_mat()
    br = _BitReader(data)
    # each component decodes into its own (possibly subsampled) plane
    planes = [
        np.zeros((h * vv // vmax, w * hh // hmax), np.uint8)
        for _, hh, vv, _ in comps
    ]
    tables = []
    for cid, hh, vv, tq in comps:
        dcs, acs = sels[cid]
        tables.append((qtables[tq], htables[(0, dcs)], htables[(1, acs)], hh, vv))
    prev_dc = [0] * len(comps)

    def read_block(dct, act) -> np.ndarray:
        zz = np.zeros(64, np.int32)
        size = _huff_read(br, dct)
        zz[0] = _extend(br.read_bits(size), size) if size else 0
        k = 1
        while k < 64:
            sym = _huff_read(br, act)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            size = sym & 0xF
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        return zz

    # interleaved MCUs: per MCU, each component contributes hh×vv blocks;
    # a DRI interval makes every interval boundary an RSTn sync point
    # (byte-align, consume marker, reset DC predictors)
    mcu_i = 0
    for mby in range(0, h, 8 * vmax):
        for mbx in range(0, w, 8 * hmax):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.sync_restart(mcu_i // restart_interval - 1)
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, (q, dct, act, hh, vv) in enumerate(tables):
                py, px = mby * vv // vmax, mbx * hh // hmax
                for byy in range(vv):
                    for bxx in range(hh):
                        zz = read_block(dct, act)
                        prev_dc[ci] += zz[0]
                        zz0 = zz.copy()
                        zz0[0] = prev_dc[ci]
                        coef = np.zeros(64, np.int32)
                        coef[_ZIGZAG] = zz0
                        block = d.T @ (coef.reshape(8, 8) * q).astype(np.float64) @ d
                        planes[ci][
                            py + 8 * byy : py + 8 * byy + 8,
                            px + 8 * bxx : px + 8 * bxx + 8,
                        ] = np.clip(_fl_round(block + 128.0), 0, 255).astype(np.uint8)
    # upsample subsampled planes by replication (deterministic, mirrorable)
    full = []
    for plane, (_, hh, vv, _) in zip(planes, comps):
        if hh != hmax:
            plane = np.repeat(plane, hmax // hh, axis=1)
        if vv != vmax:
            plane = np.repeat(plane, vmax // vv, axis=0)
        full.append(plane)
    planes = full
    if len(planes) == 1:
        return w, h, planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return w, h, np.clip(_fl_round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg_gray(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Single-component entry point: same hardened baseline walk as
    ``decode_jpeg``; a color stream dead-letters here rather than being
    silently flattened to luma."""
    w, h, px = decode_jpeg(blob)
    if px.ndim != 2:
        raise NotImplementedError("expected grayscale JPEG, got color")
    return w, h, px


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB → (H, W, 3) uint8 YCbCr (JFIF full-range
    constants, floor(x+0.5) rounding — the exact arithmetic the SQL
    oracle mirrors)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(_fl_round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg_color(pixels_rgb: np.ndarray, subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → real baseline YCbCr JFIF bytes: luma +
    chroma DQT slots, 3-component SOF0, interleaved MCUs with one DC
    predictor per component. ``subsample=False`` writes 4:4:4 (dims must
    be 8-multiples; MCU = Y, Cb, Cr per block position);
    ``subsample=True`` writes 4:2:0 — the dominant real-world layout
    (dims must be 16-multiples; MCU = 4 Y blocks + 1 Cb + 1 Cr, chroma
    box-averaged 2×2 with floor(x+0.5)). Huffman slots 0 (luma spec
    tables) are shared by all components — legal baseline; the decoder
    reads whatever DHT the file carries."""
    h, w, nc = pixels_rgb.shape
    if nc != 3:
        raise ValueError("expected (H, W, 3) RGB")
    mcu = 16 if subsample else 8
    if h % mcu or w % mcu:
        raise ValueError(f"encoder requires {mcu}x{mcu}-multiple dimensions")
    ycc = rgb_to_ycbcr(pixels_rgb)
    yp = ycc[..., 0]
    if subsample:
        # deterministic 2x2 box average, floor(x+0.5) — mirrorable
        cbcr = []
        for ci in (1, 2):
            p = ycc[..., ci].astype(np.float64)
            ds = p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cbcr.append(np.clip(_fl_round(ds), 0, 255).astype(np.uint8))
        cbp, crp = cbcr
    else:
        cbp, crp = ycc[..., 1], ycc[..., 2]
    d = _dct_mat()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for mby in range(0, h, mcu):
        for mbx in range(0, w, mcu):
            if subsample:
                for byy in range(2):
                    for bxx in range(2):
                        y0, x0 = mby + 8 * byy, mbx + 8 * bxx
                        prev_dc[0] = _encode_block(
                            bw, yp[y0 : y0 + 8, x0 : x0 + 8], JPEG_QTABLE,
                            d, dc_codes, ac_codes, prev_dc[0],
                        )
                cy, cx = mby // 2, mbx // 2
                for ci, plane in ((1, cbp), (2, crp)):
                    prev_dc[ci] = _encode_block(
                        bw, plane[cy : cy + 8, cx : cx + 8], JPEG_QTABLE_CHROMA,
                        d, dc_codes, ac_codes, prev_dc[ci],
                    )
            else:
                for ci, (plane, q) in enumerate(
                    ((yp, JPEG_QTABLE), (cbp, JPEG_QTABLE_CHROMA), (crp, JPEG_QTABLE_CHROMA))
                ):
                    prev_dc[ci] = _encode_block(
                        bw, plane[mby : mby + 8, mbx : mbx + 8], q,
                        d, dc_codes, ac_codes, prev_dc[ci],
                    )
    data = bw.flush()

    qzz0 = JPEG_QTABLE.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    qzz1 = JPEG_QTABLE_CHROMA.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    ysamp = 0x22 if subsample else 0x11
    out = b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + qzz0)
    out += _seg(0xDB, b"\x01" + qzz1)
    # components: Y→quant 0 (2x2 when subsampled), Cb/Cr→quant 1
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, ysamp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0x3F, 0]))
    out += data + b"\xff\xd9"  # EOI
    return out


JPEG_W, JPEG_H = 16, 16  # synthesized size: 4 blocks → DC prediction exercised


def synthesize_jpeg_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real JPEG payloads: block b (row-major of 4) of doc d
    is the FLAT 8x8 gray plane with value ``(d*3 + b*17) % 256``. Flat
    blocks quantize to a lone DC coefficient, so the decoded plane is the
    exact integer arithmetic v' = clip(floor(128 + floor((8(v-128))/16
    + 0.5)*16/8 + 0.5)) the SQL oracle reproduces — while the bitstream
    still exercises real Huffman DC-prediction across blocks."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = []
    for dd in ids:
        img = np.zeros((JPEG_H, JPEG_W), np.uint8)
        for b in range(4):
            v = int((dd * 3 + b * 17) % 256)
            by, bx = (b // 2) * 8, (b % 2) * 8
            img[by : by + 8, bx : bx + 8] = v
        blobs.append(encode_jpeg_gray(img))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class JpegFeatureExtractor:
    """Actor-pool stage: REAL baseline JPEG decode (marker walk, in-file
    Huffman tables, entropy decode, dequant + IDCT) → per-image
    (width, height, mean gray level)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, means = [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_jpeg_gray(blob)
            ws.append(w)
            hs.append(h)
            means.append(round(float(px.mean()), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_gray", pa.array(means, pa.float64()))
        return out


def synthesize_progressive_jpeg_column(
    t: pa.Table, id_col: str = "doc_id"
) -> pa.Table:
    """Deterministic real PROGRESSIVE JPEG payloads: the same 4-flat-block
    plane as the baseline fixture (block b of doc d = (d*3+b*17)%256),
    encoded as a six-scan SOF2 ladder (DC first/refine + two AC bands
    with successive approximation). Flat blocks are DC-only, so the
    decoded plane follows the identical quantization arithmetic — while
    the bitstream exercises multi-scan assembly, EOBRUN coding and DC
    refinement for real."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = []
    for dd in ids:
        img = np.zeros((JPEG_H, JPEG_W), np.uint8)
        for b in range(4):
            v = int((dd * 3 + b * 17) % 256)
            by, bx = (b // 2) * 8, (b % 2) * 8
            img[by : by + 8, bx : bx + 8] = v
        blobs.append(encode_jpeg_progressive(img))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


def synthesize_color_jpeg_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real COLOR JPEG payloads: block b (row-major of 4)
    of doc d is the flat RGB ((d*3+b*17)%256, (d*5+b*29)%256,
    (d*7+b*43)%256). Flat blocks quantize to lone DC coefficients in all
    three YCbCr planes, so the decoded image is the exact
    RGB→YCbCr→quant→dequant→RGB floor(x+0.5) arithmetic chain the SQL
    oracle reproduces — while the bitstream exercises interleaved MCUs,
    three DC predictors and the dual quant-table plumbing."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = []
    for dd in ids:
        img = np.zeros((JPEG_H, JPEG_W, 3), np.uint8)
        for b in range(4):
            by, bx = (b // 2) * 8, (b % 2) * 8
            img[by : by + 8, bx : bx + 8] = (
                int((dd * 3 + b * 17) % 256),
                int((dd * 5 + b * 29) % 256),
                int((dd * 7 + b * 43) % 256),
            )
        blobs.append(encode_jpeg_color(img))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


def synthesize_jpeg420_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real 4:2:0 JPEG payloads: MCU m (row-major of 4) of
    doc d is the flat RGB ((d*3+m*17)%256, (d*5+m*29)%256, (d*7+m*43)%256)
    over its full 16x16 — flat MCUs make the 2×2 chroma box-average an
    identity, so the decode chain is the SAME exact arithmetic as the
    4:4:4 fixture while the bitstream exercises 4-Y-block MCUs,
    subsampled chroma planes and replication upsampling."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = []
    for dd in ids:
        img = np.zeros((32, 32, 3), np.uint8)
        for m in range(4):
            my, mx = (m // 2) * 16, (m % 2) * 16
            img[my : my + 16, mx : mx + 16] = (
                int((dd * 3 + m * 17) % 256),
                int((dd * 5 + m * 29) % 256),
                int((dd * 7 + m * 43) % 256),
            )
        blobs.append(encode_jpeg_color(img, subsample=True))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class ColorJpegFeatureExtractor:
    """Actor-pool stage: REAL baseline 4:4:4 color JPEG decode →
    per-image (width, height, mean_r, mean_g, mean_b)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_jpeg(blob)
            if px.ndim != 3:
                raise ValueError("expected color JPEG")
            ws.append(w)
            hs.append(h)
            mr.append(round(float(px[..., 0].mean()), 6))
            mg.append(round(float(px[..., 1].mean()), 6))
            mb.append(round(float(px[..., 2].mean()), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_r", pa.array(mr, pa.float64()))
        out = out.append_column("mean_g", pa.array(mg, pa.float64()))
        out = out.append_column("mean_b", pa.array(mb, pa.float64()))
        return out


# --- real AVI/MJPEG video container (no external libs) ------------------------

AVI_FPS = 10


def encode_avi_mjpeg(frames: list[bytes], w: int, h: int, fps: int = AVI_FPS) -> bytes:
    """JPEG frame payloads → real RIFF/AVI bytes (MJPEG): LIST hdrl with
    avih + strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER), LIST movi of
    '00dc' chunks (word-aligned), correct RIFF/LIST size fields."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # usec per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (HASINDEX off)
        len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes → (width, height, n_frames_declared, [frame payloads]).
    REAL RIFF walk: nested LIST traversal (hdrl → avih dims/count,
    movi → '00dc' frame chunks), word-aligned chunk sizes, unknown
    chunks skipped. Non-MJPEG streams raise ``NotImplementedError``."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = declared = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, declared
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            payload_end = pos + 8 + ln
            if payload_end > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(buf, pos + 12, payload_end)
            elif tag == b"avih":
                _, _, _, _, declared, _, _, _, w, h = struct.unpack_from(
                    "<IIIIIIIIII", buf, pos + 8
                )
            elif tag == b"strh":
                fcc_type, fcc = struct.unpack_from("<4s4s", buf, pos + 8)
                if fcc_type == b"vids" and fcc not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"only MJPEG video streams supported (got {fcc!r})"
                    )
            elif tag == b"00dc":
                frames.append(buf[pos + 8 : payload_end])
            pos = payload_end + (ln & 1)  # word alignment

    walk(blob, 12, len(blob))
    if w is None:
        raise ValueError("AVI missing avih header")
    return int(w), int(h), int(declared or len(frames)), frames


AVI_N_FRAMES, AVI_FRAME_W, AVI_FRAME_H = 6, 8, 8


def synthesize_avi_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real AVI/MJPEG payloads: frame f of doc d is the flat
    8x8 grayscale JPEG with value ``(d*5 + f*31) % 256`` — so sampled
    per-frame decodes reduce to the exact flat-block JPEG arithmetic the
    SQL oracle reproduces."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = []
    for dd in ids:
        frames = [
            encode_jpeg_gray(
                np.full((AVI_FRAME_H, AVI_FRAME_W), (dd * 5 + f * 31) % 256, np.uint8)
            )
            for f in range(AVI_N_FRAMES)
        ]
        blobs.append(encode_avi_mjpeg(frames, AVI_FRAME_W, AVI_FRAME_H))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class VideoFrameFeatures:
    """Actor-pool stage: REAL video path — RIFF/AVI container walk,
    every-``stride``-th frame sampled, each sampled frame decoded by the
    real baseline-JPEG decoder → (width, height, n_frames, n_sampled,
    mean gray over sampled frames)."""

    def __init__(self, stride: int = 2, payload_col: str = "payload"):
        self.stride = stride
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, nf, ns, means = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, declared, frames = decode_avi_frames(blob)
            sampled = frames[:: self.stride]
            fmeans = []
            for f in sampled:
                _, _, px = decode_jpeg_gray(f)
                fmeans.append(float(px.mean()))
            ws.append(w)
            hs.append(h)
            nf.append(declared)
            ns.append(len(sampled))
            means.append(round(float(np.mean(fmeans)) if fmeans else 0.0, 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("n_frames", pa.array(nf, pa.int64()))
        out = out.append_column("n_sampled", pa.array(ns, pa.int64()))
        out = out.append_column("mean_gray", pa.array(means, pa.float64()))
        return out


# --- real WAV/PCM codec (no external libs) ------------------------------------

WAV_RATE, WAV_N = 8000, 64  # synthesized sample rate / samples per doc


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE, channels: int = 1) -> bytes:
    """int16 samples (n,) or (n, channels) → real RIFF/WAVE bytes
    (PCM fmt chunk + data chunk, little-endian 16-bit)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, channels, (n, channels) int16). REAL
    RIFF chunk walk (fmt /data discovery, odd-size pad bytes, unknown
    chunks skipped); 16-bit integer PCM only — compressed codecs raise
    ``NotImplementedError`` so callers dead-letter rather than mis-decode."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit integer PCM supported (fmt={audio_fmt} bits={bits})"
                )
        elif tag == b"data":
            data = payload
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    else:
        samples = samples.reshape(-1, 1)
    return rate, channels, samples


def synthesize_wav_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real WAV payloads: sample i of doc d is
    ``((d*13 + i*7) % 65536) - 32768`` — pure arithmetic, so the SQL
    oracle reproduces the decoded amplitude stats exactly."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    i = np.arange(WAV_N, dtype=np.int64)
    blobs = []
    for d in ids:
        s = ((d * 13 + i * 7) % 65536 - 32768).astype(np.int16)
        blobs.append(encode_wav(s, rate=WAV_RATE, channels=1))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class WavFeatureExtractor:
    """Actor-pool stage: REAL WAV decode (RIFF walk, PCM frombuffer) →
    per-clip (n_samples, sample_rate, duration_ms, mean_abs, peak)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, rates, durs, means, peaks = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            rate, _ch, samples = decode_wav(blob)
            flat = samples.astype(np.int64).reshape(-1)
            n = samples.shape[0]
            ns.append(n)
            rates.append(rate)
            durs.append(round(n * 1000.0 / rate, 6))
            means.append(round(float(np.abs(flat).mean()), 6))
            peaks.append(int(np.abs(flat).max()) if len(flat) else 0)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int64()))
        out = out.append_column("duration_ms", pa.array(durs, pa.float64()))
        out = out.append_column("mean_abs", pa.array(means, pa.float64()))
        out = out.append_column("peak", pa.array(peaks, pa.int64()))
        return out


# --- real IMA/DVI ADPCM compressed-audio codec (no external libs) ------------

# public IMA/DVI ADPCM tables (spec constants)
ADPCM_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
     34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
     157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
     598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
     1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
     5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
     13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64,
)
ADPCM_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_ADPCM_MAGIC = b"ADP1"


def _adpcm_quantize(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One IMA ADPCM step shared by encode and decode: quantize
    (sample − pred) to a 4-bit code against step idx, reconstruct, clamp.
    Returns (code, new_pred, new_idx). Pure integer arithmetic — the SQL
    oracle's recursive CTE carries exactly this state machine."""
    step = int(ADPCM_STEPS[idx])
    diff = sample - pred
    sign = 8 if diff < 0 else 0
    ad = -diff if diff < 0 else diff
    code = 0
    if ad >= step:
        code |= 4
        ad -= step
    if ad >= step >> 1:
        code |= 2
        ad -= step >> 1
    if ad >= step >> 2:
        code |= 1
    diffq = (step >> 3) + (step if code & 4 else 0) + (
        (step >> 1) if code & 2 else 0
    ) + ((step >> 2) if code & 1 else 0)
    pred = pred - diffq if sign else pred + diffq
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(ADPCM_INDEX[code])))
    return sign | code, pred, idx


def encode_adpcm(samples: np.ndarray) -> bytes:
    """int16 mono samples → IMA ADPCM (4:1): 'ADP1' magic + uint32
    sample count + packed nibbles (low nibble first), initial state
    pred=0, index=0. Lossy by design; the decoder state machine below
    reconstructs the exact quantized stream."""
    pred, idx = 0, 0
    nibbles = []
    for s in np.asarray(samples, dtype=np.int64):
        code, pred, idx = _adpcm_quantize(int(s), pred, idx)
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2)
    )
    return _ADPCM_MAGIC + struct.pack("<I", len(samples)) + packed


def decode_adpcm(blob: bytes) -> np.ndarray:
    """IMA ADPCM bytes → int16 samples: the decoder runs the same state
    machine from (pred=0, index=0), reconstructing each quantized
    sample; truncated streams raise instead of mis-decoding."""
    if blob[:4] != _ADPCM_MAGIC:
        raise ValueError("not an ADPCM stream")
    (n,) = struct.unpack_from("<I", blob, 4)
    need = 8 + (n + 1) // 2
    if len(blob) < need:
        raise ValueError("truncated ADPCM stream")
    out = np.empty(n, dtype=np.int16)
    pred, idx = 0, 0
    for i in range(n):
        b = blob[8 + i // 2]
        code = (b >> 4) if i % 2 else (b & 0xF)
        step = int(ADPCM_STEPS[idx])
        diffq = (step >> 3) + (step if code & 4 else 0) + (
            (step >> 1) if code & 2 else 0
        ) + ((step >> 2) if code & 1 else 0)
        pred = pred - diffq if code & 8 else pred + diffq
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(ADPCM_INDEX[code & 7])))
        out[i] = pred
    return out


def synthesize_adpcm_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic ADPCM payloads over the same synthetic samples as
    the WAV fixture (sample i of doc d = ((d*13 + i*7) % 65536) − 32768):
    the lossy quantization is a pure integer state machine the SQL
    oracle replays with a recursive CTE."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    i = np.arange(WAV_N, dtype=np.int64)
    blobs = []
    for d in ids:
        s = ((d * 13 + i * 7) % 65536 - 32768).astype(np.int16)
        blobs.append(encode_adpcm(s))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class AdpcmFeatureExtractor:
    """Actor-pool stage: REAL IMA ADPCM decode (nibble unpack + step
    table state machine) → per-clip (n_samples, compressed_bytes,
    mean_abs, peak) of the reconstructed signal."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, nbytes, means, peaks = [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            samples = decode_adpcm(blob).astype(np.int64)
            ns.append(len(samples))
            nbytes.append(len(blob))
            means.append(round(float(np.abs(samples).mean()), 6) if len(samples) else 0.0)
            peaks.append(int(np.abs(samples).max()) if len(samples) else 0)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("compressed_bytes", pa.array(nbytes, pa.int64()))
        out = out.append_column("mean_abs", pa.array(means, pa.float64()))
        out = out.append_column("peak", pa.array(peaks, pa.int64()))
        return out


class MediaDecoder:
    """Actor-pool decode/feature stage over a binary column.

    ``fake=True`` runs the deterministic stub (header check + derived
    pseudo width/height/duration); ``fake=False`` is the real-codec slot
    and raises ``NotImplementedError`` (no PIL/ffmpeg in this container).
    """

    def __init__(self, fake: bool = True, payload_col: str = "payload"):
        self.fake = fake
        self.payload_col = payload_col
        if not fake:
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t[self.payload_col]
        n_bytes = pc.binary_length(payload).cast(pa.int64())
        valid = pc.equal(
            pc.binary_slice(payload.combine_chunks(), 0, 4), pa.scalar(b"IMG0")
        )
        nb = n_bytes.to_numpy(zero_copy_only=False)
        width = (nb % 640).astype(np.int64)
        height = (nb % 480).astype(np.int64)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("n_bytes", n_bytes)
        out = out.append_column("valid_magic", pc.cast(valid, pa.int32()))
        out = out.append_column("width", pa.array(width))
        out = out.append_column("height", pa.array(height))
        return out


# --- real progressive JPEG (SOF2), grayscale ---------------------------------
#
# Spectral selection + successive approximation, both directions: the
# encoder emits the standard six-scan ladder (DC first Al=1, DC refine,
# two AC bands first-pass Al=1, two AC refine scans) with EOBRUN
# accumulation and buffered correction bits; the decoder replays any
# conformant grayscale progressive scan script (multiple SOS segments,
# per-scan Ss/Se/Ah/Al) into one coefficient array. The invariant tested
# is exact: after all scans the coefficient array equals the encoder's
# quantized coefficients bit for bit, so progressive decode == baseline
# decode of the same image. Color progressive raises (dead-letter).


# Progressive AC alphabet includes the EOBn symbols (r<<4 | 0, r=1..14)
# that the baseline spec table omits, so progressive files carry their
# own DHT: all 256 symbols as canonical 9/10-bit codes (255 nine-bit
# codes + one ten-bit; the all-ones code stays unassigned, as required).
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(256))


def _quantize_zigzag_blocks(pixels: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 → (nblocks, 64) int32 quantized coefficients in
    ZIGZAG order, raster block order — the shared source both the
    baseline and progressive encoders code from."""
    h, w = pixels.shape
    d = _dct_mat()
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = pixels[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = np.round(d @ block @ d.T, 6)
            qc = _fl_round(coef / q)
            out.append(qc.reshape(-1)[_ZIGZAG])
    return np.array(out, dtype=np.int32)


class _ProgressiveWriter:
    """One entropy scan's emitter: Huffman symbols, EOBRUN accumulation
    and buffered correction bits. Correction bits live in TWO buffers
    matching the decoder's consumption order: ``br_eob`` holds the bits
    of blocks already folded into the pending EOB run (the decoder reads
    them right after the EOBn symbol, block by block), ``br_cur`` holds
    the current block's bits since its last emitted symbol (the decoder
    reads them while advancing the run after the NEXT symbol)."""

    def __init__(self, codes: dict):
        self.bw = _BitWriter()
        self.codes = codes
        self.eobrun = 0
        self.br_eob: list[int] = []
        self.br_cur: list[int] = []

    def sym(self, s: int) -> None:
        self.bw.write(*self.codes[s])

    def flush_cur(self) -> None:
        for b in self.br_cur:
            self.bw.write(b, 1)
        self.br_cur = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            for b in self.br_eob:
                self.bw.write(b, 1)
            self.br_eob = []
            self.eobrun = 0

    def end_block(self, pending: bool) -> None:
        """Fold the block's tail (trailing zero run and/or pending
        correction bits) into the EOB run."""
        if pending:
            self.eobrun += 1
            self.br_eob += self.br_cur
            self.br_cur = []
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def finish(self) -> bytes:
        self.emit_eobrun()
        return self.bw.flush()


def _emit_mag(bw: _BitWriter, v: int, codes: dict, run: int = 0) -> None:
    mag, size = abs(v), 0
    while mag:
        mag >>= 1
        size += 1
    bw.write(*codes[(run << 4) | size])
    if size:
        bw.write(v if v > 0 else v + (1 << size) - 1, size)


def encode_jpeg_progressive(
    pixels: np.ndarray, qtable: np.ndarray | None = None
) -> bytes:
    """(H, W) uint8 grayscale or (H, W, 3) uint8 RGB → real progressive
    JFIF bytes (SOF2). Scan ladder: interleaved DC first (Ah=0, Al=1)
    and DC refinement across all components, then per-component AC bands
    1-5 and 6-63 first pass (Al=1) followed by their refinement scans.
    Color is 4:4:4 YCbCr with the dual quant tables of the baseline
    encoder."""
    color = pixels.ndim == 3
    if color:
        h, w, nc = pixels.shape
        if nc != 3:
            raise ValueError("expected (H, W, 3) RGB")
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [JPEG_QTABLE, JPEG_QTABLE_CHROMA, JPEG_QTABLE_CHROMA]
    else:
        h, w = pixels.shape
        planes = [pixels]
        qtabs = [JPEG_QTABLE if qtable is None else qtable]
    if h % 8 or w % 8:
        raise ValueError("encoder requires 8x8-multiple dimensions")
    coefs_list = [_quantize_zigzag_blocks(pl, qt) for pl, qt in zip(planes, qtabs)]
    ncomp = len(coefs_list)
    nblocks = len(coefs_list[0])
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def dc_first(al: int) -> bytes:
        # interleaved MCU order: one block per component per position
        bw = _BitWriter()
        preds = [0] * ncomp
        for b in range(nblocks):
            for ci in range(ncomp):
                v = int(coefs_list[ci][b, 0]) >> al  # arithmetic point transform
                _emit_mag(bw, v - preds[ci], dc_codes)
                preds[ci] = v
        return bw.flush()

    def dc_refine(al: int) -> bytes:
        bw = _BitWriter()
        for b in range(nblocks):
            for ci in range(ncomp):
                bw.write((int(coefs_list[ci][b, 0]) >> al) & 1, 1)
        return bw.flush()

    def ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        coefs = coefs_list[ci]
        pw = _ProgressiveWriter(ac_codes)
        for b in range(nblocks):
            r = 0
            for k in range(ss, se + 1):
                v = int(coefs[b, k])
                t = (abs(v)) >> al
                if t == 0:
                    r += 1
                    continue
                pw.emit_eobrun()
                while r > 15:
                    pw.sym(0xF0)
                    r -= 16
                _emit_mag(pw.bw, t if v > 0 else -t, ac_codes, run=r)
                r = 0
            pw.end_block(r > 0)
        return pw.finish()

    def ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        coefs = coefs_list[ci]
        pw = _ProgressiveWriter(ac_codes)
        for b in range(nblocks):
            absv = [abs(int(coefs[b, k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index AFTER last newly-significant coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    # EAGER ZRL at the 16th zero-history coefficient (only
                    # while a later newly-significant coeff exists): the
                    # decoder consumes correction bits positionally while
                    # burning exactly these 16 zeros, so each ZRL window's
                    # bits must flush with ITS symbol, not pooled later
                    if r == 16 and i < eob:
                        pw.emit_eobrun()
                        pw.sym(0xF0)
                        pw.flush_cur()
                        r = 0
                    continue
                if t > 1:  # already significant: buffer the correction bit
                    pw.br_cur.append(t & 1)
                    continue
                # newly significant (t == 1); eager ZRLs guarantee r <= 15
                pw.emit_eobrun()
                pw.sym((r << 4) | 1)
                pw.bw.write(1 if int(coefs[b, ss + i]) > 0 else 0, 1)
                pw.flush_cur()
                r = 0
            pw.end_block(r > 0 or bool(pw.br_cur))
        return pw.finish()

    def sos_dc(ah: int, al: int, data: bytes) -> bytes:
        comps = []
        for ci in range(ncomp):
            comps += [ci + 1, 0x00]
        return _seg(
            0xDA, bytes([ncomp] + comps + [0, 0, (ah << 4) | al])
        ) + data

    def sos_ac(ci: int, ss: int, se: int, ah: int, al: int, data: bytes) -> bytes:
        return _seg(
            0xDA, bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
        ) + data

    out = b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xDB, b"\x00" + qtabs[0].reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    )
    if color:
        out += _seg(
            0xDB, b"\x01" + qtabs[1].reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        )
        sof_comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:
        sof_comps = b"\x01\x11\x00"
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)  # SOF2
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))
    out += sos_dc(0, 1, dc_first(1))
    out += sos_dc(1, 0, dc_refine(0))
    for ci in range(ncomp):
        out += sos_ac(ci, 1, 5, 0, 1, ac_first(ci, 1, 5, 1))
        out += sos_ac(ci, 6, 63, 0, 1, ac_first(ci, 6, 63, 1))
    for ci in range(ncomp):
        out += sos_ac(ci, 1, 5, 1, 0, ac_refine(ci, 1, 5, 0))
        out += sos_ac(ci, 6, 63, 1, 0, ac_refine(ci, 6, 63, 0))
    out += b"\xff\xd9"
    return out


def _entropy_span(blob: bytes, start: int) -> tuple[bytes, int]:
    """Entropy-coded bytes from ``start`` up to the next real marker
    (stuffed 0x00 and RSTn stay inside the span)."""
    i = start
    n = len(blob)
    while i + 1 < n:
        if blob[i] == 0xFF and blob[i + 1] != 0x00 and not (
            0xD0 <= blob[i + 1] <= 0xD7
        ):
            return blob[start:i], i
        i += 1
    return blob[start:n], n


def decode_jpeg_progressive(
    blob: bytes, _max_scans: int | None = None, _return_coefs: bool = False
):
    """Progressive (SOF2) decode, 1- or 3-component 4:4:4: accumulate
    every scan (interleaved or single-component DC first/refine, AC
    first with EOBRUN, AC refinement with correction bits) into
    per-component coefficient arrays, then dequantize + IDCT (+
    YCbCr→RGB for color). Subsampled progressive raises
    NotImplementedError (dead-letter)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (component id, quant selector)
    scans: list = []
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = blob[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", blob, pos + 2)
        if pos + 2 + ln > len(blob):
            raise ValueError("truncated JPEG segment")
        payload = blob[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = zz
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 1- or 3-component progressive supported"
                )
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled progressive unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker == 0xC0:
            raise ValueError("baseline SOF in progressive decoder")
        elif marker == 0xDA:
            ns = payload[0]
            scomps = []
            for c in range(ns):
                cid = payload[1 + 2 * c]
                sel = payload[2 + 2 * c]
                scomps.append((cid, sel >> 4, sel & 0xF))
            off = 1 + 2 * ns
            ss, se = payload[off], payload[off + 1]
            ah, al = payload[off + 2] >> 4, payload[off + 2] & 0xF
            data, nxt = _entropy_span(blob, pos + 2 + ln)
            scans.append(((ss, se, ah, al, scomps), data))
            pos = nxt
            continue
        pos += 2 + ln
    if h is None or not scans or not comps:
        raise ValueError("JPEG missing SOF2/SOS")
    if h % 8 or w % 8:
        raise NotImplementedError("partial MCUs unsupported")
    nblocks = (h // 8) * (w // 8)
    cindex = {cid: i for i, (cid, _tq) in enumerate(comps)}
    coefs_list = [np.zeros((nblocks, 64), np.int64) for _ in comps]

    for (ss, se, ah, al, scomps), data in (
        scans if _max_scans is None else scans[:_max_scans]
    ):
        br = _BitReader(data)
        if ss == 0:  # DC scan (se must be 0); may be interleaved
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            idxs = [cindex[cid] for cid, _d, _a in scomps]
            if ah == 0:
                dcts = [htables[(0, d)] for _cid, d, _a in scomps]
                preds = [0] * len(idxs)
                for b in range(nblocks):
                    for j, ci in enumerate(idxs):
                        size = _huff_read(br, dcts[j])
                        diff = _extend(br.read_bits(size), size) if size else 0
                        preds[j] += diff
                        coefs_list[ci][b, 0] = preds[j] << al
            else:
                for b in range(nblocks):
                    for ci in idxs:
                        if br.read_bit():
                            coefs_list[ci][b, 0] |= 1 << al
        else:  # AC scan: single component, single band
            if len(scomps) != 1:
                raise ValueError("interleaved AC scan is not legal JPEG")
            cid, _dcs, acs = scomps[0]
            coefs = coefs_list[cindex[cid]]
            act = htables[(1, acs)]
            eobrun = 0
            p1, m1 = 1 << al, -(1 << al)
            for b in range(nblocks):
                if ah == 0:  # first pass
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _huff_read(br, act)
                        r, s = sym >> 4, sym & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index overflow")
                        coefs[b, k] = _extend(br.read_bits(s), s) << al
                        k += 1
                else:  # refinement
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            sym = _huff_read(br, act)
                            r, s = sym >> 4, sym & 15
                            val = 0
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                            else:
                                if s != 1:
                                    raise ValueError("bad refinement symbol")
                                val = p1 if br.read_bit() else m1
                            while k <= se:
                                if coefs[b, k] != 0:
                                    if br.read_bit() and not (coefs[b, k] & p1):
                                        coefs[b, k] += (
                                            p1 if coefs[b, k] >= 0 else m1
                                        )
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                coefs[b, k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if coefs[b, k] != 0:
                                if br.read_bit() and not (coefs[b, k] & p1):
                                    coefs[b, k] += p1 if coefs[b, k] >= 0 else m1
                            k += 1
                        eobrun -= 1

    if _return_coefs:
        return w, h, coefs_list[0] if len(coefs_list) == 1 else coefs_list
    d = _dct_mat()
    planes = []
    for (cid, tq), coefs in zip(comps, coefs_list):
        q = qtables[tq]
        plane = np.zeros((h, w), np.uint8)
        b = 0
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                coef = np.zeros(64, np.int64)
                coef[_ZIGZAG] = coefs[b]
                block = d.T @ (coef.reshape(8, 8) * q).astype(np.float64) @ d
                plane[by : by + 8, bx : bx + 8] = np.clip(
                    _fl_round(block + 128.0), 0, 255
                ).astype(np.uint8)
                b += 1
        planes.append(plane)
    if len(planes) == 1:
        return w, h, planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return w, h, np.clip(_fl_round(rgb), 0, 255).astype(np.uint8)


# --- real GIF codec (LZW; no external libs) -----------------------------------
#
# GIF87a/89a: logical screen descriptor, global color table, image
# descriptor (optional interlace), LZW-compressed index stream in
# sub-blocks, trailer. The LZW variant is GIF's: variable code width
# starting at min_code_size+1 (LSB-first bit packing), CLEAR/EOI codes,
# dictionary growth to 12 bits with a CLEAR-reset at 4096. Width-growth
# synchronization: the decoder adds its table entry one code behind the
# encoder, so the decoder grows at next_code == 2^width while the encoder
# grows at next_code == 2^width + 1 — the standard pairing (fuzzed across
# both growth boundaries and the 4096 reset in tests).

GIF_W, GIF_H = 20, 12


def _gif_palette() -> np.ndarray:
    """Deterministic 256-entry palette: entry i = ((i*2+1)%256,
    (i*5+3)%256, (i*11+7)%256) — pure arithmetic for the SQL oracle."""
    i = np.arange(256, dtype=np.int64)
    return np.stack(
        [(i * 2 + 1) % 256, (i * 5 + 3) % 256, (i * 11 + 7) % 256], axis=1
    ).astype(np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    emit(clear, width)
    seq = indices.astype(np.uint8).tobytes()
    prev = seq[:1]
    for j in range(1, len(seq)):
        k = seq[j : j + 1]
        if prev + k in table:
            prev = prev + k
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[prev + k] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # dictionary full: reset both sides via CLEAR
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
        prev = k
    emit(table[prev], width)
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> np.ndarray:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = acc = n_acc = 0

    def read(width: int) -> int:
        nonlocal pos, acc, n_acc
        while n_acc < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        return v

    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        c = read(width)
        if c == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if c == eoi:
            break
        if c < len(table):
            entry = table[c]
        elif c == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("gif: bad LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out), dtype=np.uint8)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace (start, step)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index grid + (n, 3) palette → GIF89a bytes."""
    h, w = indices.shape
    n = len(palette)
    size_bits = max(1, int(np.ceil(np.log2(n))) if n > 1 else 1)
    full = 1 << size_bits
    pal = np.zeros((full, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_bits - 1), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    if interlace:
        rows = np.concatenate(
            [np.arange(s, h, st) for s, st in _GIF_PASSES]
        )
        indices = indices[rows]
    mcs = max(2, size_bits)  # LZW min code size (≥2 per spec)
    out.append(mcs)
    comp = _lzw_encode(indices.reshape(-1), mcs)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(blob: bytes) -> tuple[int, int, np.ndarray]:
    """GIF bytes → (w, h, rgb uint8 (h, w, 3)). Supports global color
    table, one image (local table + interlace handled), skips 89a
    extension blocks; animation/multiple frames dead-letter. Truncated
    payloads raise ValueError (the dead-letter contract), never
    struct.error/IndexError."""
    try:
        return _decode_gif(blob)
    except (struct.error, IndexError) as e:
        raise ValueError(f"gif: truncated payload ({e})") from e


def _decode_gif(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    w, h = struct.unpack_from("<HH", blob, 6)
    packed, _bg, _ar = blob[10], blob[11], blob[12]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while True:
        if pos >= len(blob):
            raise ValueError("gif: missing image descriptor")
        b0 = blob[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 == 0x2C:
            break
        if b0 == 0x3B:
            raise ValueError("gif: no image data")
        raise ValueError(f"gif: unexpected block 0x{b0:02x}")
    _lx, _ty, iw, ih = struct.unpack_from("<HHHH", blob, pos)
    pos += 8
    ip = blob[pos]
    pos += 1
    if ip & 0x80:  # local color table wins
        n = 2 << (ip & 0x07)
        palette = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if palette is None:
        raise ValueError("gif: no color table")
    mcs = blob[pos]
    pos += 1
    comp = bytearray()
    while blob[pos]:
        ln = blob[pos]
        comp += blob[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    idx = _lzw_decode(bytes(comp), mcs)
    if len(idx) != iw * ih:
        raise ValueError(f"gif: got {len(idx)} pixels, want {iw * ih}")
    grid = idx.reshape(ih, iw)
    if ip & 0x40:  # deinterlace
        rows = np.concatenate(
            [np.arange(s, ih, st) for s, st in _GIF_PASSES]
        )
        de = np.empty_like(grid)
        de[rows] = grid
        grid = de
    return iw, ih, palette[grid]


def synthesize_gif_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real GIF payloads: pixel p of doc d has palette
    index ``(d*7 + p*5) % 256`` against the arithmetic palette — the SQL
    oracle reproduces decoded channel means exactly. Every 3rd image is
    interlaced so decode exercises the four-pass row order."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pal = _gif_palette()
    p = np.arange(GIF_W * GIF_H, dtype=np.int64)
    blobs = []
    for d in ids:
        idx = ((d * 7 + p * 5) % 256).astype(np.uint8).reshape(GIF_H, GIF_W)
        blobs.append(encode_gif(idx, pal, interlace=(d % 3 == 0)))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class GifFeatureExtractor:
    """Actor-pool stage: REAL GIF decode (LZW, interlace, color table) →
    per-image (width, height, channel means). Same contract as the other
    codec extractors."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_gif(blob)
            means = px.reshape(-1, 3).mean(axis=0)
            ws.append(w)
            hs.append(h)
            mr.append(round(float(means[0]), 6))
            mg.append(round(float(means[1]), 6))
            mb.append(round(float(means[2]), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_r", pa.array(mr, pa.float64()))
        out = out.append_column("mean_g", pa.array(mg, pa.float64()))
        out = out.append_column("mean_b", pa.array(mb, pa.float64()))
        return out


# --- real G.711 µ-law companding codec ----------------------------------------
#
# Per-sample logarithmic PCM (8:16 compression, telephony standard):
# encode clamps |x| to 32635, biases by 132, finds the segment exponent
# (the 8-range ladder), keeps a 4-bit mantissa and complements the byte;
# decode is the exact published inverse ((mant·8 + 132) << exp − 132).
# Stateless per sample → fully vectorized, and the SQL oracle reproduces
# the integer arithmetic with shift/mask expressions.

_ULAW_THRESH = np.array([256, 512, 1024, 2048, 4096, 8192, 16384], np.int64)


def encode_ulaw(samples: np.ndarray) -> bytes:
    x = samples.astype(np.int64)
    sign = (x < 0).astype(np.int64)
    mag = np.minimum(np.abs(x), 32635) + 132
    exp = np.digitize(mag, _ULAW_THRESH)
    mant = (mag >> (exp + 3)) & 0x0F
    code = ~((sign << 7) | (exp << 4) | mant) & 0xFF
    return code.astype(np.uint8).tobytes()


def decode_ulaw(blob: bytes) -> np.ndarray:
    c = (~np.frombuffer(blob, np.uint8).astype(np.int64)) & 0xFF
    sign = c >> 7
    exp = (c >> 4) & 7
    mant = c & 0x0F
    mag = (((mant << 3) + 132) << exp) - 132
    return np.where(sign == 1, -mag, mag).astype(np.int16)


def synthesize_ulaw_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic µ-law payloads over the shared WAV fixture samples
    (sample i of doc d = ((d*13 + i*7) % 65536) − 32768)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    i = np.arange(WAV_N, dtype=np.int64)
    blobs = []
    for d in ids:
        s = ((d * 13 + i * 7) % 65536 - 32768).astype(np.int16)
        blobs.append(encode_ulaw(s))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class UlawFeatureExtractor:
    """Actor-pool stage: REAL µ-law decode → per-clip (n_samples,
    compressed_bytes, mean_abs, peak) of the reconstructed signal."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, nbytes, means, peaks = [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            samples = decode_ulaw(blob).astype(np.int64)
            ns.append(len(samples))
            nbytes.append(len(blob))
            means.append(
                round(float(np.abs(samples).mean()), 6) if len(samples) else 0.0
            )
            peaks.append(int(np.abs(samples).max()) if len(samples) else 0)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column(
            "compressed_bytes", pa.array(nbytes, pa.int64())
        )
        out = out.append_column("mean_abs", pa.array(means, pa.float64()))
        out = out.append_column("peak", pa.array(peaks, pa.int64()))
        return out


# --- real baseline TIFF codec (uncompressed RGB; no external libs) ------------
#
# TIFF 6.0 baseline: byte-order header (II/MM + 42), IFD entry walk
# (tag/type/count/value-or-offset, SHORT and LONG types, inline values
# when they fit in 4 bytes), uncompressed chunky RGB in one or more
# strips. The reader honors either byte order and multi-strip layouts;
# the writer emits little-endian single-strip files.

TIFF_W, TIFF_H = 10, 7

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def encode_tiff(pixels_rgb: np.ndarray, rows_per_strip: int | None = None) -> bytes:
    h, w, _ = pixels_rgb.shape
    rps = rows_per_strip or h
    strips = [
        pixels_rgb[y : y + rps].tobytes() for y in range(0, h, rps)
    ]
    n = len(strips)

    # layout: header(8) | IFD | bps array(6) | strip offsets/counts arrays |
    # strip data
    tags = []  # (tag, type, count, value_or_offset_placeholder)
    ifd_entries = 10
    ifd_size = 2 + ifd_entries * 12 + 4
    pos_after_ifd = 8 + ifd_size
    bps_off = pos_after_ifd
    arrays = bytearray()
    arrays += struct.pack("<HHH", 8, 8, 8)  # BitsPerSample[3]
    ext = len(arrays)
    if n > 1:
        arrays += b"\x00" * (4 * n)  # strip-offsets array, patched below
        arrays += struct.pack(f"<{n}L", *[len(s) for s in strips])
    data_off = bps_off + len(arrays)
    offs = []
    acc = data_off
    for s in strips:
        offs.append(acc)
        acc += len(s)
    if n > 1:
        arrays[ext : ext + 4 * n] = struct.pack(f"<{n}L", *offs)

    def entry(tag, typ, count, val):
        return struct.pack("<HHL", tag, typ, count) + val

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<L", v)

    e = b""
    e += entry(256, 3, 1, short_val(w))  # ImageWidth
    e += entry(257, 3, 1, short_val(h))  # ImageLength
    e += entry(258, 3, 3, long_val(bps_off))  # BitsPerSample → array
    e += entry(259, 3, 1, short_val(1))  # Compression = none
    e += entry(262, 3, 1, short_val(2))  # Photometric = RGB
    if n == 1:
        e += entry(273, 4, 1, long_val(offs[0]))  # StripOffsets
    else:
        e += entry(273, 4, n, long_val(bps_off + ext))
    e += entry(277, 3, 1, short_val(3))  # SamplesPerPixel
    e += entry(278, 3, 1, short_val(rps))  # RowsPerStrip
    if n == 1:
        e += entry(279, 4, 1, long_val(len(strips[0])))  # StripByteCounts
    else:
        e += entry(279, 4, n, long_val(bps_off + ext + 4 * n))
    e += entry(284, 3, 1, short_val(1))  # PlanarConfig = chunky
    out = bytearray()
    out += b"II*\x00" + struct.pack("<L", 8)
    out += struct.pack("<H", ifd_entries) + e + struct.pack("<L", 0)
    out += arrays
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline uncompressed chunky RGB TIFF → (w, h, (h,w,3) uint8).
    Handles II and MM byte orders, SHORT/LONG tag types, inline values,
    and multi-strip layouts; anything else dead-letters (ValueError)."""
    try:
        return _decode_tiff(blob)
    except (struct.error, IndexError) as e:
        raise ValueError(f"tiff: truncated payload ({e})") from e


def _decode_tiff(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[:2] == b"II":
        bo = "<"
    elif blob[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    if struct.unpack_from(bo + "H", blob, 2)[0] != 42:
        raise ValueError("tiff: bad magic")
    (ifd_off,) = struct.unpack_from(bo + "L", blob, 4)
    (n_ent,) = struct.unpack_from(bo + "H", blob, ifd_off)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_ent):
        base = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(bo + "HHL", blob, base)
        tags[tag] = (typ, cnt, blob[base + 8 : base + 12])

    def values(tag):
        typ, cnt, raw = tags[tag]
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            raise ValueError(f"tiff: unsupported type {typ} for tag {tag}")
        fmt = {1: "B", 3: "H", 4: "L"}[typ]
        total = size * cnt
        if total <= 4:
            buf = raw
        else:
            (off,) = struct.unpack(bo + "L", raw)
            buf = blob[off : off + total]
        return list(struct.unpack(bo + str(cnt) + fmt, buf[:total]))

    w = values(256)[0]
    h = values(257)[0]
    comp = values(259)[0] if 259 in tags else 1
    if comp != 1:
        raise ValueError(f"tiff: unsupported compression {comp}")
    photo = values(262)[0] if 262 in tags else 2
    spp = values(277)[0] if 277 in tags else 1
    if photo != 2 or spp != 3:
        raise ValueError("tiff: only chunky RGB supported")
    if 284 in tags and values(284)[0] != 1:
        raise ValueError("tiff: only chunky planar config supported")
    if 258 in tags and values(258) != [8, 8, 8]:
        raise ValueError("tiff: only 8-bit samples supported")
    offs = values(273)
    cnts = values(279)
    data = b"".join(blob[o : o + c] for o, c in zip(offs, cnts))
    if len(data) != w * h * 3:
        raise ValueError(f"tiff: got {len(data)} bytes, want {w * h * 3}")
    return w, h, np.frombuffer(data, np.uint8).reshape(h, w, 3)


def synthesize_tiff_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic real TIFF payloads: channel c of flat pixel i is
    ``(doc_id*3 + i*5 + c*11) % 256``; every 2nd image is multi-strip
    (rows_per_strip=3) so decode exercises strip reassembly."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_px = TIFF_W * TIFF_H
    i = np.arange(n_px, dtype=np.int64)
    blobs = []
    for d in ids:
        chans = [
            ((d * 3 + i * 5 + c * 11) % 256).astype(np.uint8)
            for c in range(3)
        ]
        rgb = np.stack(chans, axis=1).reshape(TIFF_H, TIFF_W, 3)
        blobs.append(
            encode_tiff(rgb, rows_per_strip=3 if d % 2 == 0 else None)
        )
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class TiffFeatureExtractor:
    """Actor-pool stage: REAL TIFF decode (IFD walk, strips) →
    per-image (width, height, channel means)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_tiff(blob)
            means = px.reshape(-1, 3).mean(axis=0)
            ws.append(w)
            hs.append(h)
            mr.append(round(float(means[0]), 6))
            mg.append(round(float(means[1]), 6))
            mb.append(round(float(means[2]), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mean_r", pa.array(mr, pa.float64()))
        out = out.append_column("mean_g", pa.array(mg, pa.float64()))
        out = out.append_column("mean_b", pa.array(mb, pa.float64()))
        return out


# --- G.711 A-law (the European companding half) --------------------------------
#
# Same stateless per-sample structure as µ-law with A-law's segment
# table: magnitudes < 256 keep mant = mag >> 4 with exp 0; otherwise
# exp = segment of mag, mant = 4 bits below the leading one; the code
# byte XORs with 0x55 (spec). Decode is the published inverse.

def encode_alaw(samples: np.ndarray) -> bytes:
    x = samples.astype(np.int64)
    sign = (x >= 0).astype(np.int64)  # A-law: 1 = positive
    mag = np.minimum(np.abs(x), 32767)
    exp = np.digitize(mag, _ULAW_THRESH)  # same power-of-two ladder
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    code = ((sign << 7) | (exp << 4) | mant) ^ 0x55
    return code.astype(np.uint8).tobytes()


def decode_alaw(blob: bytes) -> np.ndarray:
    c = np.frombuffer(blob, np.uint8).astype(np.int64) ^ 0x55
    sign = c >> 7
    exp = (c >> 4) & 7
    mant = c & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 264) << (exp - 1),
    )
    return np.where(sign == 1, mag, -mag).astype(np.int16)


def synthesize_alaw_column(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic A-law payloads over the shared WAV fixture samples."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    i = np.arange(WAV_N, dtype=np.int64)
    blobs = []
    for d in ids:
        s = ((d * 13 + i * 7) % 65536 - 32768).astype(np.int16)
        blobs.append(encode_alaw(s))
    return t.append_column("payload", pa.array(blobs, pa.binary()))


class AlawFeatureExtractor:
    """Actor-pool stage: REAL A-law decode → per-clip (n_samples,
    compressed_bytes, mean_abs, peak)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, nbytes, means, peaks = [], [], [], []
        for blob in t[self.payload_col].to_pylist():
            samples = decode_alaw(blob).astype(np.int64)
            ns.append(len(samples))
            nbytes.append(len(blob))
            means.append(
                round(float(np.abs(samples).mean()), 6) if len(samples) else 0.0
            )
            peaks.append(int(np.abs(samples).max()) if len(samples) else 0)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column(
            "compressed_bytes", pa.array(nbytes, pa.int64())
        )
        out = out.append_column("mean_abs", pa.array(means, pa.float64()))
        out = out.append_column("peak", pa.array(peaks, pa.int64()))
        return out


class BmpResizeFeatures:
    """Actor-pool RESIZE stage: real BMP decode → exact 2×2 box-filter
    downsample (area average — the resize kernel production image
    pipelines use for thumbnailing) → per-image features of the RESIZED
    grid: dims, channel means, and a position-weighted checksum that
    proves the spatial layout (a mean alone cannot distinguish a resize
    from a shuffle). Downsample is one numpy reshape-mean, no loops over
    pixels."""

    def __init__(self, payload_col: str = "payload", factor: int = 2):
        self.payload_col = payload_col
        self.factor = factor

    def __call__(self, t: pa.Table) -> pa.Table:
        f = self.factor
        rws, rhs = [], []
        means = [[], [], []]
        wsums = [[], [], []]
        for blob in t[self.payload_col].to_pylist():
            w, h, px = decode_bmp(blob)
            rh, rw = h // f, w // f
            small = (
                px[: rh * f, : rw * f, :]
                .astype(np.float64)
                .reshape(rh, f, rw, f, 3)
                .mean(axis=(1, 3))
            )
            rws.append(rw)
            rhs.append(rh)
            pos = np.arange(1, rh * rw + 1, dtype=np.float64).reshape(rh, rw)
            for c in range(3):
                means[c].append(round(float(small[:, :, c].mean()), 6))
                wsums[c].append(round(float((small[:, :, c] * pos).sum()), 6))
        out = t.drop_columns([self.payload_col])
        out = out.append_column("rw", pa.array(rws, pa.int64()))
        out = out.append_column("rh", pa.array(rhs, pa.int64()))
        for name, c in (("r", 0), ("g", 1), ("b", 2)):
            out = out.append_column(f"mean_{name}", pa.array(means[c], pa.float64()))
            out = out.append_column(f"wsum_{name}", pa.array(wsums[c], pa.float64()))
        return out
