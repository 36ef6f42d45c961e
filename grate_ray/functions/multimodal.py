"""Multimodal (binary-payload) operators: real Ray-side schema/batch/actor
mechanics throughout; one REAL dependency-free codec (uncompressed 24-bit
BMP — pure header parsing + numpy pixel math), with the external-lib
codecs (jpeg/png/audio) STUBBED behind ``NotImplementedError``.

Pattern for 100 TB media pipelines: binary columns stay in Arrow
(``batch_format="pyarrow"`` end to end — binary does not survive pandas
object dtype cleanly), batches are kept small (payload-size aware), and
the decoder is an actor pool whose (real) model/codec loads once per actor.
"""

from __future__ import annotations

import struct

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
