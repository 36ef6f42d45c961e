"""Multimodal (binary-payload) plumbing: real Ray-side schema/batch/actor
mechanics; the codec itself is STUBBED (no image/audio libs in this
container — decode raises ``NotImplementedError`` unless the deterministic
fake is requested).

Pattern for 100 TB media pipelines: binary columns stay in Arrow
(``batch_format="pyarrow"`` end to end — binary does not survive pandas
object dtype cleanly), batches are kept small (payload-size aware), and
the decoder is an actor pool whose (real) model/codec loads once per actor.
"""

from __future__ import annotations

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
