"""Multimodal columns: images / audio / video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The decode step itself is STUBBED — no image/audio libraries exist in this
environment — behind ``decoder="fake"`` (deterministic, seed-free fake
derived from the payload bytes; default, fully tested) or
``decoder="pil"`` / ``decoder="librosa"`` which raise ``NotImplementedError``
with install guidance. Everything around the decode — schema contract,
actor-pool signature, batch sizing for large binaries, output layout — is
real Ray Data plumbing and is what a real decoder would drop into.

Design rules for large binary payloads (SURVEY §7.4 "wide binary rows"):
small ``batch_size`` (payload × batch × concurrency must fit worker heap),
``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
pandas cleanly), and the payload column is dropped as soon as features are
extracted so downstream stages move kilobytes, not megabytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prompture_ray.functions.sketches import hash64

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string()),
    pa.field("kind", pa.string()),            # image | audio | video
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("meta_json", pa.string()),
])


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = int(hash64(np.array([payload], dtype=object))[0])
    return 64 + (h & 0x3FF), 64 + ((h >> 10) & 0x3FF)


class ImageDecodeStage:
    """Actor-pool stage: payload → (width, height, n_channels) + a
    16-dim feature vector; payload column dropped on output.

    Use: ``ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
    batch_size=64, concurrency=(2, 8), num_cpus=1)`` — small batches
    because payloads are large.
    """

    def __init__(self, payload_col: str = "payload", decoder: str = "fake"):
        self.payload_col = payload_col
        if decoder == "pil":
            raise NotImplementedError(
                "real image decode needs Pillow (`pip install pillow`); "
                "not available in this environment — use decoder='fake'")
        if decoder not in ("fake",):
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            if p is None:
                widths.append(None)
                heights.append(None)
                feats.append(None)
                continue
            w, h = _fake_dims(p)
            widths.append(w)
            heights.append(h)
            # deterministic fake features: byte-histogram projection
            arr = np.frombuffer(p[:4096], dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
        out = t.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        return out.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class ImageResizeStage:
    """Actor-pool stage: image payload → resized payload + new dims.

    Contract (what a real resizer drops into): target box (max_w, max_h),
    aspect-preserving downscale only (never upscale), payload column
    REPLACED in place so downstream stages see the smaller binary. The
    pixel math is the deterministic fake (dims from the payload hash,
    payload truncated proportionally to the area ratio); a real
    implementation swaps Pillow into ``_resize_one``.
    """

    def __init__(self, payload_col: str = "payload", max_w: int = 512,
                 max_h: int = 512, decoder: str = "fake"):
        self.payload_col = payload_col
        self.max_w = max_w
        self.max_h = max_h
        if decoder == "pil":
            raise NotImplementedError(
                "real resize needs Pillow (`pip install pillow`); "
                "not available in this environment — use decoder='fake'")
        if decoder not in ("fake",):
            raise ValueError(f"unknown decoder {decoder!r}")

    def _resize_one(self, p: bytes) -> tuple[bytes, int, int]:
        w, h = _fake_dims(p)
        scale = min(1.0, self.max_w / w, self.max_h / h)
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        if scale >= 1.0:
            return p, w, h          # never upscale; payload untouched
        keep = max(1, int(len(p) * (nw * nh) / (w * h)))
        return p[:keep], nw, nh

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        out_p, ws, hs = [], [], []
        for p in payloads:
            if p is None:
                out_p.append(None); ws.append(None); hs.append(None)
                continue
            np_, w, h = self._resize_one(p)
            out_p.append(np_); ws.append(w); hs.append(h)
        idx = t.column_names.index(self.payload_col)
        out = t.set_column(idx, self.payload_col,
                           pa.array(out_p, type=pa.binary()))
        out = out.append_column("width", pa.array(ws, type=pa.int32()))
        return out.append_column("height", pa.array(hs, type=pa.int32()))


class AudioFeatureStage:
    """Actor-pool stage: audio payload → (duration_s, sample_rate, energy).
    Same stub contract as ImageDecodeStage."""

    def __init__(self, payload_col: str = "payload", decoder: str = "fake"):
        self.payload_col = payload_col
        if decoder == "librosa":
            raise NotImplementedError(
                "real audio decode needs librosa/soundfile; not available "
                "in this environment — use decoder='fake'")
        if decoder not in ("fake",):
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        dur, sr, en = [], [], []
        for p in payloads:
            if p is None:
                dur.append(None); sr.append(None); en.append(None)
                continue
            h = int(hash64(np.array([p], dtype=object))[0])
            sr_v = 16000 if h & 1 else 44100
            dur.append(round(len(p) / sr_v, 4))
            sr.append(sr_v)
            arr = np.frombuffer(p[: 2 * (len(p) // 2)], dtype=np.int16)
            en.append(float(np.sqrt(np.mean(arr.astype(np.float64) ** 2)))
                      if arr.size else 0.0)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("duration_s", pa.array(dur, type=pa.float64()))
        out = out.append_column("sample_rate", pa.array(sr, type=pa.int32()))
        return out.append_column("rms_energy", pa.array(en, type=pa.float64()))


class FrameSampleStage:
    """Video → sampled frame rows (flat_map shape: one row in, N out).
    The frame extraction is the same deterministic fake (slices of the
    payload); real decode would swap in pyav/ffmpeg."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 4):
        self.payload_col = payload_col
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t[self.payload_col].to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            if not p:
                continue
            step = max(1, len(p) // self.n_frames)
            for i in range(self.n_frames):
                out_id.append(mid)
                out_idx.append(i)
                out_frame.append(p[i * step:(i + 1) * step][:1024])
        return pa.table({
            "media_id": pa.array(out_id, type=pa.string()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frame, type=pa.binary()),
        })


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "meta_json": []}
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(2_000, 50_000))
        rows["media_id"].append(f"m{i:05d}")
        rows["kind"].append(kind)
        rows["payload"].append(rng.bytes(size))
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["meta_json"].append("{}")
    return pa.table(rows, schema=MEDIA_SCHEMA)
