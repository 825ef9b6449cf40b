"""Multimodal column stages (driver brief): image/audio/video ride through
the engine as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec boundary is stubbed exactly as instructed: ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the payload bytes) produces real arrays so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is fully exercised and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA_FIELDS = [
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("media_type", pa.string()),  # image/audio/video
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
]


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


class DecodeImage:
    """Actor-pool decode stage: payload binary -> feature vector.

    __init__ loads the codec ONCE per actor (or installs the deterministic
    fake); __call__ is per-batch.  Small batch sizes are mandatory for large
    binary payloads (see engine guidance) — callers pass batch_size<=64.
    """

    def __init__(self, *, fake: bool = False, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.pil = _try_import_pil()
        self.fake = fake
        if self.pil is None and not fake:
            raise NotImplementedError(
                "no image codec in this environment; construct with fake=True "
                "for the deterministic test decoder"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic: seed from payload bytes -> fixed-size 'embedding'
        from ..stages.geocode import _FNV_OFFSET, _FNV_PRIME

        h = int(_FNV_OFFSET)
        for b in payload[:64]:
            h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.default_rng(h)
        return rng.standard_normal(self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._fake_decode(p or b"") for p in payloads]) if payloads else np.zeros((0, self.feature_dim))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "features", pa.array(list(map(list, feats)), pa.list_(pa.float64()))
        )


class ResizeImage:
    """Actor-pool resize stage (codec-stubbed like DecodeImage): emits the
    target dimensions plus a payload whose bytes are the deterministic fake
    'resample' (a strided slice of the source payload) — schema and batch
    plumbing real, pixel math behind the stub boundary."""

    def __init__(self, *, out_w: int = 64, out_h: int = 64, fake: bool = False):
        self.out_w = out_w
        self.out_h = out_h
        self.pil = _try_import_pil()
        if self.pil is None and not fake:
            raise NotImplementedError(
                "no image codec in this environment; construct with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        target = max(self.out_w * self.out_h // 64, 1)
        resized = [
            (p or b"\0")[:: max(len(p or b"\0") // target, 1)] for p in payloads
        ]
        out = batch.drop_columns(
            [c for c in ("payload", "width", "height") if c in batch.column_names]
        )
        out = out.append_column("payload", pa.array(resized, pa.binary()))
        out = out.append_column("width", pa.array(np.full(n, self.out_w, np.int32), pa.int32()))
        return out.append_column("height", pa.array(np.full(n, self.out_h, np.int32), pa.int32()))


class AudioFeatures:
    """Audio feature extraction: the fake decoder reads the payload bytes as
    an int8 waveform (the codec boundary); the FEATURES are real vectorized
    DSP over it — per-window RMS energy and zero-crossing counts."""

    def __init__(self, *, window: int = 64, max_windows: int = 8, fake: bool = True):
        if not fake:
            raise NotImplementedError("no audio codec in this environment; fake=True only")
        self.window = window
        self.max_windows = max_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["media_id"].combine_chunks(), dtype=np.int64)
        out_rms, out_zc, out_id, out_win = [], [], [], []
        for mid, p in zip(ids, batch["payload"].to_pylist()):
            wave = np.frombuffer(p or b"\0", dtype=np.int8).astype(np.float64)
            nw = min(max(wave.size // self.window, 1), self.max_windows)
            w = wave[: nw * self.window]
            if w.size < nw * self.window:
                w = np.pad(w, (0, nw * self.window - w.size))
            W = w.reshape(nw, self.window)
            out_rms.append(np.sqrt((W * W).mean(axis=1)))
            out_zc.append((np.diff(np.signbit(W), axis=1) != 0).sum(axis=1))
            out_id.append(np.full(nw, mid, np.int64))
            out_win.append(np.arange(nw, dtype=np.int64))
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id) if out_id else np.empty(0, np.int64), pa.int64()),
                "window_no": pa.array(np.concatenate(out_win) if out_win else np.empty(0, np.int64), pa.int64()),
                "rms": pa.array(np.concatenate(out_rms) if out_rms else np.empty(0, np.float64), pa.float64()),
                "zero_crossings": pa.array(
                    np.concatenate(out_zc).astype(np.int64) if out_zc else np.empty(0, np.int64), pa.int64()
                ),
            }
        )


class FrameSample:
    """Video frame-sampling stage stub: emits (media_id, frame_no) rows for a
    deterministic stride — plumbing-real, codec-stubbed."""

    def __init__(self, stride: int = 10, max_frames: int = 5):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["media_id"].combine_chunks(), dtype=np.int64)
        lens = np.asarray(
            pa.compute.binary_length(batch["payload"]).combine_chunks(), dtype=np.int64
        )
        n_frames = np.minimum(np.maximum(lens // max(self.stride, 1), 1), self.max_frames)
        rep = np.repeat(ids, n_frames)
        starts = np.concatenate([[0], np.cumsum(n_frames)[:-1]])
        frame = np.arange(rep.size, dtype=np.int64) - starts[np.repeat(np.arange(ids.size), n_frames)]
        return pa.table(
            {
                "media_id": pa.array(rep, pa.int64()),
                "frame_no": pa.array(frame * self.stride, pa.int64()),
            }
        )


def decode_features(ds, *, fake: bool = True, feature_dim: int = 16, concurrency: int = 2,
                    batch_size: int = 64):
    """Dataset stage: actor-pool image decode (stubbed codec)."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
