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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


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

    def _fake_decode_batch(self, pay: pa.BinaryArray) -> np.ndarray:
        """Deterministic fake decoder, fully vectorized over the flat
        payload buffer (the AudioFeatures pattern): FNV-1a over each row's
        first 64 bytes (64 numpy column steps, no per-row Python), then a
        counter-based splitmix64 + Box–Muller turns each 64-bit hash into
        ``feature_dim`` standard-normal-distributed floats.  Same payload
        bytes -> same features, independent of batch boundaries."""
        from ..stages.geocode import _FNV_OFFSET, _FNV_PRIME

        n = len(pay)
        if n == 0:
            return np.zeros((0, self.feature_dim))
        bufs = pay.buffers()
        off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + pay.offset)[
            pay.offset : pay.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        lens = offsets[1:] - offsets[:-1]
        if pay.null_count:
            lens = np.where(np.asarray(pa.compute.is_null(pay)), 0, lens)
        prefix = np.minimum(lens, 64)
        h = np.full(n, np.uint64(_FNV_OFFSET))
        prime = np.uint64(_FNV_PRIME)
        if data.size:
            rel = np.arange(64, dtype=np.int64)
            gidx = np.minimum(offsets[:-1][:, None] + rel, data.size - 1)
            B = data[gidx].astype(np.uint64)
            for j in range(64):
                live = j < prefix
                h = np.where(live, (h ^ B[:, j]) * prime, h)
        # splitmix64 over (row hash, feature counter) -> two uniforms ->
        # Box–Muller normal; all (n, feature_dim) array ops
        d = self.feature_dim
        c = h[:, None] + (np.arange(d, dtype=np.uint64) + np.uint64(1)) * np.uint64(
            0x9E3779B97F4A7C15
        )
        u1 = _splitmix64(c)
        u2 = _splitmix64(c ^ np.uint64(0xD6E8FEB86659FD93))
        f1 = ((u1 >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
        f2 = (u2 >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
        return np.sqrt(-2.0 * np.log(f1)) * np.cos(2.0 * np.pi * f2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self._fake_decode_batch(batch["payload"].combine_chunks())
        out = batch.drop_columns(["payload"])
        lists = pa.ListArray.from_arrays(
            pa.array(
                np.arange(0, feats.size + 1, self.feature_dim, dtype=np.int32)
            ),
            pa.array(feats.ravel(), pa.float64()),
        )
        return out.append_column("features", lists)


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
        # vectorized strided 'resample' over the flat binary buffer (same
        # offsets pattern as AudioFeatures); empty/null payloads behave as
        # the single zero byte the scalar path used
        pay = batch["payload"].combine_chunks()
        n = len(pay)
        target = max(self.out_w * self.out_h // 64, 1)
        bufs = pay.buffers()
        off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
        offsets = (
            np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + pay.offset)[
                pay.offset : pay.offset + n + 1
            ].astype(np.int64)
            if n
            else np.zeros(1, np.int64)
        )
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if n and bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        lens = offsets[1:] - offsets[:-1]
        if n and pay.null_count:
            lens = np.where(np.asarray(pa.compute.is_null(pay)), 0, lens)
        lens_eff = np.maximum(lens, 1)  # empty -> the b"\0" scalar semantics
        stride = np.maximum(lens_eff // target, 1)
        n_out = (lens_eff + stride - 1) // stride
        from ..geom.primitives import repeat_expand

        pid, k = repeat_expand(n_out)
        src = offsets[:-1][pid] + k * stride[pid]
        valid = (lens[pid] > 0)
        if data.size:
            out_bytes = np.where(valid, data[np.minimum(src, data.size - 1)], np.uint8(0))
        else:
            out_bytes = np.zeros(pid.size, np.uint8)
        out_off = np.concatenate([[0], np.cumsum(n_out)])
        if out_off[-1] > np.iinfo(np.int32).max:
            # int32 binary offsets would silently wrap (the scalar path
            # raised ArrowCapacityError here); fail loud — callers shrink
            # batch_size for large outputs
            raise pa.ArrowCapacityError(
                f"ResizeImage batch output is {int(out_off[-1])} bytes "
                "(> 2 GiB binary-offset limit); reduce batch_size"
            )
        out_off = out_off.astype(np.int32)
        resized = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
        )
        out = batch.drop_columns(
            [c for c in ("payload", "width", "height") if c in batch.column_names]
        )
        out = out.append_column("payload", resized)
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
        # fully vectorized over the flat binary buffer (VERDICT r2 #8): the
        # windows are offset math over (payload offsets, window stride) —
        # the same pattern FrameSample uses — with a validity mask standing
        # in for the scalar path's zero padding.  Empty/null payloads act
        # as the single zero byte the scalar path used (all-zero window).
        ids = np.asarray(batch["media_id"].combine_chunks(), dtype=np.int64)
        pay = batch["payload"].combine_chunks()
        n = len(pay)
        if n == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "window_no": pa.array([], pa.int64()),
                    "rms": pa.array([], pa.float64()),
                    "zero_crossings": pa.array([], pa.int64()),
                }
            )
        bufs = pay.buffers()
        off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + pay.offset)[
            pay.offset : pay.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.int8)
            if bufs[2] is not None
            else np.empty(0, np.int8)
        )
        lens = offsets[1:] - offsets[:-1]
        if pay.null_count:
            lens = np.where(
                np.asarray(pa.compute.is_null(pay)), 0, lens
            )
        nw = np.minimum(np.maximum(lens // self.window, 1), self.max_windows)
        doc = np.repeat(np.arange(n, dtype=np.int64), nw)
        starts = np.concatenate([[0], np.cumsum(nw)[:-1]])
        win_no = np.arange(doc.size, dtype=np.int64) - np.repeat(starts, nw)
        rel = win_no[:, None] * self.window + np.arange(self.window, dtype=np.int64)
        valid = rel < lens[doc][:, None]
        if data.size:
            gidx = np.minimum(offsets[:-1][doc][:, None] + rel, data.size - 1)
            W = np.where(valid, data[gidx], np.int8(0)).astype(np.float64)
        else:
            W = np.zeros((doc.size, self.window), np.float64)
        rms = np.sqrt((W * W).mean(axis=1))
        zc = (np.diff(np.signbit(W), axis=1) != 0).sum(axis=1)
        return pa.table(
            {
                "media_id": pa.array(ids[doc], pa.int64()),
                "window_no": pa.array(win_no, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zc.astype(np.int64), pa.int64()),
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


def audio_features(ds, *, window: int = 64, max_windows: int = 8,
                   concurrency: int = 2, batch_size: int = 256):
    """Dataset stage: actor-pool windowed audio features over int8-PCM
    payloads (rms is bit-exact — integer square sums stay exact in float64
    regardless of summation order, /window is a power-of-2 divide, sqrt is
    libm-parity — so the stage is SQL-oracle-checkable end to end)."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"window": window, "max_windows": max_windows,
                               "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
