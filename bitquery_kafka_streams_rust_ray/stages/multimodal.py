"""Multimodal columns: opaque binary payloads + typed metadata.

Convention: an image/audio/video column is ``large_binary`` alongside a
metadata struct (``{kind, width, height, sample_rate, n_frames, ...}``).
Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages with small batches (payloads are wide rows).

The real codecs (PIL / torchaudio / ffmpeg) are NOT in this container,
so the decode core is stubbed: ``require_real_codecs=True`` raises
``NotImplementedError`` at actor construction, and the default path
decodes a deterministic fake container format (``FAKEIMG``/``FAKEAUD``
headers, produced by :func:`fake_image` / :func:`fake_audio`) so the
Ray-side plumbing — schema, batch sizing, actor signatures, output
layout — is real and tested end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"
_VID_MAGIC = b"FAKEVID1"


def fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image container: header + seeded pixel bytes."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 1000).astype(np.int16)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def fake_video(width: int, height: int, n_frames: int, fps: int = 25,
               seed: int = 0) -> bytes:
    """Deterministic fake video container: header + seeded frame bytes."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height,
                          dtype=np.uint8)
    return (_VID_MAGIC + struct.pack("<IIII", width, height, n_frames, fps)
            + frames.tobytes())


class FrameSampleStage:
    """binary video -> one row per sampled frame, as fake-image bytes.

    The flat-map analog for video: each input row explodes into
    ``ceil(n_frames / every)`` frame rows carrying ``(frame_idx,
    frame_ts_s, frame)`` where ``frame`` is a decodable fake-image
    container, so downstream image stages compose. Real path would be
    ffmpeg/pyav keyframe sampling (not in this container).
    """

    def __init__(self, every: int = 10, video_col: str = "video",
                 id_col: str = "vid_id"):
        if every <= 0:
            raise ValueError("every must be positive")
        self.every, self.video_col, self.id_col = every, video_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_idx, out_ts, out_frames = [], [], [], []
        ids = batch[self.id_col].to_pylist()
        for vid, payload in zip(ids, batch[self.video_col].to_pylist()):
            if not (payload and payload[:8] == _VID_MAGIC):
                continue  # undecodable -> quarantined (F8 semantics)
            w, h, n_frames, fps = struct.unpack_from("<IIII", payload, 8)
            frames = np.frombuffer(payload, dtype=np.uint8, offset=24)
            frames = frames.reshape(n_frames, h * w)
            for i in range(0, n_frames, self.every):
                out_ids.append(vid)
                out_idx.append(i)
                out_ts.append(round(i / fps, 6) if fps else 0.0)
                out_frames.append(
                    _IMG_MAGIC + struct.pack("<II", w, h) + frames[i].tobytes()
                )
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_ts_s": pa.array(out_ts, type=pa.float64()),
                "frame": pa.array(out_frames, type=pa.large_binary()),
            }
        )


class DecodeImageStage:
    """binary image -> (width, height, checksum, mean_pixel).

    With ``require_real_codecs=True`` this is where PIL would load; in
    this container that path raises ``NotImplementedError`` (clearly
    marked stub), and the fake container is decoded instead.
    """

    def __init__(self, image_col: str = "image", require_real_codecs: bool = False):
        if require_real_codecs:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "real image codecs (PIL) are not available in this "
                    "container; use the deterministic fake-container path"
                ) from exc
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, checksums, means = [], [], [], []
        for payload in batch[self.image_col].to_pylist():
            if payload and payload[:8] == _IMG_MAGIC:
                w, h = struct.unpack_from("<II", payload, 8)
                pixels = np.frombuffer(payload, dtype=np.uint8, offset=16)
                widths.append(w)
                heights.append(h)
                checksums.append(zlib.crc32(payload[16:]))
                means.append(float(pixels.mean()) if len(pixels) else 0.0)
            else:  # undecodable -> quarantine row (F8 semantics)
                widths.append(None)
                heights.append(None)
                checksums.append(None)
                means.append(None)
        out = batch.drop_columns([self.image_col])
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("checksum", pa.array(checksums, type=pa.int64()))
        out = out.append_column("mean_pixel", pa.array(means, type=pa.float64()))
        return out


class ResizeImageStage:
    """binary image -> binary image at (out_w, out_h), nearest-neighbor
    on the fake container (real path would be PIL thumbnail)."""

    def __init__(self, out_w: int, out_h: int, image_col: str = "image"):
        self.out_w, self.out_h, self.image_col = out_w, out_h, image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = []
        for payload in batch[self.image_col].to_pylist():
            if payload and payload[:8] == _IMG_MAGIC:
                w, h = struct.unpack_from("<II", payload, 8)
                pixels = np.frombuffer(payload, dtype=np.uint8, offset=16)
                pixels = pixels.reshape(h, w)
                ys = (np.arange(self.out_h) * h // self.out_h)
                xs = (np.arange(self.out_w) * w // self.out_w)
                small = pixels[np.ix_(ys, xs)]
                resized.append(
                    _IMG_MAGIC
                    + struct.pack("<II", self.out_w, self.out_h)
                    + small.tobytes()
                )
            else:
                resized.append(None)
        idx = batch.column_names.index(self.image_col)
        return batch.set_column(
            idx, self.image_col, pa.array(resized, type=pa.large_binary())
        )


class AudioFeatureStage:
    """binary audio -> (sample_rate, n_samples, duration_s, rms)."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, counts, durations, rms = [], [], [], []
        for payload in batch[self.audio_col].to_pylist():
            if payload and payload[:8] == _AUD_MAGIC:
                sr, n = struct.unpack_from("<II", payload, 8)
                samples = np.frombuffer(payload, dtype=np.int16, offset=16)
                rates.append(sr)
                counts.append(n)
                durations.append(round(n / sr, 6) if sr else 0.0)
                rms.append(
                    round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 6)
                    if len(samples) else 0.0
                )
            else:
                rates.append(None)
                counts.append(None)
                durations.append(None)
                rms.append(None)
        out = batch.drop_columns([self.audio_col])
        out = out.append_column("sample_rate", pa.array(rates, type=pa.int32()))
        out = out.append_column("n_samples", pa.array(counts, type=pa.int64()))
        out = out.append_column("duration_s", pa.array(durations, type=pa.float64()))
        out = out.append_column("rms", pa.array(rms, type=pa.float64()))
        return out
