"""Audio/video multimodal stages — real Ray plumbing, stubbed codecs.

The engine treats audio/video like images: opaque ``large_binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages. No
audio/video libraries exist in this container, so the codec seams are
STUBBED (``NotImplementedError``) with deterministic fakes driving the
tests — schema, batch shapes, actor signatures and output layout are real
(same pattern as ``sources/pdf.py``).

Fake formats (for tests):
- audio: float32 PCM little-endian raw bytes, 16 kHz mono
- video: concatenated grayscale frames, header ``width,height,n|`` then raw
  uint8 frames
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("n_samples", pa.int64()),
        ("duration_sec", pa.float64()),
        ("rms", pa.float64()),
        ("zero_crossings", pa.int64()),
    ]
)

VIDEO_FRAME_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_luma", pa.float64()),
    ]
)


class AudioDecoder:
    """Seam: bytes -> (samples float32 array, sample_rate)."""

    def decode(self, data: bytes) -> tuple[np.ndarray, int]:
        raise NotImplementedError(
            "no audio codec in this environment; plug ffmpeg/soundfile here"
        )


class FakePcmDecoder(AudioDecoder):
    def decode(self, data: bytes) -> tuple[np.ndarray, int]:
        return np.frombuffer(data, dtype=np.float32), 16000


class AudioFeatureStage:
    """Actor-pool stage: (clip_id, bytes) -> per-clip audio features.

    ``map_batches(AudioFeatureStage, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)`` — decoder loads once per actor; features
    are vectorized numpy per clip.
    """

    def __init__(self, decoder: AudioDecoder | None = None):
        self.decoder = decoder or AudioDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in AUDIO_FEATURE_SCHEMA}
        for cid, data in zip(batch["clip_id"].to_pylist(), batch["bytes"].to_pylist()):
            samples, sr = self.decoder.decode(data)
            rows["clip_id"].append(cid)
            rows["n_samples"].append(len(samples))
            rows["duration_sec"].append(round(len(samples) / sr, 6))
            rows["rms"].append(
                round(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0, 6)
            )
            rows["zero_crossings"].append(
                int(np.count_nonzero(np.diff(np.signbit(samples))))
            )
        return pa.Table.from_pydict(rows, schema=AUDIO_FEATURE_SCHEMA)


class VideoDecoder:
    """Seam: bytes -> iterator of (H, W) uint8 frames."""

    def frames(self, data: bytes):
        raise NotImplementedError(
            "no video codec in this environment; plug pyav/ffmpeg here"
        )


class FakeRawVideoDecoder(VideoDecoder):
    def frames(self, data: bytes):
        header, _, body = data.partition(b"|")
        w, h, n = (int(v) for v in header.decode().split(","))
        frame_bytes = w * h
        for i in range(n):
            yield np.frombuffer(
                body[i * frame_bytes : (i + 1) * frame_bytes], dtype=np.uint8
            ).reshape(h, w)


class VideoFrameSampleStage:
    """Actor-pool stage: sample every ``stride``-th frame, emit per-frame
    metadata rows (1:N flat-map, like the OCR crop fan-out)."""

    def __init__(self, decoder: VideoDecoder | None = None, stride: int = 2):
        self.decoder = decoder or VideoDecoder()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in VIDEO_FRAME_SCHEMA}
        for cid, data in zip(batch["clip_id"].to_pylist(), batch["bytes"].to_pylist()):
            for idx, frame in enumerate(self.decoder.frames(data)):
                if idx % self.stride:
                    continue
                rows["clip_id"].append(cid)
                rows["frame_idx"].append(idx)
                rows["height"].append(frame.shape[0])
                rows["width"].append(frame.shape[1])
                rows["mean_luma"].append(round(float(frame.mean()), 6))
        return pa.Table.from_pydict(rows, schema=VIDEO_FRAME_SCHEMA)
