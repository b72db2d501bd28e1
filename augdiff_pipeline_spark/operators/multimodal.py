"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side architecture is real and tested — schema, Arrow batch
shape, partitioning, kernel signatures:

- images: decode → resize (block-mean, pure numpy — real) →
  feature-extract (phash, mean color, luma stats — real);
- video: frame-sample — the container has no video codec, so the frame
  DECODE step is an explicitly-marked stub (`NotImplementedError` for
  real containers; a deterministic fake container format is provided so
  the sampling/batching plumbing is exercised end-to-end);
- audio: windowed energy features over a deterministic fake PCM blob
  (real numpy math; real audio codecs would slot into `_decode_audio`).

All kernels run in mapInPandas over Arrow batches.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import images as imgcodec

# ------------------------------------------------------------------ images
def resize_block_mean(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean resize (area interpolation), pure numpy."""
    h, w, c = arr.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    csum = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    csum[1:, 1:] = arr.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            block = csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            out[i, j] = block / ((y1 - y0) * (x1 - x0))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(images: DataFrame, thumb: int = 8) -> DataFrame:
    """(image_id, phash, mean_r, mean_g, mean_b, luma_std, thumb_bytes)."""

    def kernel(it):
        for pdf in it:
            out = {"image_id": [], "phash": [], "mean_r": [], "mean_g": [],
                   "mean_b": [], "luma_std": [], "thumb_bytes": []}
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                arr = imgcodec.decode(bytes(blob))
                t = resize_block_mean(arr, thumb, thumb)
                means = arr.reshape(-1, 3).mean(axis=0)
                luma = arr.astype(np.float64).mean(axis=2)
                out["image_id"].append(iid)
                out["phash"].append(imgcodec.phash64(arr))
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["luma_std"].append(float(luma.std()))
                out["thumb_bytes"].append(t.tobytes())
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(
        kernel,
        "image_id string, phash long, mean_r double, mean_g double, "
        "mean_b double, luma_std double, thumb_bytes binary",
    )


# ------------------------------------------------------------------- video
_VID_MAGIC = b"ADPV"


def encode_fake_video(frames: np.ndarray) -> bytes:
    """Deterministic fake container: (n, h, w, 3) uint8 frames."""
    n, h, w, _ = frames.shape
    import zlib

    return _VID_MAGIC + struct.pack("<HHH", n, w, h) + zlib.compress(frames.tobytes(), 1)


def _decode_video(blob: bytes) -> np.ndarray:
    if blob[:4] != _VID_MAGIC:
        # ENV STUB: real containers (mp4/webm) need a video codec library
        # that is not present in this environment.
        raise NotImplementedError("real video decode requires an AV codec (not in env)")
    import zlib

    n, w, h = struct.unpack_from("<HHH", blob, 4)
    return np.frombuffer(zlib.decompress(blob[10:]), dtype=np.uint8).reshape(n, h, w, 3)


def sample_frames(videos: DataFrame, every_n: int = 5) -> DataFrame:
    """(video_id, frame_no, frame_phash) — deterministic frame sampling."""

    def kernel(it):
        for pdf in it:
            out = {"video_id": [], "frame_no": [], "frame_phash": []}
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                frames = _decode_video(bytes(blob))
                for fno in range(0, len(frames), every_n):
                    out["video_id"].append(vid)
                    out["frame_no"].append(fno)
                    out["frame_phash"].append(imgcodec.phash64(frames[fno]))
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(
        kernel, "video_id string, frame_no int, frame_phash long"
    )


# ------------------------------------------------------------------- audio
_AUD_MAGIC = b"ADPA"


def encode_fake_audio(pcm: np.ndarray, rate: int = 16000) -> bytes:
    import zlib

    return _AUD_MAGIC + struct.pack("<I", rate) + zlib.compress(pcm.astype("<i2").tobytes(), 1)


def _decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    if blob[:4] != _AUD_MAGIC:
        raise NotImplementedError("real audio decode requires an audio codec (not in env)")
    import zlib

    (rate,) = struct.unpack_from("<I", blob, 4)
    return np.frombuffer(zlib.decompress(blob[8:]), dtype="<i2"), rate


def audio_energy_windows(audio: DataFrame, window_ms: int = 100) -> DataFrame:
    """(audio_id, window_no, rms) — windowed RMS energy, vectorized."""

    def kernel(it):
        for pdf in it:
            out = {"audio_id": [], "window_no": [], "rms": []}
            for aid, blob in zip(pdf["audio_id"], pdf["bytes"]):
                pcm, rate = _decode_audio(bytes(blob))
                wlen = max(1, rate * window_ms // 1000)
                n = len(pcm) // wlen
                if n == 0:
                    continue
                w = pcm[: n * wlen].astype(np.float64).reshape(n, wlen)
                rms = np.sqrt((w * w).mean(axis=1))
                out["audio_id"].extend([aid] * n)
                out["window_no"].extend(range(n))
                out["rms"].extend(np.round(rms, 6))
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes").mapInPandas(
        kernel, "audio_id string, window_no int, rms double"
    )
