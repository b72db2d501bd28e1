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
def resize_block_mean_batch(stack: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched deterministic block-mean resize (area interpolation) of a
    (n, h, w, 3) uint8 stack — one integral-image pass, no per-pixel
    Python (the scalar form paid a double Python loop per OUTPUT
    pixel)."""
    blocks = imgcodec._block_means(stack.astype(np.float64), out_h, out_w)
    return np.clip(np.rint(blocks), 0, 255).astype(np.uint8)


def resize_block_mean(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean resize (area interpolation), pure numpy.
    Delegates to the batched kernel (n=1) so scalar callers (goldens,
    tests) agree bit-for-bit with the Spark batch path."""
    return resize_block_mean_batch(arr[None, ...], out_h, out_w)[0]


def _features_for_stack(stack: np.ndarray, thumb: int):
    """Vectorized feature block for one same-shape stack: (phash[],
    mean_rgb[n,3], luma_std[n], thumbs[n,t,t,3])."""
    n = len(stack)
    means = stack.reshape(n, -1, 3).mean(axis=1)
    luma = stack.astype(np.float64).mean(axis=3)
    luma_std = luma.reshape(n, -1).std(axis=1)
    ph = imgcodec.phash64_batch(stack)
    thumbs = resize_block_mean_batch(stack, thumb, thumb)
    return ph, means, luma_std, thumbs


def image_features(images: DataFrame, thumb: int = 8) -> DataFrame:
    """(image_id, phash, mean_r, mean_g, mean_b, luma_std, thumb_bytes).

    Decode is inherently per-blob (the codec's entropy stage), but
    everything after is batched: decoded arrays are grouped by shape,
    stacked, and featured per stack (same strategy as
    ``tiling.cut_tiles``) — phash/means/std/thumb all run as whole-stack
    numpy passes instead of a per-image Python loop.
    """

    def kernel(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({
                    "image_id": pd.Series([], dtype="object"),
                    "phash": pd.Series([], dtype="int64"),
                    "mean_r": pd.Series([], dtype="float64"),
                    "mean_g": pd.Series([], dtype="float64"),
                    "mean_b": pd.Series([], dtype="float64"),
                    "luma_std": pd.Series([], dtype="float64"),
                    "thumb_bytes": pd.Series([], dtype="object"),
                })
                continue
            arrs = [imgcodec.decode(bytes(b)) for b in pdf["bytes"]]
            shapes = np.array([a.shape[:2] for a in arrs], dtype=np.int64)
            ids = pdf["image_id"].to_numpy()
            ph = np.empty(n, dtype=np.int64)
            mean_rgb = np.empty((n, 3), dtype=np.float64)
            lstd = np.empty(n, dtype=np.float64)
            tbytes = np.empty(n, dtype=object)
            for hw in np.unique(shapes, axis=0):
                sel = np.flatnonzero((shapes == hw).all(axis=1))
                stack = np.stack([arrs[i] for i in sel])
                p, m, s, t = _features_for_stack(stack, thumb)
                ph[sel] = p
                mean_rgb[sel] = m
                lstd[sel] = s
                for j, i in enumerate(sel):
                    tbytes[i] = t[j].tobytes()
            yield pd.DataFrame({
                "image_id": ids, "phash": ph,
                "mean_r": mean_rgb[:, 0], "mean_g": mean_rgb[:, 1],
                "mean_b": mean_rgb[:, 2], "luma_std": lstd,
                "thumb_bytes": tbytes,
            })

    src = images.select("image_id", "bytes")
    # Each mapInPandas task pays ~80-100 ms of fixed Python-worker cost,
    # so a blob table whose scan fans out to thousands of partitions
    # (e.g. a hash-filtered sample of a multi-GB source: 4 MB splits at
    # sf1.0 leave ~4000 near-empty partitions carrying ~2 rows each)
    # spends seconds on pure task overhead.  coalesce is narrow — no
    # shuffle, rows and values unchanged — and only fires when the
    # input is pathologically over-partitioned for the session's cores
    # (guide §6: small inputs hurt twice, on the driver and per task).
    par = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() > 4 * par:
        src = src.coalesce(2 * par)
    return src.mapInPandas(
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
                fnos = np.arange(0, len(frames), every_n)
                if len(fnos) == 0:
                    continue
                # all frames of one container share a shape: hash the
                # sampled frames as one batched stack
                hashes = imgcodec.phash64_batch(frames[fnos])
                out["video_id"].extend([vid] * len(fnos))
                out["frame_no"].extend(fnos.tolist())
                out["frame_phash"].extend(hashes.tolist())
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
