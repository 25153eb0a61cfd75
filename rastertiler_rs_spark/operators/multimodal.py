"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with (fmt, w, h) metadata
— exactly the engine's native images table shape. The Spark-side
plumbing (schemas, Arrow batching, partition behavior) is real and
tested; PNG decode/resize is fully implemented via the engine codec.
Codecs absent from this container (JPEG/WebP/audio/video) are stubbed
behind NotImplementedError with the batch signatures production
implementations would drop into.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..png import decode_png, encode_grayscale8
from ..fixtures import NODATA

_SUPPORTED = ("png;u8", "png;u32")


def _decode_any(data: bytes, fmt: str) -> np.ndarray:
    if fmt.startswith("png"):
        return decode_png(data)["pixels"]
    if fmt.startswith(("jpeg", "webp")):
        # STUB: container has no JPEG/WebP codec. A production build
        # plugs pillow/turbojpeg here; everything around this call
        # (schema, batching, caching) is the real pipeline.
        raise NotImplementedError(f"codec for {fmt!r} not available in this environment")
    raise ValueError(f"unknown image fmt {fmt!r}")


def image_metadata(images: DataFrame) -> DataFrame:
    """Decode headers and cross-check declared vs actual dimensions:
    (image_id, fmt, decl_w, decl_h, actual_w, actual_h, dims_match)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "fmt": [], "decl_w": [], "decl_h": [],
                   "actual_w": [], "actual_h": [], "dims_match": []}
            for row in pdf.itertuples(index=False):
                d = decode_png(bytes(row.bytes))
                out["image_id"].append(row.image_id)
                out["fmt"].append(row.fmt)
                out["decl_w"].append(int(row.w))
                out["decl_h"].append(int(row.h))
                out["actual_w"].append(d["width"])
                out["actual_h"].append(d["height"])
                out["dims_match"].append(d["width"] == row.w and d["height"] == row.h)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, "image_id string, fmt string, decl_w int, decl_h int, "
            "actual_w int, actual_h int, dims_match boolean")


def resize_images(images: DataFrame, target: int) -> DataFrame:
    """Nearest-neighbor resize to target x target (the kernel's K2 rule):
    (image_id, bytes). Real for png;u8; other codecs raise (stub)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": []}
            for row in pdf.itertuples(index=False):
                if row.fmt != "png;u8":
                    raise NotImplementedError(f"resize for {row.fmt!r} is stubbed")
                band = decode_png(bytes(row.bytes))["pixels"]
                h, w = band.shape
                rows_i = ((np.arange(target) + 0.5) * h / target).astype(np.int64)
                cols_i = ((np.arange(target) + 0.5) * w / target).astype(np.int64)
                resized = band[np.minimum(rows_i, h - 1)[:, None],
                               np.minimum(cols_i, w - 1)[None, :]]
                out["image_id"].append(row.image_id)
                out["bytes"].append(encode_grayscale8(resized, NODATA))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        fn, "image_id string, bytes binary")


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling STUB. Real plumbing: binary column in,
    exploded (video_id, frame_no, frame_bytes) out; a production build
    plugs a demuxer into `_extract`. Calling it raises."""

    def _extract(data: bytes, every_n: int):
        raise NotImplementedError("video demuxer not available in this environment")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = {"video_id": [], "frame_no": [], "frame_bytes": []}
            for row in pdf.itertuples(index=False):
                for frame_no, frame in _extract(bytes(row.bytes), every_n):
                    frames["video_id"].append(row.video_id)
                    frames["frame_no"].append(frame_no)
                    frames["frame_bytes"].append(frame)
            yield pd.DataFrame(frames)

    return videos.mapInPandas(fn, "video_id string, frame_no int, frame_bytes binary")
