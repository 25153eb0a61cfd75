"""Tile payload transcode: PNG ↔ lossless WebP (VP8L).

Modern tile pipelines ship WebP payloads (MBTiles `format=webp`,
PMTiles tile_type 4) for the ~25-40% size win; the reference's
output contract is PNG (png crate, Compression::Best). This operator
converts a fused tile table's payloads AFTER the parity-contracted
render, using the engine's own from-spec codecs on BOTH sides
(png/codec.py, webp/codec.py) — so the conversion is lossless and
self-verifiable end to end: canvas → VP8L → canvas is exact, and the
decode-back pixel stats run under the DuckDB value gate against the
same kernel twin as the PNG legs (a `webp` leg of
render_pixel_stats).

Value ↔ RGBA mapping (stated for the twin): u8 value v → (v, v, v),
u32 value v → (v>>16 & 255, v>>8 & 255, v & 255) — identical to the
PNG RGB packing (reference parity, png/color.rs:28-35) — and nodata
pixels carry alpha 0 (VP8L has native alpha; PNG uses tRNS), every
other pixel alpha 255. One mapInPandas stage, no shuffle: transcode
is per-row."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def _canvas_to_rgba(canvas: np.ndarray, dtype_tag: str,
                    nodata: int) -> np.ndarray:
    h, w = canvas.shape
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    if dtype_tag == "u8":
        rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = canvas
    elif dtype_tag == "u32":
        v = canvas.astype(np.uint32)
        rgba[:, :, 0] = (v >> 16) & 0xFF
        rgba[:, :, 1] = (v >> 8) & 0xFF
        rgba[:, :, 2] = v & 0xFF
    else:
        raise ValueError(f"unsupported dtype {dtype_tag!r}")
    rgba[:, :, 3] = np.where(canvas == nodata, 0, 255)
    return rgba


def _rgba_to_canvas(rgba: np.ndarray, dtype_tag: str,
                    nodata: int) -> np.ndarray:
    if dtype_tag == "u8":
        v = rgba[:, :, 0].astype(np.uint8)
    else:
        p = rgba.astype(np.uint32)
        v = (p[:, :, 0] << 16) | (p[:, :, 1] << 8) | p[:, :, 2]
    return np.where(rgba[:, :, 3] == 0, np.asarray(nodata, v.dtype), v)


def transcode_tiles(fused: DataFrame, to: str = "webp",
                    dtype_tag: str = "u8", nodata: int = 0,
                    colormap_str: str | None = None) -> DataFrame:
    """Re-encode the `png` payload column of a fused tile table.

    ``to='webp'``: PNG → lossless VP8L (column renamed to `webp`).
    ``to='png'``: WebP → grayscale/RGB PNG (column renamed to `png`).
    All other columns pass through; no shuffle is introduced."""
    if to not in ("webp", "png"):
        raise ValueError(f"unsupported target format {to!r}")
    src_col = "png" if to == "webp" else "webp"
    if src_col not in fused.columns:
        raise ValueError(f"input table has no {src_col!r} column")
    other = [c for c in fused.columns if c != src_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in fused.schema.fields if f.name != src_col] + [f"{to} binary"])

    def convert(batches):
        import pandas as pd

        from ..kernel import encode_tile
        from ..operators.overview import decode_canvas
        from ..png.codec import Colormap
        from ..webp.codec import decode_webp, encode_webp_lossless

        cmap = (Colormap.parse(colormap_str, nodata)
                if colormap_str else None)
        for pdf in batches:
            out = []
            for blob in pdf[src_col]:
                if to == "webp":
                    canvas = decode_canvas(bytes(blob), dtype_tag, cmap,
                                           nodata)
                    out.append(encode_webp_lossless(
                        _canvas_to_rgba(canvas, dtype_tag, nodata),
                        subtract_green=True, cache_bits=4))
                else:
                    canvas = _rgba_to_canvas(decode_webp(bytes(blob)),
                                             dtype_tag, nodata)
                    out.append(encode_tile(canvas, dtype_tag, nodata, cmap))
            res = pdf[other].copy()
            res[to] = out
            yield res

    return fused.mapInPandas(convert, out_schema)
