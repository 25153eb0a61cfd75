"""Overview pyramid (O1): build zoom N tiles from zoom N+1 tiles.

The reference accelerates low zooms by reading GeoTIFF internal
overviews instead of full-resolution pixels — faster, slightly less
precise, and switchable off (/root/reference/src/dataset.rs:28-30,
/root/reference/README.md:62). The Spark-native analog: materialize
zoom z from zoom z+1 by assembling each parent's four children and
nearest-decimating 2x (same K2 index rule, idx = floor((i+0.5)*2) =
2i+1), so low zooms never touch source images at all.

Why this matters at 100 TB: a direct z0 render mosaics EVERY image onto
one tile — 10^12 contributions to a single group key. The cascade makes
each level a groupBy with at most FOUR rows per key (the children), no
skew, each level 1/4 the size of the one below. This is the scale path;
direct render stays the exact path (the reference's
--disable-overviews default-off tradeoff).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..fixtures import NODATA
from ..kernel import encode_tile
from ..png import Colormap, decode_png


def decode_canvas(png_bytes: bytes, dtype_tag: str, colormap: Colormap | None = None,
                  nodata: int = NODATA) -> np.ndarray:
    """Invert encode_tile: PNG bytes → the value canvas that produced it.

    All engine encodes are lossless for values <= 24 bits (the reference's
    own u32→RGB truncation, /root/reference/src/png/color.rs:28-35), so
    decode∘encode == identity on the render path.
    """
    d = decode_png(png_bytes)
    if dtype_tag == "u8":
        if d["color_type"] == 0:  # grayscale: pixels ARE values
            return d["pixels"].astype(np.uint8)
        # paletted via a user colormap: index i ↔ i-th inserted value
        lut = np.fromiter(colormap.values.keys(), dtype=np.int64,
                          count=len(colormap.values))
        return lut[d["pixels"]].astype(np.uint8)
    if dtype_tag == "u32":
        p = d["pixels"]
        if d["color_type"] == 2:  # RGB: value = r<<16 | g<<8 | b
            p = p.astype(np.uint32)
            return (p[:, :, 0] << 16) | (p[:, :, 1] << 8) | p[:, :, 2]
        # adaptive palette: PLTE entry i packs the value's low 24 bits;
        # index 0 is the nodata slot (pinned black, value = nodata)
        plte = d["palette"].astype(np.uint32)
        lut = (plte[:, 0] << 16) | (plte[:, 1] << 8) | plte[:, 2]
        lut[0] = np.uint32(nodata)
        return lut[d["pixels"]]
    raise ValueError(f"unsupported dtype {dtype_tag!r}")


def _assemble_fn(tile_size: int, dtype_tag: str, colormap_str: str | None, nodata: int):
    half = tile_size // 2
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, nodata) if colormap_str else None
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "png": []}
            for row in pdf.itertuples(index=False):
                canvas = np.full((tile_size, tile_size), nodata, dtype=np_dtype)
                for c in row.children:
                    child = decode_canvas(bytes(c["png"]), dtype_tag, colormap, nodata)
                    # child (qy,qx) occupies big[qy*ts:(qy+1)*ts, qx*ts:...];
                    # parent[r,c] = big[2r+1, 2c+1] ⇒ per-child odd-index slice
                    sub = child[1::2, 1::2]
                    qy, qx = int(c["qy"]), int(c["qx"])
                    canvas[qy * half : (qy + 1) * half, qx * half : (qx + 1) * half] = sub
                if (canvas == nodata).all():  # dropped-tile rule, dataset.rs:180-182
                    continue
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["png"].append(encode_tile(canvas, dtype_tag, nodata, colormap))
            yield pd.DataFrame(out)

    return fn


def build_overview_level(
    fused_level: DataFrame,
    tile_size: int,
    dtype_tag: str = "u8",
    colormap_str: str | None = None,
    nodata: int = NODATA,
) -> DataFrame:
    """One cascade step: fused tiles at a single zoom z → fused tiles at
    z-1 (same schema: zoom, x, y, tile_row, tile_hash, png).

    groupBy key = parent tile; group size <= 4 by construction, so the
    shuffle is skew-free regardless of data density.
    """
    if tile_size % 2:
        raise ValueError("tile_size must be even for 2x decimation")
    children = fused_level.select(
        (F.col("zoom") - 1).cast("int").alias("zoom"),
        F.shiftright("x", 1).alias("x"),
        F.shiftright("y", 1).alias("y"),
        (F.col("x").bitwiseAND(1)).cast("int").alias("qx"),
        (F.col("y").bitwiseAND(1)).cast("int").alias("qy"),
        "png",
    )
    grouped = children.groupBy("zoom", "x", "y").agg(
        F.collect_list(F.struct("qx", "qy", "png")).alias("children")
    )
    parents = grouped.mapInPandas(
        _assemble_fn(tile_size, dtype_tag, colormap_str, nodata),
        "zoom int, x long, y long, png binary",
    )
    flip = F.expr("shiftleft(1L, zoom)") - 1 - F.col("y")
    return (
        parents.withColumn("tile_row", flip)
        .withColumn("tile_hash", F.xxhash64("png"))
        .select("zoom", "x", "y", "tile_row", "tile_hash", "png")
    )


def render_pyramid(
    images: DataFrame,
    minzoom: int,
    maxzoom: int,
    tile_size: int = 512,
    dtype_tag: str = "u8",
    colormap_str: str | None = None,
    overview_below: int | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Full pyramid with the overview cascade below ``overview_below``:
    zooms in [overview_below, maxzoom] render directly from source
    images; zooms in [minzoom, overview_below) cascade down 2x per step.

    ``overview_below=None`` → all-direct (exact; the reference's
    --disable-overviews). Each cascade level is persisted — in
    production each level is written to the tile sink and read back, so
    lineage never re-renders the base (mbtiles_sink.write_tile_tables
    partitions by zoom for exactly this).
    """
    from .render import render

    if overview_below is None or overview_below <= minzoom:
        return render(images, minzoom, maxzoom, tile_size, dtype_tag,
                      colormap_str, salt_buckets=salt_buckets)
    base = max(overview_below, minzoom)
    direct = render(images, base, maxzoom, tile_size, dtype_tag,
                    colormap_str, salt_buckets=salt_buckets)
    levels = [direct]
    prev = direct.filter(F.col("zoom") == base).persist()
    for _z in range(base - 1, minzoom - 1, -1):
        prev = build_overview_level(prev, tile_size, dtype_tag,
                                    colormap_str, NODATA).persist()
        levels.append(prev)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
