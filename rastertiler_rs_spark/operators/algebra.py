"""Two-raster MAP ALGEBRA — per-pixel combination of two
co-registered tiled rasters (compositing / change detection, the
"local" class of map-algebra ops; the reference engine mosaics many
images into ONE raster — this is the binary-operator completion).

Plan shape: ONE equi-join on the tile key (both sides hash-partition
on (tx, ty) — at 100 TB both inputs would be written bucketed by the
same key and the join is co-located), then one python stage decodes
both payloads and combines pixel-wise. Tile bytes cross exactly one
exchange per side; no pixel ever shuffles uncompressed.

Every op is integer-exact with a stated rounding rule so the DuckDB
value twin can restate it verbatim (`algebra` leg of `tile_halo` in
__spark_entry__.py): mean = (a+b+1)//2 (round half up), absdiff,
min, max. Nodata propagates strictly: if EITHER side is nodata the
output pixel is nodata. Tiles present on only one side are dropped
(inner join) — the caller picks the domain by supplying aligned
covers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..png import decode_band, encode_grayscale8

_OPS = ("mean", "absdiff", "min", "max")


def raster_algebra(a: DataFrame, b: DataFrame, tile_size: int,
                   op: str = "mean", nodata: int = 0) -> DataFrame:
    """Combine two (tx, ty, png) tiled rasters pixel-wise → (tx, ty,
    png). Integer rules (u8-closed, engine-exact): mean =
    (a+b+1)//2, absdiff = |a−b|, min, max; either-side nodata ⇒
    nodata."""
    if op not in _OPS:
        raise ValueError(f"unknown op {op!r} (one of {_OPS})")
    ts = int(tile_size)
    joined = (a.select("tx", "ty", F.col("png").alias("png_a"))
              .repartition(a.sparkSession.sparkContext.defaultParallelism,
                           "tx", "ty")
              .join(b.select("tx", "ty", F.col("png").alias("png_b")),
                    ["tx", "ty"]))

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"tx": [], "ty": [], "png": []}
            for row in pdf.itertuples(index=False):
                va = decode_band(bytes(row.png_a), "png;u8")
                vb = decode_band(bytes(row.png_b), "png;u8")
                if va.shape != (ts, ts) or vb.shape != (ts, ts):
                    raise ValueError(
                        f"tile ({row.tx},{row.ty}) is {va.shape}/"
                        f"{vb.shape}, expected {(ts, ts)}")
                ia, ib = va.astype(np.int64), vb.astype(np.int64)
                if op == "mean":
                    c = (ia + ib + 1) // 2
                elif op == "absdiff":
                    c = np.abs(ia - ib)
                elif op == "min":
                    c = np.minimum(ia, ib)
                else:
                    c = np.maximum(ia, ib)
                c = np.where((va == nodata) | (vb == nodata), nodata, c)
                out["tx"].append(int(row.tx))
                out["ty"].append(int(row.ty))
                out["png"].append(encode_grayscale8(
                    c.astype(np.uint8), nodata))
            yield pd.DataFrame(out)

    return joined.mapInPandas(combine, "tx long, ty long, png binary")


def raster_algebra_stats(a: DataFrame, b: DataFrame, tile_size: int,
                         op: str = "mean", nodata: int = 0) -> DataFrame:
    """Per-tile integer stats of the combined raster — the value-gate
    reduction: (tx, ty, n_valid, vsum, vmax) over non-nodata output
    pixels (tiles whose combine is all-nodata drop, mirroring the
    halo stats contract)."""
    combined = raster_algebra(a, b, tile_size, op=op, nodata=nodata)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"tx": [], "ty": [], "n_valid": [], "vsum": [],
                   "vmax": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.png), "png;u8")
                vals = band[band != nodata].astype(np.int64)
                if not vals.size:
                    continue
                out["tx"].append(int(row.tx))
                out["ty"].append(int(row.ty))
                out["n_valid"].append(int(vals.size))
                out["vsum"].append(int(vals.sum()))
                out["vmax"].append(int(vals.max()))
            yield pd.DataFrame(out)

    return combined.mapInPandas(
        stats, "tx long, ty long, n_valid long, vsum long, vmax long")
