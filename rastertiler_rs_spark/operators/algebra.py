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


def raster_stack_median(stack: DataFrame, tile_size: int,
                        nodata: int = 0) -> DataFrame:
    """Temporal MEDIAN composite of a co-registered raster stack —
    the cloud-free-mosaic primitive: given (tx, ty, epoch, png) with
    one raster per epoch, emit per-tile PNGs where each pixel is the
    LOWER MEDIAN of that pixel's valid (non-nodata) values across
    epochs (even count → lower of the middle pair; all-nodata →
    nodata). Integer-exact and order-free, so the DuckDB twin can
    restate it scalar-wise (for 3 epochs: median = a+b+c−max−min on
    full pixels, min on pairs, identity on singletons).

    Plan: ONE groupBy on the tile key (epochs of a tile co-locate —
    at scale the stack is written partitioned by tile, making this a
    co-located agg), one python stage sorts the (T, ts, ts) cube
    along the epoch axis with nodata as +∞ sentinel and gathers index
    (cnt−1)//2 per pixel. Tile bytes cross one exchange."""
    ts = int(tile_size)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        bands = np.stack([decode_band(bytes(p), "png;u8")
                          for p in pdf["png"]]).astype(np.int64)
        if bands.shape[1:] != (ts, ts):
            raise ValueError(
                f"tile ({tx},{ty}) is {bands.shape[1:]}, "
                f"expected {(ts, ts)}")
        valid = bands != nodata
        cnt = valid.sum(axis=0)
        sent = np.where(valid, bands, np.int64(1 << 40))
        sent.sort(axis=0)
        idx = np.maximum(cnt - 1, 0) // 2
        med = np.take_along_axis(sent, idx[None, :, :], axis=0)[0]
        med = np.where(cnt == 0, nodata, med).astype(np.uint8)
        return pd.DataFrame({"tx": [tx], "ty": [ty],
                             "png": [encode_grayscale8(med, nodata)]})

    return (stack.select("tx", "ty", "png")
            .groupBy("tx", "ty")
            .applyInPandas(fn, "tx long, ty long, png binary"))


def tile_stats(tiles: DataFrame, nodata: int = 0) -> DataFrame:
    """Value-gate reduction for any (tx, ty, png) table: per-tile
    (n_valid, vsum, vmax) over non-nodata pixels; all-nodata tiles
    drop (the halo stats contract)."""

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

    return tiles.mapInPandas(
        stats, "tx long, ty long, n_valid long, vsum long, vmax long")


def raster_algebra_stats(a: DataFrame, b: DataFrame, tile_size: int,
                         op: str = "mean", nodata: int = 0) -> DataFrame:
    """Per-tile integer stats of the combined raster (tile_stats of
    raster_algebra)."""
    return tile_stats(raster_algebra(a, b, tile_size, op=op,
                                     nodata=nodata), nodata)


def equalize_lut(counts: np.ndarray) -> np.ndarray:
    """The integer histogram-equalization LUT over valid values
    1..255 (0 = nodata, never remapped): with cdf(v) the running
    count and cdfmin the smallest nonzero cdf,

        eq(v) = 1 + ((cdf(v) − cdfmin) · 254) // max(n − cdfmin, 1)

    — the classic cdf stretch shifted into [1, 255] so equalized
    valid pixels can never collide with the nodata sentinel. All
    integer; numerator non-negative, so numpy floor-division and
    DuckDB's truncating `//` agree (the engine-crossing invariant)."""
    counts = counts.astype(np.int64)
    cdf = np.cumsum(counts)
    n = int(cdf[-1])
    present = counts > 0
    if not present.any():
        return np.zeros(256, dtype=np.int64)
    cdfmin = int(cdf[present][0])
    denom = max(n - cdfmin, 1)
    lut = 1 + ((cdf - cdfmin) * 254) // denom
    lut[~present] = 0          # values absent from the corpus
    lut[0] = 0                 # nodata never remaps
    return lut


def equalize_tiles(tiles: DataFrame, tile_size: int,
                   nodata: int = 0) -> DataFrame:
    """GLOBAL histogram equalization of a (tx, ty, png) tiled raster
    (the contrast-stretch class of `gdal_translate`-style ops, done
    corpus-wide): pass 1 reduces the corpus to a ≤256-row value
    histogram (map-side partial counts → one tiny groupBy — the only
    shuffle, bytes-free); the LUT is built driver-side (256 ints —
    driver-side BY DESIGN, like k-means centroids) and closes over
    pass 2, a shuffle-free remap+re-encode of each tile. At 100 TB
    the histogram agg is a scan with a 256-key combine and the remap
    is embarrassingly parallel."""
    if nodata != 0:
        raise ValueError(
            "equalize_tiles requires nodata == 0: the LUT reserves "
            "slot 0 as the sentinel and shifts output into [1, 255]")
    ts = int(tile_size)

    def hist_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros(256, dtype=np.int64)
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.png), "png;u8")
                acc += np.bincount(band.ravel(), minlength=256)
            vs = np.nonzero(acc)[0]
            yield pd.DataFrame({"v": vs.astype(np.int32),
                                "cnt": acc[vs]})

    hist = (tiles.select("png").mapInPandas(hist_fn, "v int, cnt long")
            .groupBy("v").agg(F.sum("cnt").alias("cnt")).collect())
    counts = np.zeros(256, dtype=np.int64)
    for r in hist:
        if int(r["v"]) != nodata:
            counts[int(r["v"])] = int(r["cnt"])
    lut = equalize_lut(counts)

    def remap_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"tx": [], "ty": [], "png": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.png), "png;u8")
                if band.shape != (ts, ts):
                    raise ValueError(
                        f"tile ({row.tx},{row.ty}) is {band.shape}, "
                        f"expected {(ts, ts)}")
                eq = lut[band].astype(np.uint8)
                eq[band == nodata] = nodata
                out["tx"].append(int(row.tx))
                out["ty"].append(int(row.ty))
                out["png"].append(encode_grayscale8(eq, nodata))
            yield pd.DataFrame(out)

    return tiles.select("tx", "ty", "png").mapInPandas(
        remap_fn, "tx long, ty long, png binary")


# gdaldem color-relief default ramp (value, r, g, b): deep blue-green
# lowlands → green → tan → brown → white peaks. No stop is (0,0,0) —
# that packed value is reserved for nodata.
DEFAULT_RELIEF_RAMP = ((1, 0, 60, 120), (60, 30, 140, 60),
                       (120, 220, 200, 80), (200, 150, 80, 40),
                       (255, 245, 245, 245))


def relief_rgb(band: np.ndarray, ramp=DEFAULT_RELIEF_RAMP,
               nodata: int = 0) -> np.ndarray:
    """Piecewise-linear color ramp (the `gdaldem color-relief`
    analog), exact-integer: for v in [v_i, v_{i+1}] each channel is
    the weighted average

        c = (c_i·(v_{i+1} − v) + c_{i+1}·(v − v_i)) // (v_{i+1} − v_i)

    — numerator non-negative by construction, so numpy floor division
    and DuckDB's truncating `//` agree (the lerp form c_i + Δ·t would
    put a NEGATIVE numerator under // whenever the ramp descends).
    Below the first stop clamps to its color, at/above the last to
    its; nodata pixels become (0,0,0) (encode_rgb marks that color
    transparent via tRNS)."""
    vs = np.array([s[0] for s in ramp], dtype=np.int64)
    cols = np.array([s[1:] for s in ramp], dtype=np.int64)
    v = band.astype(np.int64)
    seg = np.clip(np.searchsorted(vs, v, side="right") - 1,
                  0, len(ramp) - 2)
    v0, v1 = vs[seg], vs[seg + 1]
    w1 = np.clip(v, vs[0], vs[-1]) - v0
    w0 = v1 - np.clip(v, vs[0], vs[-1])
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    for ch in range(3):
        c0, c1 = cols[seg, ch], cols[seg + 1, ch]
        out[:, :, ch] = ((c0 * w0 + c1 * w1) // (v1 - v0)).astype(np.uint8)
    out[band == nodata] = 0
    return out


def color_relief_tiles(tiles: DataFrame, tile_size: int,
                       ramp=DEFAULT_RELIEF_RAMP,
                       nodata: int = 0) -> DataFrame:
    """(tx, ty, png u8) -> (tx, ty, png RGB) through the color ramp —
    pointwise, shuffle-free (one mapInPandas)."""
    from ..png import encode_rgb

    ts = int(tile_size)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"tx": [], "ty": [], "png": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.png), "png;u8")
                if band.shape != (ts, ts):
                    raise ValueError(
                        f"tile ({row.tx},{row.ty}) is {band.shape}, "
                        f"expected {(ts, ts)}")
                out["tx"].append(int(row.tx))
                out["ty"].append(int(row.ty))
                out["png"].append(encode_rgb(
                    relief_rgb(band, ramp, nodata), 0))
            yield pd.DataFrame(out)

    return tiles.select("tx", "ty", "png").mapInPandas(
        fn, "tx long, ty long, png binary")


def relief_stats(relief: DataFrame) -> DataFrame:
    """Value-gate reduction for RGB relief tiles: per tile n_valid
    (non-black pixels — black is the nodata color by contract),
    sum_g2 = ΣR, max_g2 = ΣG·2^23 + ΣB (channel sums ≤ 255·ts² <
    2^23 for ts ≤ 181, lossless)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"tx": [], "ty": [], "n_valid": [], "sum_g2": [],
                   "max_g2": []}
            for row in pdf.itertuples(index=False):
                packed = decode_band(bytes(row.png), "png;u32")
                ts_ = packed.shape[0]
                if 255 * ts_ * packed.shape[1] >= (1 << 23):
                    raise ValueError(
                        f"relief_stats packing overflows at tile shape "
                        f"{packed.shape} (channel sums must stay < 2^23; "
                        f"ts <= 181)")
                m = packed != 0
                if not m.any():
                    continue
                r = (packed[m] >> 16).astype(np.int64)
                g = ((packed[m] >> 8) & 0xFF).astype(np.int64)
                b = (packed[m] & 0xFF).astype(np.int64)
                out["tx"].append(int(row.tx))
                out["ty"].append(int(row.ty))
                out["n_valid"].append(int(m.sum()))
                out["sum_g2"].append(int(r.sum()))
                out["max_g2"].append((int(g.sum()) << 23) + int(b.sum()))
            yield pd.DataFrame(out)

    return relief.mapInPandas(
        stats, "tx long, ty long, n_valid long, sum_g2 long, max_g2 long")
