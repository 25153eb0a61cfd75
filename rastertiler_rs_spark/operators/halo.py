"""Tiled stencil with HALO EXCHANGE — neighborhood ops across tile
boundaries, the distributed form of raster_gradient_stats.

A stencil at a tile-border pixel needs pixels the neighboring tile
owns. The distributed idiom: every tile emits its four 1-pixel edge
strips keyed to the neighbor that needs them (a shuffle of thin
strips — ~4·ts pixels per tile, trivially small next to the tile
itself), then one groupBy(tile) assembles a (ts+2)² padded canvas
(own pixels + received halos, absent neighbors padded with nodata)
and the stencil runs task-local over the tile's OWN pixels. Exactly
one shuffle, keyed by the owning tile; strips and tiles ride it
together via a unified row shape.

Correctness contract: summed per tile, the result equals the stencil
over the UNPARTITIONED canvas restricted to each tile's pixels — the
oracle entry checks that identity against a DuckDB twin that never
sees tiles at all (any halo routing/orientation bug flips the border
sums).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..png import decode_band


def tile_halo_gradient(tiles: DataFrame, tile_size: int,
                       nodata: int = 0) -> DataFrame:
    """tiles (tx, ty, png of a ts×ts band) -> per-tile integer stats
    of the central-difference gradient magnitude gx² + gy², where
    border pixels use HALOS exchanged from the 4-neighbor tiles.

    A pixel contributes iff its center and all four neighbors are
    valid (non-nodata); pixels on the global canvas boundary (no
    neighbor tile) are excluded by the nodata padding. Output:
    (tx, ty, n_valid, sum_g2, max_g2)."""
    ts = int(tile_size)

    def explode_strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # unified rows: kind 'C' = the tile itself (png payload);
        # 'N'/'S'/'E'/'W' = the strip arriving at (tx, ty) FROM that
        # side, raw ts bytes of the neighbor's facing edge
        for pdf in batches:
            out = {"tx": [], "ty": [], "kind": [], "payload": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.png), "png;u8")
                if band.shape != (ts, ts):
                    raise ValueError(
                        f"tile ({row.tx},{row.ty}) is {band.shape}, "
                        f"expected {(ts, ts)}")
                out["tx"].append(row.tx)
                out["ty"].append(row.ty)
                out["kind"].append("C")
                out["payload"].append(bytes(row.png))
                # 'kind' names the side of the RECEIVER the strip
                # attaches to: my top edge pads the SOUTH side of the
                # tile above me, my left column the EAST side of the
                # tile to my left, etc.
                for dtx, dty, kind, strip in (
                        (0, -1, "S", band[0, :]),      # to tile above
                        (0, +1, "N", band[ts - 1, :]),  # to tile below
                        (-1, 0, "E", band[:, 0]),      # to tile left
                        (+1, 0, "W", band[:, ts - 1]),  # to tile right
                ):
                    out["tx"].append(int(row.tx) + dtx)
                    out["ty"].append(int(row.ty) + dty)
                    out["kind"].append(kind)
                    out["payload"].append(strip.tobytes())
            yield pd.DataFrame(out)

    unified = tiles.select("tx", "ty", "png").mapInPandas(
        explode_strips, "tx long, ty long, kind string, payload binary")

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        center = pdf[pdf["kind"] == "C"]
        if center.empty:
            # strips addressed to a tile that does not exist (canvas
            # boundary) — nothing to compute
            return pd.DataFrame({"tx": [], "ty": [], "n_valid": [],
                                 "sum_g2": [], "max_g2": []}).astype(
                {"tx": "int64", "ty": "int64", "n_valid": "int64",
                 "sum_g2": "int64", "max_g2": "int64"})
        band = decode_band(bytes(center.iloc[0]["payload"]), "png;u8")
        ts_ = band.shape[0]
        pad = np.full((ts_ + 2, ts_ + 2), nodata, dtype=np.int64)
        pad[1:-1, 1:-1] = band
        for _, row in pdf[pdf["kind"] != "C"].iterrows():
            strip = np.frombuffer(bytes(row["payload"]), dtype=band.dtype)
            if row["kind"] == "N":
                pad[0, 1:-1] = strip
            elif row["kind"] == "S":
                pad[ts_ + 1, 1:-1] = strip
            elif row["kind"] == "W":
                pad[1:-1, 0] = strip
            elif row["kind"] == "E":
                pad[1:-1, ts_ + 1] = strip
        c = pad[1:-1, 1:-1]
        gx = pad[1:-1, 2:] - pad[1:-1, :-2]
        gy = pad[2:, 1:-1] - pad[:-2, 1:-1]
        valid = ((c != nodata)
                 & (pad[1:-1, 2:] != nodata) & (pad[1:-1, :-2] != nodata)
                 & (pad[2:, 1:-1] != nodata) & (pad[:-2, 1:-1] != nodata))
        if not valid.any():
            return pd.DataFrame({"tx": [], "ty": [], "n_valid": [],
                                 "sum_g2": [], "max_g2": []}).astype(
                {"tx": "int64", "ty": "int64", "n_valid": "int64",
                 "sum_g2": "int64", "max_g2": "int64"})
        g2 = (gx * gx + gy * gy)[valid]
        return pd.DataFrame({"tx": [tx], "ty": [ty],
                             "n_valid": [int(valid.sum())],
                             "sum_g2": [int(g2.sum())],
                             "max_g2": [int(g2.max())]})

    return (unified.groupBy("tx", "ty").applyInPandas(
        assemble, "tx long, ty long, n_valid long, sum_g2 long, "
                  "max_g2 long"))
