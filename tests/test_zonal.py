"""Zonal statistics: operator vs direct numpy recompute (holes,
pixel-center edge rule, empty zones, multi-image zones)."""

import numpy as np
import pytest

import rastertiler_rs_spark.tilemath as tm
from rastertiler_rs_spark.fixtures import (NODATA, footprint_from_index,
                                           images_parquet, pixel_band,
                                           _H_CYCLE, _W_CYCLE)
from rastertiler_rs_spark.operators.zonal import zonal_stats


def _expected(zones, n_images):
    out = {}
    for zid, zxmin, zymin, zxmax, zymax in zones:
        agg = []
        for i in range(n_images):
            minx, miny, maxx, maxy = (v.item() for v in
                                      footprint_from_index(np.array([i])))
            w, h = int(_W_CYCLE[i % 4]), int(_H_CYCLE[i % 4])
            band = pixel_band(i, w, h, "u8")
            psx = (maxx - minx) / w
            psy = (maxy - miny) / h
            xc = minx + (np.arange(w) + 0.5) * psx
            yc = maxy - (np.arange(h) + 0.5) * psy
            sub = band[np.ix_((yc >= zymin) & (yc < zymax),
                              (xc >= zxmin) & (xc < zxmax))]
            vals = sub[sub != NODATA].astype(np.int64)
            if vals.size:
                agg.append((vals.size, int(vals.sum()),
                            int(vals.min()), int(vals.max())))
        if agg:
            out[zid] = (len(agg), sum(a[0] for a in agg),
                        sum(a[1] for a in agg),
                        min(a[2] for a in agg), max(a[3] for a in agg))
    return out


def test_zonal_stats_matches_numpy(spark):
    n = 32
    images = spark.read.parquet(images_parquet(n, "u8"))
    # zones centered on a few image footprints (guaranteed overlap,
    # including partial windows), plus one over empty ocean
    zones = []
    for i in (0, 3, 7, 11):
        minx, miny, maxx, maxy = (v.item() for v in
                                  footprint_from_index(np.array([i])))
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        zones.append((i, minx - 1000.0, miny - 1000.0, cx, cy))
    zones.append((99, 0.0, 0.0, 10.0, 10.0))          # empty zone
    zdf = spark.createDataFrame(
        zones, "zone_id long, minx double, miny double, "
               "maxx double, maxy double")
    got = {r["zone_id"]: (r["n_images"], r["n_px"], r["vsum"],
                          r["vmin"], r["vmax"])
           for r in zonal_stats(zdf, images, cell_size=tm.CE / 256).collect()}
    want = _expected(zones, n)
    assert got == want
    assert 99 not in got and len(got) >= 3


def test_zonal_stats_poly_matches_numpy(spark):
    """Pentagon zone over a known image: operator == direct numpy
    ray-cast recompute (shared ray_cast ⇒ parity by construction,
    this pins the plumbing: join, decode, broadcast rings, agg)."""
    from rastertiler_rs_spark.operators.pip import ray_cast
    from rastertiler_rs_spark.operators.zonal import zonal_stats_poly

    n = 16
    images = spark.read.parquet(images_parquet(n, "u8"))
    polys, want = [], {}
    for i in (1, 5):
        minx, miny, maxx, maxy = (v.item() for v in
                                  footprint_from_index(np.array([i])))
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        ring = [(minx - 500.0, cy), (cx, miny - 750.0),
                (maxx + 250.0, cy + 123.0), (cx + 77.0, maxy + 400.0),
                (minx + 33.0, maxy - 111.0)]
        polys.append((i, ring))
        w, h = int(_W_CYCLE[i % 4]), int(_H_CYCLE[i % 4])
        band = pixel_band(i, w, h, "u8")
        psx, psy = (maxx - minx) / w, (maxy - miny) / h
        xc = minx + (np.arange(w) + 0.5) * psx
        yc = maxy - (np.arange(h) + 0.5) * psy
        gx = np.broadcast_to(xc, (h, w)).ravel()
        gy = np.broadcast_to(yc[:, None], (h, w)).ravel()
        xs = np.array([p[0] for p in ring])
        ys = np.array([p[1] for p in ring])
        inside = ray_cast(gx, gy, xs, ys).reshape(h, w)
        vals = band[inside & (band != NODATA)].astype(np.int64)
        if vals.size:
            want[i] = (1, vals.size, int(vals.sum()),
                       int(vals.min()), int(vals.max()))
    got = {r["zone_id"]: (r["n_images"], r["n_px"], r["vsum"],
                          r["vmin"], r["vmax"])
           for r in zonal_stats_poly(polys, images,
                                     cell_size=tm.CE / 256).collect()}
    assert got == want and len(want) >= 1


def test_raster_gradient_matches_numpy(spark):
    from rastertiler_rs_spark.operators.zonal import raster_gradient_stats

    n = 12
    images = spark.read.parquet(images_parquet(n, "u8"))
    got = {r["image_id"]: (r["n_valid"], r["sum_g2"], r["max_g2"])
           for r in raster_gradient_stats(images).collect()}
    checked = 0
    for i in range(n):
        w, h = int(_W_CYCLE[i % 4]), int(_H_CYCLE[i % 4])
        band = pixel_band(i, w, h, "u8").astype(np.int64)
        c = band[1:-1, 1:-1]
        gx = band[1:-1, 2:] - band[1:-1, :-2]
        gy = band[2:, 1:-1] - band[:-2, 1:-1]
        valid = ((c != NODATA) & (band[1:-1, 2:] != NODATA)
                 & (band[1:-1, :-2] != NODATA) & (band[2:, 1:-1] != NODATA)
                 & (band[:-2, 1:-1] != NODATA))
        key = f"img{i:08d}"
        if not valid.any():
            assert key not in got
            continue
        g2 = (gx * gx + gy * gy)[valid]
        assert got[key] == (int(valid.sum()), int(g2.sum()), int(g2.max()))
        checked += 1
    assert checked >= 8


def test_zonal_quantiles_matches_numpy(spark):
    """Counting-sort quantiles == np.sort + explicit lower-quantile
    ranks over the pooled per-zone pixel values (cross-image pooling
    on the hook), including the distinct-value count."""
    from rastertiler_rs_spark.operators.zonal import zonal_quantiles

    n = 32
    images = spark.read.parquet(images_parquet(n, "u8"))
    zones = []
    for i in (0, 3, 7, 11):
        minx, miny, maxx, maxy = (v.item() for v in
                                  footprint_from_index(np.array([i])))
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        zones.append((i, minx - 1000.0, miny - 1000.0, cx, cy))
    zones.append((99, 0.0, 0.0, 10.0, 10.0))
    zdf = spark.createDataFrame(
        zones, "zone_id long, minx double, miny double, "
               "maxx double, maxy double")
    want = {}
    for zid, zxmin, zymin, zxmax, zymax in zones:
        pool = []
        for i in range(n):
            minx, miny, maxx, maxy = (v.item() for v in
                                      footprint_from_index(np.array([i])))
            w, h = int(_W_CYCLE[i % 4]), int(_H_CYCLE[i % 4])
            band = pixel_band(i, w, h, "u8")
            psx = (maxx - minx) / w
            psy = (maxy - miny) / h
            xc = minx + (np.arange(w) + 0.5) * psx
            yc = maxy - (np.arange(h) + 0.5) * psy
            sub = band[np.ix_((yc >= zymin) & (yc < zymax),
                              (xc >= zxmin) & (xc < zxmax))]
            pool.extend(sub[sub != NODATA].astype(np.int64).tolist())
        if not pool:
            continue
        pool.sort()
        m = len(pool)

        def rank(p, q):
            return pool[(m * p + q - 1) // q - 1]   # 1-based ceil(m·p/q)

        want[zid] = (len(set(pool)), m, rank(1, 4), rank(1, 2),
                     rank(3, 4))
    got = {r["zone_id"]: (r["n_vals"], r["n_px"], r["p25"],
                          r["median"], r["p75"])
           for r in zonal_quantiles(zdf, images,
                                    cell_size=tm.CE / 256).collect()}
    assert got == want
    assert 99 not in got
