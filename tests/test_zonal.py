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
