"""Two-raster map algebra (operators/algebra.py): tile-join combine
must equal the unpartitioned numpy rule for every op, with strict
nodata propagation and inner-join tile domain."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.algebra import (raster_algebra,
                                                    raster_algebra_stats)
from rastertiler_rs_spark.png import decode_band, encode_grayscale8


def tiles_df(spark, band, ts, drop=()):
    h, w = band.shape
    rows = []
    for ty in range(h // ts):
        for tx in range(w // ts):
            if (tx, ty) in drop:
                continue
            rows.append((tx, ty, bytearray(encode_grayscale8(
                band[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts], 0))))
    return spark.createDataFrame(rows, "tx long, ty long, png binary")


def numpy_combine(a, b, op):
    ia, ib = a.astype(np.int64), b.astype(np.int64)
    c = {"mean": (ia + ib + 1) // 2, "absdiff": np.abs(ia - ib),
         "min": np.minimum(ia, ib), "max": np.maximum(ia, ib)}[op]
    return np.where((a == 0) | (b == 0), 0, c).astype(np.uint8)


@pytest.mark.parametrize("op", ["mean", "absdiff", "min", "max"])
def test_ops_match_numpy(spark, op):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    got = raster_algebra(tiles_df(spark, a, 32),
                         tiles_df(spark, b, 32), 32, op=op).collect()
    want = numpy_combine(a, b, op)
    assert len(got) == 6
    for r in got:
        tile = decode_band(bytes(r.png), "png;u8")
        assert np.array_equal(
            tile, want[r.ty * 32:(r.ty + 1) * 32,
                       r.tx * 32:(r.tx + 1) * 32]), (r.tx, r.ty, op)


def test_inner_join_domain_and_stats(spark):
    rng = np.random.default_rng(8)
    a = rng.integers(1, 256, (64, 64)).astype(np.uint8)
    b = rng.integers(1, 256, (64, 64)).astype(np.uint8)
    # tile (1, 0) missing on the b side → dropped from the result
    out = raster_algebra_stats(tiles_df(spark, a, 32),
                               tiles_df(spark, b, 32, drop={(1, 0)}),
                               32).collect()
    keys = {(r.tx, r.ty) for r in out}
    assert keys == {(0, 0), (0, 1), (1, 1)}
    want = numpy_combine(a, b, "mean")
    for r in out:
        w = want[r.ty * 32:(r.ty + 1) * 32, r.tx * 32:(r.tx + 1) * 32]
        vals = w[w != 0].astype(np.int64)
        assert (r.n_valid, r.vsum, r.vmax) == \
            (vals.size, int(vals.sum()), int(vals.max()))


def test_validation(spark):
    a = tiles_df(spark, np.ones((32, 32), np.uint8), 32)
    with pytest.raises(ValueError, match="unknown op"):
        raster_algebra(a, a, 32, op="xor")
    bad = tiles_df(spark, np.ones((16, 16), np.uint8), 16)
    with pytest.raises(Exception, match="expected"):
        raster_algebra(a, bad, 32).collect()


def test_stack_median_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    epochs = [rng.integers(0, 256, (64, 64)).astype(np.uint8)
              for _ in range(4)]          # even count → lower median
    from pyspark.sql import functions as F

    dfs = [tiles_df(spark, e, 32).withColumn("epoch", F.lit(i))
           for i, e in enumerate(epochs)]
    stack = dfs[0]
    for d in dfs[1:]:
        stack = stack.unionByName(d)
    from rastertiler_rs_spark.operators.algebra import raster_stack_median

    got = raster_stack_median(stack, 32).collect()
    cube = np.stack(epochs).astype(np.int64)
    want = np.zeros((64, 64), np.uint8)
    for r in range(64):
        for c in range(64):
            vals = sorted(v for v in cube[:, r, c] if v != 0)
            want[r, c] = vals[(len(vals) - 1) // 2] if vals else 0
    assert len(got) == 4
    for row in got:
        tile = decode_band(bytes(row.png), "png;u8")
        assert np.array_equal(
            tile, want[row.ty * 32:(row.ty + 1) * 32,
                       row.tx * 32:(row.tx + 1) * 32]), (row.tx, row.ty)


def test_equalize_lut_bruteforce():
    """LUT vs an independent per-value loop over random histograms:
    monotone on present values, range [1, 255], exact integer rule."""
    from rastertiler_rs_spark.operators.algebra import equalize_lut

    rng = np.random.default_rng(11)
    for _ in range(20):
        counts = np.zeros(256, dtype=np.int64)
        vs = rng.choice(np.arange(1, 256), size=rng.integers(1, 40),
                        replace=False)
        counts[vs] = rng.integers(1, 1000, size=vs.size)
        lut = equalize_lut(counts)
        n = int(counts.sum())
        run = 0
        cdfmin = None
        for v in range(256):
            run += int(counts[v])
            if counts[v] and cdfmin is None:
                cdfmin = run
        denom = max(n - cdfmin, 1)
        run = 0
        for v in range(256):
            run += int(counts[v])
            if v == 0 or not counts[v]:
                assert lut[v] == 0
            else:
                want = 1 + ((run - cdfmin) * 254) // denom
                assert lut[v] == want and 1 <= want <= 255
        pres = lut[counts > 0]
        assert (np.diff(pres) >= 0).all()


def test_equalize_tiles_global(spark):
    """Spark equalize == driver-side LUT applied to the raw canvas;
    nodata pixels stay nodata; the equalized histogram is flatter
    (max bin count does not grow)."""
    from rastertiler_rs_spark.fixtures import (NODATA, canvas_band,
                                               tiled_canvas_parquet)
    from rastertiler_rs_spark.operators.algebra import (equalize_lut,
                                                        equalize_tiles)

    ts = 64
    band = canvas_band(256, 192, seed=5)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    counts = np.bincount(band.ravel(), minlength=256).astype(np.int64)
    counts[NODATA] = 0
    lut = equalize_lut(counts)
    got = {(r["tx"], r["ty"]): decode_band(bytes(r["png"]), "png;u8")
           for r in equalize_tiles(tiles, ts).collect()}
    for (tx, ty), eq in got.items():
        raw = band[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
        want = lut[raw].astype(np.uint8)
        want[raw == NODATA] = NODATA
        np.testing.assert_array_equal(eq, want)
    all_eq = np.concatenate([v.ravel() for v in got.values()])
    valid = all_eq[all_eq != NODATA]
    raw_valid = band[band != NODATA]
    assert valid.size == raw_valid.size
    # cdf stretch pins the endpoints: the rarest present value maps
    # to 1, the largest to 255 (when more than one value is present)
    assert valid.min() == 1 and valid.max() == 255


def test_color_relief_bruteforce(spark):
    """Relief vs a scalar per-pixel loop (independent construction:
    fractions, then floor), including stop-exactness, clamps, nodata;
    Spark tiles equal the global ramp of the raw canvas."""
    from fractions import Fraction

    from rastertiler_rs_spark.fixtures import (NODATA, canvas_band,
                                               tiled_canvas_parquet)
    from rastertiler_rs_spark.operators.algebra import (
        DEFAULT_RELIEF_RAMP, color_relief_tiles, relief_rgb)

    ramp = DEFAULT_RELIEF_RAMP
    vs = [s[0] for s in ramp]

    def scalar(v):
        if v == NODATA:
            return (0, 0, 0)
        x = min(max(v, vs[0]), vs[-1])
        i = max(j for j in range(len(vs)) if vs[j] <= x or j == 0)
        i = min(i, len(vs) - 2)
        out = []
        for ch in range(3):
            c0, c1 = ramp[i][1 + ch], ramp[i + 1][1 + ch]
            t = Fraction(c0 * (vs[i + 1] - x) + c1 * (x - vs[i]),
                         vs[i + 1] - vs[i])
            out.append(int(t.numerator // t.denominator))
        return tuple(out)

    band = np.arange(256, dtype=np.uint8).reshape(16, 16)
    got = relief_rgb(band)
    for v in range(256):
        assert tuple(got[v // 16, v % 16]) == scalar(v), v

    ts = 64
    canvas = canvas_band(256, 192, seed=5)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    want = relief_rgb(canvas)
    rows = color_relief_tiles(tiles, ts).collect()
    from rastertiler_rs_spark.png import decode_png
    for r in rows:
        px = decode_png(bytes(r["png"]))["pixels"]
        sub = want[r["ty"] * ts:(r["ty"] + 1) * ts,
                   r["tx"] * ts:(r["tx"] + 1) * ts]
        np.testing.assert_array_equal(px, sub)
