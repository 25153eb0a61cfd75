"""Watershed delineation: the pointer-doubled distributed labels must
equal the scalar follow-the-successor walk over the unpartitioned
canvas — successors crossing tile borders ride the halo exchange, so
any routing bug flips border basins."""

import numpy as np

from rastertiler_rs_spark.fixtures import (NODATA, canvas_band,
                                           tiled_canvas_parquet)
from rastertiler_rs_spark.operators.halo import _D8_OFFSETS, d8_direction
from rastertiler_rs_spark.operators.watershed import (pixel_successors,
                                                      watershed_labels,
                                                      watershed_stats)


def _brute_successors(band):
    h, w = band.shape
    pad = np.full((h + 2, w + 2), NODATA, dtype=np.int64)
    pad[1:-1, 1:-1] = band
    c = pad[1:-1, 1:-1]
    valid = c != NODATA
    drops = []
    for dr, dc, _ in _D8_OFFSETS:
        nb = pad[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
        drops.append(np.where(nb == NODATA, np.int64(-1), c - nb))
    dirs = d8_direction(drops)
    succ = {}
    for r in range(h):
        for cc in range(w):
            if not valid[r, cc]:
                continue
            gid = r * w + cc
            d = dirs[r, cc]
            if d < 0:
                succ[gid] = gid
            else:
                dr, dc, _ = _D8_OFFSETS[d]
                succ[gid] = (r + dr) * w + (cc + dc)
    return succ


def test_watershed_matches_scalar_walk(spark):
    ts = 64
    band = canvas_band(256, 192, seed=5).astype(np.int64)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    succ = _brute_successors(band)
    got_succ = {r["v"]: r["p"]
                for r in pixel_successors(tiles, ts).collect()}
    assert got_succ == succ
    want = {}
    for v in succ:
        p = v
        while succ[p] != p:
            p = succ[p]
        want[v] = p
    got = {r["v"]: r["pit"]
           for r in watershed_labels(tiles, ts).collect()}
    assert got == want
    # strictly-downhill invariant: elevation decreases along succ,
    # every label is a pit (self-loop)
    h, w = band.shape
    for v, p in list(succ.items())[::997]:
        if v != p:
            assert band[v // w, v % w] > band[p // w, p % w]
    for pit in set(want.values()):
        assert succ[pit] == pit
    st = {(r["tx"], r["ty"]): (r["n_valid"], r["sum_g2"], r["max_g2"])
          for r in watershed_stats(tiles, ts).collect()}
    agg = {}
    for v, p in want.items():
        key = ((v % w) // ts, (v // w) // ts)
        n, s, pits = agg.get(key, (0, 0, set()))
        pits.add(p)
        agg[key] = (n + 1, s + p, pits)
    assert st == {k: (n, s, len(p)) for k, (n, s, p) in agg.items()}


def test_basin_sizes(spark):
    from rastertiler_rs_spark.operators.watershed import basin_sizes

    ts = 64
    band = canvas_band(256, 192, seed=5).astype(np.int64)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    succ = _brute_successors(band)
    want = {}
    for v in succ:
        p = v
        while succ[p] != p:
            p = succ[p]
        want[p] = want.get(p, 0) + 1
    got = {r["pit"]: r["n_px"] for r in basin_sizes(tiles, ts).collect()}
    assert got == want
    assert sum(got.values()) == len(succ)


def test_flow_accumulation_matches_walk_count(spark):
    """acc(v) == 1 + number of upstream pixels whose chain passes v
    (scalar walk counting); Σacc == Σ path lengths + n; max acc at a
    pit equals that pit's basin contribution along its deepest
    inflow... verified exactly."""
    from rastertiler_rs_spark.operators.watershed import (
        flow_accumulation, flow_accumulation_stats)

    ts = 64
    band = canvas_band(256, 192, seed=5).astype(np.int64)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    succ = _brute_successors(band)
    want = {v: 1 for v in succ}
    for v in succ:
        p = v
        while succ[p] != p:
            p = succ[p]
            want[p] += 1
    got = {r["v"]: r["acc"] for r in flow_accumulation(tiles, ts).collect()}
    assert got == want
    h, w = band.shape
    stats = {(r["tx"], r["ty"]): (r["n_valid"], r["sum_g2"], r["max_g2"])
             for r in flow_accumulation_stats(tiles, ts).collect()}
    agg = {}
    for v, a in want.items():
        key = ((v % w) // ts, (v // w) // ts)
        n, s, m = agg.get(key, (0, 0, 0))
        agg[key] = (n + 1, s + a, max(m, a))
    assert stats == agg


def test_flow_accumulation_doubling_path_matches(spark):
    """iterate_rounds=0 forces the r6 Euler-tour/list-ranking path —
    must equal the iterative result (and the scalar walk count)."""
    from rastertiler_rs_spark.operators.watershed import flow_accumulation

    ts = 64
    band = canvas_band(256, 192, seed=5).astype(np.int64)
    tiles = spark.read.parquet(tiled_canvas_parquet(256, 192, ts, seed=5))
    succ = _brute_successors(band)
    want = {v: 1 for v in succ}
    for v in succ:
        p = v
        while succ[p] != p:
            p = succ[p]
            want[p] += 1
    got = {r["v"]: r["acc"]
           for r in flow_accumulation(tiles, ts,
                                      iterate_rounds=0).collect()}
    assert got == want
