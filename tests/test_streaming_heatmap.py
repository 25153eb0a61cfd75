"""Streaming incremental heatmap (streaming/heatmap_stream.py): the
maintained pixel store must equal the batch binning of every point
seen, across micro-batches, restarts, and appends; replayed batches
are no-ops."""

import json
import os

import numpy as np
from pyspark.sql import functions as F

from rastertiler_rs_spark.operators.heatmap import _binned
from rastertiler_rs_spark.streaming.heatmap_stream import (
    read_heatmap_store, stream_heatmap)
from rastertiler_rs_spark.tilemath import CE, ORIGIN

Z, TS = 4, 32
N_PX = (1 << Z) * TS


def points_df(spark, lo, hi):
    step = CE / N_PX
    i = F.col("id")
    gx = (i * 37 + 11) % (N_PX + 6) - 3          # some clamp both sides
    gy = (i * 53 + 7) % N_PX
    return spark.range(lo, hi).select(
        (F.lit(-ORIGIN) + (gx.cast("double") + F.lit(0.5))
         * F.lit(step)).alias("px"),
        (F.lit(ORIGIN) - (gy.cast("double") + F.lit(0.5))
         * F.lit(step)).alias("py"),
        (F.lit(1) + i % 5).cast("long").alias("w"))


def batch_truth(spark, lo, hi):
    pts = points_df(spark, lo, hi)
    cnt = _binned(pts.select("px", "py", F.lit(1).alias("one")),
                  Z, TS, "one").withColumnRenamed("cnt", "n")
    wsum = _binned(pts, Z, TS, "w").withColumnRenamed("cnt", "v")
    return {(r.gx, r.gy): (r.n, r.v)
            for r in cnt.join(wsum, ["gx", "gy"]).collect()}


def store_map(spark, state):
    return {(r.gx, r.gy): (r.cnt, r.wsum)
            for r in read_heatmap_store(spark, state).collect()}


def drain(spark, inp, state):
    q = stream_heatmap(spark, inp, state, Z, TS, weight="w")
    assert q.awaitTermination(180), "stream did not drain"


def test_incremental_equals_batch_and_restart(spark, tmp_path):
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    os.makedirs(inp)
    for k in range(3):
        points_df(spark, k * 400, (k + 1) * 400).coalesce(1) \
            .write.mode("append").parquet(inp)
    drain(spark, inp, state)
    want = batch_truth(spark, 0, 1200)
    assert store_map(spark, state) == want
    cur0 = json.load(open(os.path.join(state, "CURRENT")))
    # re-drain with the same checkpoint: nothing new, store unchanged
    drain(spark, inp, state)
    assert store_map(spark, state) == want
    assert json.load(open(os.path.join(state, "CURRENT"))) == cur0
    # append a fourth file and drain: equals batch of all points
    points_df(spark, 1200, 1700).coalesce(1).write.mode("append") \
        .parquet(inp)
    drain(spark, inp, state)
    assert store_map(spark, state) == batch_truth(spark, 0, 1700)
    # exactly one live version directory remains (superseded pruned)
    vers = [n for n in os.listdir(state) if n.startswith("v")]
    assert len(vers) == 1


def test_untouched_buckets_survive_by_link(spark, tmp_path):
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    os.makedirs(inp)
    # batch 1 fills many buckets; batch 2 touches only bucket of gx=0
    points_df(spark, 0, 500).coalesce(1).write.mode("append").parquet(inp)
    drain(spark, inp, state)
    step = CE / N_PX
    one = spark.createDataFrame(
        [(-ORIGIN + 0.5 * step, ORIGIN - 0.5 * step, 7)],
        "px double, py double, w long")
    one.coalesce(1).write.mode("append").parquet(inp)
    before = store_map(spark, state)
    drain(spark, inp, state)
    after = store_map(spark, state)
    n0, v0 = before.get((0, 0), (0, 0))
    assert after[(0, 0)] == (n0 + 1, v0 + 7)
    assert {k: v for k, v in after.items() if k != (0, 0)} == \
        {k: v for k, v in before.items() if k != (0, 0)}


def test_empty_first_batch(spark, tmp_path):
    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    os.makedirs(inp)
    spark.createDataFrame([], "px double, py double, w long") \
        .coalesce(1).write.mode("append").parquet(inp)
    drain(spark, inp, state)
    assert store_map(spark, state) == {}
    points_df(spark, 0, 100).coalesce(1).write.mode("append").parquet(inp)
    drain(spark, inp, state)
    assert store_map(spark, state) == batch_truth(spark, 0, 100)
