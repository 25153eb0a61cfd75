"""kNN cell-ring join: exactness on adversarially sparse data (kth
distance spanning many cells) and the bounded phase-2 ring contract.
The dense/contract path is oracle-checked each round (check_oracle knn)."""

import pytest
from pyspark.sql import Window, functions as F

from rastertiler_rs_spark.operators.knn import knn_join


def _sparse(spark):
    # points spread so the 3rd neighbor is tens of cells away at
    # cell_size=1.0 — phase 1 must keep doubling and phase 2 must widen
    # far past r=1 without a quadratic explode-to-death
    pts = [(i, float(i * 17 % 230) * 3.0, float(i * 29 % 210) * 3.0)
           for i in range(40)]
    qs = [(j, float(j * 37 % 200) * 3.0 + 0.5, float(j * 53 % 190) * 3.0 + 0.5)
          for j in range(5)]
    points = spark.createDataFrame(pts, "pid long, px double, py double")
    queries = spark.createDataFrame(qs, "qid long, qx double, qy double")
    return points, queries


def _brute(points, queries, k):
    d2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
    w = Window.partitionBy("qid").orderBy("d2", "pid")
    return (points.crossJoin(queries).withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("qid", "pid", "rank"))


def test_knn_sparse_exact_with_bounded_ring(spark):
    points, queries = _sparse(spark)
    got = {(r["qid"], r["rank"]): r["pid"] for r in
           knn_join(points, queries, k=3, cell_size=1.0,
                    max_final_r=200).collect()}
    want = {(r["qid"], r["rank"]): r["pid"] for r in
            _brute(points, queries, 3).collect()}
    assert got == want


def test_knn_ring_cap_raises_instead_of_exploding(spark):
    points, queries = _sparse(spark)
    with pytest.raises(ValueError, match="max_final_r"):
        knn_join(points, queries, k=3, cell_size=1.0, max_final_r=2)
