"""Exact distributed quantiles (operators/quantiles.py) vs the
stated rank rule computed directly in numpy."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.quantiles import exact_quantiles


def want(vals, p_bp):
    s = np.sort(np.asarray(vals))
    k = (p_bp * len(s) + 9999) // 10000
    return int(s[k - 1])


@pytest.mark.parametrize("seed,n", [(0, 1000), (1, 997), (2, 10)])
def test_matches_rank_rule(spark, seed, n):
    rng = np.random.default_rng(seed)
    vals = rng.integers(-500, 500, n).tolist()  # negatives + heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ps = [1, 2500, 5000, 9000, 9900, 10000]
    got = {r.p_bp: (r.value, r.n_total, r.k)
           for r in exact_quantiles(df, "x", ps).collect()}
    assert set(got) == set(ps)
    for p in ps:
        k = (p * n + 9999) // 10000
        assert got[p] == (want(vals, p), n, k), p


def test_all_equal_and_singleton(spark):
    df = spark.createDataFrame([(7,)] * 50, "x long")
    rows = exact_quantiles(df, "x", [5000]).collect()
    assert rows[0].value == 7 and rows[0].n_total == 50
    one = spark.createDataFrame([(42,)], "x long")
    assert exact_quantiles(one, "x", [1, 10000]).collect()[0].value == 42


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="basis points"):
        exact_quantiles(df, "x", [0])
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles(spark.createDataFrame([], "x long"), "x", [5000])
