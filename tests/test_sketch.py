"""frequent_items (distributed Misra-Gries + exact verify) vs brute
force, including the adversarial shape the sketch must survive: a key
below every LOCAL prune threshold that is still globally frequent."""

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from rastertiler_rs_spark.operators.sketch import frequent_items, mg_merge


def _brute(vals, k):
    n = len(vals)
    c = Counter(v for v in vals if v is not None)
    return {key: (cnt, n) for key, cnt in c.items() if cnt * (k + 1) > n}


def _run(spark, vals, k, parts):
    df = spark.createDataFrame([(v,) for v in vals], "key string") \
              .repartition(parts)
    out = frequent_items(df, "key", k)
    return {r["key"]: (r["n"], r["total"]) for r in out.collect()}


def test_worked_example(spark):
    vals = ["a"] * 50 + ["b"] * 30 + [chr(99 + i % 20) for i in range(20)]
    # n = 100, k = 3: threshold count*4 > 100 -> a (200) and b (120)
    got = _run(spark, vals, 3, parts=4)
    assert got == {"a": (50, 100), "b": (30, 100)}


def test_globally_frequent_locally_sparse(spark):
    """'h' is 3 of 12 rows in each of 4 partitions — never a local
    majority — but globally 12/48 > 48/(k+1) for k=4. The candidate
    union must still carry it (the mergeable-summaries bound)."""
    part = ["h"] * 3 + [f"x{i}" for i in range(9)]
    rows = []
    for p in range(4):
        rows += [(v if v == "h" else f"{v}_{p}",) for v in part]
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {r["key"]: (r["n"], r["total"])
           for r in frequent_items(df, "key", 4).collect()}
    assert got == {"h": (12, 48)}


def test_mg_merge_prune_bound():
    c = mg_merge({}, {"a": 5, "b": 5, "c": 5}, 2)
    assert c == {}  # (k+1)-th largest is 5; nothing strictly above
    c = mg_merge({}, {"a": 9, "b": 5, "c": 5}, 2)
    assert c == {"a": 4}
    c = mg_merge({"a": 4}, {"b": 1}, 2)
    assert c == {"a": 4, "b": 1}


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=5))
def test_matches_brute_force(spark, vals, k, parts):
    assert _run(spark, vals, k, parts) == _brute(vals, k)


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError):
        frequent_items(df, "key", 0)


def _py_registers(keys, p, bits=64, hash_fn=None):
    regs = {}
    q = bits - p
    for key in keys:
        h = hash_fn(key)
        idx = (h & ((1 << bits) - 1)) >> q if bits == 64 else h >> q
        w = h & ((1 << q) - 1)
        rho = q + 1 if w == 0 else q + 1 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_hll_registers_pin_xxhash64(spark):
    """Spark hll_registers == a pure-python recompute through the
    repo's verified xxhash64 twin on the key's LE bytes — pins the
    JVM hash, the unsigned top-p split, and the bin()-length rho."""
    import struct

    from rastertiler_rs_spark.functions.hashing import xxhash64
    from rastertiler_rs_spark.operators.sketch import hll_registers

    keys = list(range(500)) + [10**12 + 7 * i for i in range(100)] + [-5, -1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["register"]: r["rho_max"]
           for r in hll_registers(df, "k", p=8).collect()}
    want = _py_registers(keys, 8,
                         hash_fn=lambda k: xxhash64(struct.pack("<q", k)))
    assert got == want


def test_hll_merge_is_elementwise_max(spark):
    from rastertiler_rs_spark.operators.sketch import hll_registers

    a = spark.createDataFrame([(i,) for i in range(300)], "k long")
    b = spark.createDataFrame([(i,) for i in range(200, 600)], "k long")
    ra = {r["register"]: r["rho_max"] for r in hll_registers(a, "k", 6).collect()}
    rb = {r["register"]: r["rho_max"] for r in hll_registers(b, "k", 6).collect()}
    ru = {r["register"]: r["rho_max"]
          for r in hll_registers(a.unionByName(b), "k", 6).collect()}
    merged = {j: max(ra.get(j, 0), rb.get(j, 0))
              for j in set(ra) | set(rb)}
    assert ru == merged


def test_hll_estimate_quality(spark):
    from rastertiler_rs_spark.operators.sketch import (hll_estimate,
                                                       hll_registers)

    from pyspark.sql import functions as F

    n = 20000
    df = spark.range(n).select(F.col("id").alias("k"))
    regs = {r["register"]: r["rho_max"]
            for r in hll_registers(df, "k", p=8).collect()}
    est = hll_estimate(regs, 8)
    assert abs(est - n) / n < 0.15, est


def test_hll_p_validation(spark):
    from rastertiler_rs_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=1)


def test_sample_bottom_k_deterministic_and_mergeable(spark):
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.sketch import sample_bottom_k

    df = spark.range(1000).select(F.col("id"))
    h = (F.col("id") * 48271 + 11) % ((1 << 31) - 1)
    got = [(r["id"], r["h"], r["rank"])
           for r in sample_bottom_k(df, "id", 10, hash_expr=h)
           .orderBy("rank").collect()]
    # brute force
    want = sorted(((i * 48271 + 11) % ((1 << 31) - 1), i)
                  for i in range(1000))[:10]
    assert got == [(i, hh, r + 1) for r, (hh, i) in enumerate(want)]
    # repartitioning must not change the sample (determinism)
    got2 = [(r["id"], r["h"], r["rank"])
            for r in sample_bottom_k(df.repartition(7), "id", 10,
                                     hash_expr=h).orderBy("rank").collect()]
    assert got2 == got
    # mergeable: bottom-k of two halves' bottom-k's == global bottom-k
    a = sample_bottom_k(df.where("id < 500"), "id", 10, hash_expr=h)
    b = sample_bottom_k(df.where("id >= 500"), "id", 10, hash_expr=h)
    merged = sample_bottom_k(a.unionByName(b).select("id"), "id", 10,
                             hash_expr=h).orderBy("rank").collect()
    assert [(r["id"], r["h"], r["rank"]) for r in merged] == got


def test_kmv_estimate_quality(spark):
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.sketch import (kmv_distinct_estimate,
                                                       sample_bottom_k)

    n, k = 50000, 256
    df = spark.range(n).select(F.col("id"))
    top = sample_bottom_k(df, "id", k).collect()  # xxhash64 default
    kth = max(r["h"] for r in top)
    # map signed 64-bit hash to (0, 1]
    u = (kth + (1 << 63) + 1) / float(1 << 64)
    est = kmv_distinct_estimate(u, k)
    assert abs(est - n) / n < 0.2, est


def test_cohort_retention_brute_force(spark):
    from datetime import datetime, timezone

    from rastertiler_rs_spark.operators.sessionize import cohort_retention

    day = 86400
    rows = [  # (user, epoch_s)
        (1, 0), (1, day + 5), (1, 3 * day),        # cohort 0, k 0/1/3
        (2, day), (2, day + 10), (2, 2 * day),     # cohort 1, k 0/0/1
        (3, 3 * day),                              # cohort 3, k 0
    ]
    df = spark.createDataFrame(
        [(u, datetime.fromtimestamp(s, tz=timezone.utc)) for u, s in rows],
        "user_id long, ts timestamp")
    got = {(r["cohort"], r["k"]): r["n_users"]
           for r in cohort_retention(df, period_s=day).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1, (3, 0): 1}


def test_stratified_bottom_k_bruteforce(spark):
    """Per-stratum bottom-k == the python sort per stratum, exact
    ranks, invariant to input partitioning; k larger than a stratum
    returns the whole stratum."""
    import numpy as np
    import pandas as pd

    from rastertiler_rs_spark.operators.sketch import stratified_bottom_k

    rng = np.random.default_rng(5)
    n = 500
    strata = rng.choice(["en", "fr", "de", "und"], size=n,
                        p=[0.6, 0.2, 0.15, 0.05])
    ids = rng.permutation(10_000)[:n]
    pdf = pd.DataFrame({"lang": strata, "doc_id": ids.astype("int64")})
    want = {}
    for lang in set(strata):
        sub = sorted(((int(i) * 48271 + 11) % ((1 << 31) - 1), int(i))
                     for i in pdf[pdf["lang"] == lang]["doc_id"])
        for r, (_, i) in enumerate(sub[:7], start=1):
            want[(lang, i)] = r
    from pyspark.sql import functions as F

    lehmer = (F.col("doc_id") * F.lit(48271) + F.lit(11)) % F.lit(
        (1 << 31) - 1)
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(pdf).repartition(nparts)
        got = {(r["stratum"], r["id"]): r["rank"]
               for r in stratified_bottom_k(df, "lang", "doc_id", 7,
                                            hash_expr=lehmer).collect()}
        assert got == want, nparts
    # k >= stratum size → everything sampled
    full = stratified_bottom_k(spark.createDataFrame(pdf), "lang",
                               "doc_id", n, hash_expr=lehmer)
    assert full.count() == n
    with pytest.raises(ValueError, match="k must be"):
        stratified_bottom_k(spark.createDataFrame(pdf), "lang",
                            "doc_id", 0)


def test_sample_bottom_k_keep_cols(spark):
    """keep_cols rides payload through the heaps: result equals the
    no-payload sample joined back to the source (the two-pass shape it
    replaces)."""
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.sketch import sample_bottom_k

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"))
    h = (F.col("doc_id") * 48271 + 11) % ((1 << 31) - 1)
    got = [(r["id"], r["h"], r["rank"], r["text"])
           for r in sample_bottom_k(df, "doc_id", 8, hash_expr=h,
                                    keep_cols=("text",))
           .orderBy("rank").collect()]
    base = sample_bottom_k(df, "doc_id", 8, hash_expr=h)
    want = [(r["id"], r["h"], r["rank"], r["text"])
            for r in base.join(df, base["id"] == df["doc_id"])
            .orderBy("rank").collect()]
    assert got == want and len(got) == 8
