"""ANN paths vs the exact brute-force baseline: IVF and LSH recall on
the driver-provided embeddings table (deterministic, seed=42)."""

from pyspark.sql import functions as F

from rastertiler_rs_spark.operators.embedding import (cosine_topk, ivf_topk,
                                                      lsh_topk)

SF_DIR = "/root/testdata/sf0.001"


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vectors = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    exact = _sets(cosine_topk(vectors, queries, k=5))
    approx = _sets(ivf_topk(vectors, queries, k=5, n_lists=8, nprobe=3))
    hits = total = 0
    for qid, want in exact.items():
        got = approx.get(qid, set())
        assert len(got) == 5  # probed lists always hold >= k candidates here
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    # every query's own vector sits in its top list, so recall is well
    # above random; exact floor pinned empirically on the seeded fixture
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_kmeans_centroids_partition_all_lists(spark):
    """Lloyd's quantizer: centroids move from their init (the first-N
    placeholder is gone), every vector lands in exactly one list, and
    the per-iteration means are true cluster means."""
    from rastertiler_rs_spark.operators.embedding import kmeans_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vectors = emb.select("vec_id", "embedding")
    cents = kmeans_centroids(vectors, n_lists=8, iters=2)
    rows = cents.collect()
    assert len(rows) == 8 and all(len(r["cemb"]) == 64 for r in rows)
    init = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in vectors.orderBy("vec_id").limit(8).collect()}
    moved = sum(1 for r in rows
                if [round(v, 6) for v in r["cemb"]]
                != [round(v, 6) for v in init[r["cent_id"]]])
    assert moved >= 6  # Lloyd's actually updated the centroids


def test_ivf_int_and_lsh_int_self_hit_and_recall(spark):
    """Integer-exact ANN twins (the DuckDB-verifiable contract paths):
    each query's own vector ranks first, and IVF-int recall vs the
    integer brute force stays above the same floor as the float path."""
    from pyspark.sql import Window

    from rastertiler_rs_spark.operators.embedding import (dot_topk_int,
                                                          ivf_topk_int,
                                                          lsh_topk_int)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vectors = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    for df in (ivf_topk_int(vectors, queries, k=5, n_lists=8, nprobe=3),
               lsh_topk_int(vectors, queries, k=5)):
        by_q = {}
        for r in df.collect():
            by_q.setdefault(r["qid"], {})[r["rank"]] = r["vec_id"]
        for qid, ranks in by_q.items():
            assert ranks[1] == qid  # self-similarity dominates
    exact = _sets(dot_topk_int(vectors, queries, k=5))
    approx = _sets(ivf_topk_int(vectors, queries, k=5, n_lists=8, nprobe=3))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.5, f"IVF-int recall {recall:.2f}"


def test_lsh_topk_subset_of_bucket_and_self_hit(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vectors = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    got = lsh_topk(vectors, queries, k=5)
    rows = got.collect()
    # a query's own vector shares its bucket and has cosine 1.0 → rank 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], {})[r["rank"]] = r["vec_id"]
    for qid, ranks in by_q.items():
        assert ranks[1] == qid


def test_neardup_pairs_planted_variants(spark):
    """Near-dup dedup: planted integer-domain variants (cos ~0.999) are
    all recovered through the banded LSH blocking; no base-base pair
    passes the 0.90 threshold (the fixture's max base cosine is ~0.51);
    every reported pair actually satisfies the integer cosine test."""
    import math

    from rastertiler_rs_spark.operators.embedding import neardup_pairs_int

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"),
                    lambda x: F.floor(x.cast("double") * 256).cast("long"))
        .alias("vi"))
    offset = 10_000_000
    variants = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.transform(
            "vi",
            lambda x, i: x + (F.col("vec_id") * 31 + i.cast("long")) % 5 - 2
        ).alias("vi"))
    n_planted = variants.count()
    rows = neardup_pairs_int(base.unionByName(variants),
                             threshold_x100=90).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert len(pairs) == len(rows)  # distinct applied
    planted = {(a, a + offset) for a in
               [r["vec_id"] for r in base.collect()] if a % 7 == 0}
    assert pairs == planted and len(pairs) == n_planted
    for r in rows:  # integer verification really holds
        assert r["dot"] > 0
        cos = r["dot"] / math.sqrt(r["n2a"] * r["n2b"])
        assert cos >= 0.90


def test_neardup_rejects_uneven_bands(spark):
    import pytest

    from rastertiler_rs_spark.operators.embedding import neardup_pairs_int

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select("vec_id", F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 256).cast("long")).alias("vi"))
    with pytest.raises(ValueError, match="n_bands"):
        neardup_pairs_int(base, n_planes=10, n_bands=3)


def test_blocked_topk_equals_declarative(spark):
    """The blocked-matmul exact top-k must reproduce the declarative
    crossJoin twin EXACTLY (ids, integer dots, ranks): integer dots are
    associative and the per-batch top-k applies the global (-dot,
    vec_id) tie rule, so blocking cannot change the result."""
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.embedding import (dot_topk_int,
                                                          dot_topk_int_blocked)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    vecs = emb.select("vec_id", "embedding")
    a = {(r["qid"], r["rank"]): (r["vec_id"], r["dot"])
         for r in dot_topk_int(vecs, queries, k=7).collect()}
    b = {(r["qid"], r["rank"]): (r["vec_id"], r["dot"])
         for r in dot_topk_int_blocked(vecs, queries, k=7).collect()}
    assert len(a) >= 7
    assert a == b


def test_ivf_index_persist_and_query(spark, tmp_path):
    """build_ivf_index -> ivf_query_index equals the train-per-call
    ivf_topk_int bit-for-bit, and the probe plan prunes the posting-
    list partitions (dynamic partition pruning on list_id)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.embedding import (
        build_ivf_index, ivf_query_index, ivf_topk_int)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))

    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(emb.select("vec_id", "embedding"), idx)
    assert meta["n_lists"] == 8 and len(meta["centroids"]) == 8

    via_index = ivf_query_index(spark, idx, queries, k=5)
    direct = ivf_topk_int(emb.select("vec_id", "embedding"), queries, k=5)
    key = lambda r: (r["qid"], r["rank"])
    a = sorted(((r["qid"], r["rank"], r["vec_id"], r["dot"])
                for r in via_index.collect()))
    b = sorted(((r["qid"], r["rank"], r["vec_id"], r["dot"])
                for r in direct.collect()))
    assert a == b and len(a) > 0

    buf = io.StringIO()
    with redirect_stdout(buf):
        via_index.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert "dynamicpruning" in buf.getvalue()


def test_pq_adc_matches_numpy_twin(spark):
    """PQ-ADC end to end: the distributed train→encode→ADC-join path
    must reproduce, exactly, a driver-side numpy recomputation from the
    same codebooks (codes by (d2, cid)-argmin, approx dot = Σ_m partial
    products, top-k by (dot DESC, vec_id)) — and keep decent recall vs
    the exact integer brute force."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.embedding import (dot_topk_int,
                                                          pq_topk_int,
                                                          pq_train)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vectors = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    m, ksub, dsub, scale, k = 8, 4, 8, 1024, 5

    got = sorted((r["qid"], r["rank"], r["vec_id"], r["dot"])
                 for r in pq_topk_int(vectors, queries, k=k).collect())

    cents = pq_train(vectors, m=m, ksub=ksub)
    rows = vectors.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    V = np.floor(np.array([r["embedding"] for r in rows], dtype=np.float64)
                 * scale).astype(np.int64)
    C = np.array(cents, dtype=np.int64)          # [m][ksub][dsub]
    codes = np.empty((len(ids), m), dtype=np.int64)
    for mm in range(m):
        sub = V[:, mm * dsub:(mm + 1) * dsub]
        d2 = ((sub[:, None, :] - C[mm][None, :, :]) ** 2).sum(axis=2)
        codes[:, mm] = d2.argmin(axis=1)         # argmin takes lowest index on ties
    want = []
    for qpos, qid in enumerate(ids):
        if qid % 10 != 0:
            continue
        q = V[qpos]
        adot = np.zeros(len(ids), dtype=np.int64)
        for mm in range(m):
            pd = (C[mm] * q[mm * dsub:(mm + 1) * dsub][None, :]).sum(axis=1)
            adot += pd[codes[:, mm]]
        order = sorted(range(len(ids)), key=lambda i: (-adot[i], ids[i]))[:k]
        want.extend((qid, rank + 1, ids[i], int(adot[i]))
                    for rank, i in enumerate(order))
    assert got == sorted(want)

    exact = {}
    for r in dot_topk_int(vectors, queries, k=k).collect():
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    approx = {}
    for qid, _rank, vec_id, _dot in got:
        approx.setdefault(qid, set()).add(vec_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # m=8 × ksub=4 is only 16 bits/vector, and the fixture embeddings
    # are near-random (no cluster structure for the codebooks to
    # exploit) — 0.25 measured deterministically; the parity assert
    # above is the real contract, this floor just catches collapse
    assert hits / total >= 0.2, f"PQ recall {hits / total:.2f}"


def test_hyperplane_buckets_not_collapsed(spark):
    """Signed % would fold a large common -(1,..,1) component into every
    plane (buckets collapse toward two patterns); pmod keeps the planes
    symmetric, so random embeddings must spread across many buckets."""
    import numpy as np

    from rastertiler_rs_spark.operators.embedding import hyperplane_bucket

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(256)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (df.withColumn("b", hyperplane_bucket(F.col("embedding"),
                                                n_planes=6, dim=16))
           .select("b").distinct().count())
    assert got >= 16, f"bucket collapse: only {got} distinct buckets"


def test_zero_norm_vector_never_ranks(spark):
    """0/0 cosine is NaN and Spark sorts NaN above every real double —
    an all-zero padding vector must NOT take rank 1."""
    rows = [(0, [0.0] * 8), (1, [1.0] * 8), (2, [0.5] * 8)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame([(7, [1.0] * 8)], "qid long, qemb array<double>")
    top = cosine_topk(vecs, qs, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in top] == [1, 2]


def test_blocked_topk_empty_queries(spark):
    from rastertiler_rs_spark.operators.embedding import (dot_topk_int,
                                                          dot_topk_int_blocked)

    vecs = spark.createDataFrame([(1, [0.5] * 8)],
                                 "vec_id long, embedding array<double>")
    qs = spark.createDataFrame([], "qid long, qemb array<double>")
    assert dot_topk_int_blocked(vecs, qs, k=3).count() == 0
    assert dot_topk_int(vecs, qs, k=3).count() == 0


def test_kmeans_small_corpus_raises(spark):
    import pytest as _pytest

    from rastertiler_rs_spark.operators.embedding import (kmeans_centroids,
                                                          kmeans_int)

    vecs = spark.createDataFrame([(i, [float(i)] * 4) for i in range(3)],
                                 "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="n_lists"):
        kmeans_centroids(vecs, n_lists=8)
    with _pytest.raises(ValueError, match="n_lists"):
        kmeans_int(vecs, n_lists=8, dim=4)


def test_lsh_band_size_validation(spark):
    import pytest as _pytest

    from rastertiler_rs_spark.operators.text import (lsh_candidate_pairs,
                                                     lsh_candidate_pairs_int)

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    for fn in (lsh_candidate_pairs, lsh_candidate_pairs_int):
        with _pytest.raises(ValueError, match="band_size"):
            fn(docs, num_perms=16, band_size=32)
        with _pytest.raises(ValueError, match="band_size"):
            fn(docs, num_perms=16, band_size=5)


def test_neardup_no_int64_wrap_at_scale_1024(spark):
    """Identical vectors with |vi| ~ 1024 make 10000*dot^2 exceed 2^63;
    the decimal(38,0) comparison must still accept them (a wrapped
    int64 comparison gives an arbitrary sign)."""
    from rastertiler_rs_spark.operators.embedding import neardup_pairs_int

    vi = [1023] * 64
    rows = [(1, vi), (2, list(vi))]
    vec_int = spark.createDataFrame(rows, "vec_id long, vi array<long>")
    got = neardup_pairs_int(vec_int, threshold_x100=90,
                            n_planes=24, n_bands=3).collect()
    assert len(got) == 1 and (got[0]["vec_a"], got[0]["vec_b"]) == (1, 2)
    # sanity: the naive int64 product would have wrapped
    dot = sum(a * a for a in vi)
    assert 10000 * dot * dot >= 2 ** 63


def test_sq8_topk_bruteforce(spark):
    """SQ8 codes + asymmetric ranking vs a python float loop: codes
    are the exact max-abs rule, ranks agree with the rescaled-dot
    ordering, zero vectors rank last with dot 0."""
    import math

    import numpy as np
    import pytest

    from rastertiler_rs_spark.operators.embedding import sq8_topk

    rng = np.random.default_rng(9)
    vecs = [(int(i), [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(40)]
    vecs.append((40, [0.0] * 8))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, vecs[3][1]), (1, vecs[17][1])],
        "qid long, qemb array<float>")
    got = {}
    for r in sq8_topk(df, queries, k=5).collect():
        got[(r["qid"], r["rank"])] = (r["vec_id"], r["dot"])

    def codes(v):
        v = [float(np.float32(x)) for x in v]
        m = max(abs(x) for x in v)
        if m == 0:
            return [0] * len(v), 0.0
        return [int(math.floor((x * 127.0) / m + 0.5)) for x in v], m

    want = {}
    for qid, qv in [(0, vecs[3][1]), (1, vecs[17][1])]:
        qc, qm = codes(qv)
        rows = []
        for vid, vv in vecs:
            vc, vm = codes(vv)
            dot = sum(a * b for a, b in zip(vc, qc))
            rows.append((-(float(dot) * vm) * qm, vid, dot))
        rows.sort()
        for rank, (_, vid, dot) in enumerate(rows[:5], start=1):
            want[(qid, rank)] = (vid, dot)
    assert got == want
    with pytest.raises(ValueError, match="k must be"):
        sq8_topk(df, queries, k=0)
