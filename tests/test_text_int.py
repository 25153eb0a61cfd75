"""Integer-exact dedup twins (polynomial-hash minhash/simhash/
fingerprint): planted near-duplicates must be recovered through the
banding/blocking, and identical docs must collapse. Cross-engine value
equality is the driver contract's job (check_oracle); these pin the
detection semantics."""

from rastertiler_rs_spark.operators.text import (doc_fingerprints_int,
                                                 lsh_candidate_pairs_int,
                                                 simhash_near_pairs_int)

_BASE = ("the quick brown fox jumps over the lazy dog while the rain "
         "in spain stays mainly on the plain and the band plays on")


def _docs(spark):
    rows = [
        (0, _BASE),
        (1, _BASE.replace("dog", "cat")),          # near-dup of 0
        (2, "completely different text about spark catalyst optimizer "
            "plans partitions shuffles and adaptive execution engines"),
        (3, "yet another unrelated document mentioning tiles pyramids "
            "rasters zoom levels and mercator projections at scale"),
        (4, _BASE),                                # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_int_recovers_planted_pairs(spark):
    docs = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands_shared"]
             for r in lsh_candidate_pairs_int(docs).collect()}
    assert (0, 4) in pairs and pairs[(0, 4)] == 4  # exact dup: all bands
    assert (0, 1) in pairs  # near-dup shares at least one band
    assert (2, 3) not in pairs  # unrelated docs don't collide


def test_simhash_int_recovers_planted_pairs(spark):
    docs = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs_int(docs, max_hamming=16).collect()}
    assert pairs.get((0, 4)) == 0  # identical text → identical simhash
    assert (0, 1) in pairs and pairs[(0, 1)] <= 16
    assert (2, 3) not in pairs


def test_poly_hash_matches_python_reference(spark):
    """The JVM fold (F.aggregate) must equal a plain-python fold for
    arbitrary ASCII strings — the same property the DuckDB list_reduce
    twin relies on."""
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.text import HM, poly_hash_col

    import random
    rng = random.Random(42)
    strs = ["".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(1, 40)))
            for _ in range(200)]

    def py_poly(s, base=131):
        acc = 0
        for ch in s:
            acc = (acc * base + ord(ch)) % HM
        return acc

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)],
                               "i long, s string")
    got = {r["i"]: r["h"] for r in
           df.select("i", poly_hash_col(F.col("s")).alias("h")).collect()}
    for i, s in enumerate(strs):
        assert got[i] == py_poly(s), f"mismatch for {s!r}"
        assert 0 <= got[i] < HM


def test_doc_fingerprint_int_identity(spark):
    docs = _docs(spark)
    fp = {r["doc_id"]: r["fingerprint"]
          for r in doc_fingerprints_int(docs).collect()}
    assert fp[0] == fp[4]  # identical docs → identical fingerprint
    assert len({fp[0], fp[2], fp[3]}) == 3  # distinct docs differ
    assert all(0 <= v < 2147483647 for v in fp.values())


def test_token_counts_whitespace_and_bpeish(spark):
    """Known strings pin both tokenizations: whitespace count and the
    BPE-ish rule (letter runs = 1 token, each digit and each non-space
    symbol = 1 token)."""
    from rastertiler_rs_spark.operators.text import token_counts

    docs = spark.createDataFrame(
        [(0, "Hello, world!"),          # ws 2; bpe: Hello , world ! = 4
         (1, "abc 123 x-y"),            # ws 3; bpe: abc 1 2 3 x - y = 7
         (2, "  spaced   out  ")],      # ws 2; bpe: spaced out = 2
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
           for r in token_counts(docs).collect()}
    assert got == {0: (2, 4), 1: (3, 7), 2: (2, 2)}


def test_repetition_scores_brute_force(spark):
    """Gopher repetition counts vs a pure-python recompute, including
    the single-word (no-bigram) edge and heavy repetition."""
    from collections import Counter

    from rastertiler_rs_spark.operators.text import repetition_scores

    texts = {
        1: "a b a b a b",          # top bigram 'a b' x3 (of 5), top word a x3
        2: "solo",                  # no bigrams
        3: "x x x x",               # degenerate repeat
        4: "the quick brown fox jumps over the lazy dog",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_distinct_words"], r["top_word_n"],
                         r["n_bigrams"], r["top_bigram_n"])
           for r in repetition_scores(df).collect()}
    for did, t in texts.items():
        ws = t.split(" ")
        wc = Counter(ws)
        bgs = Counter(" ".join(p) for p in zip(ws, ws[1:]))
        want = (len(ws), len(wc), max(wc.values()),
                sum(bgs.values()), max(bgs.values()) if bgs else 0)
        assert got[did] == want, (did, got[did], want)


def test_doc_chunks_bruteforce(spark):
    """Chunking vs a python loop: full token coverage, overlap stride,
    short tail, 1-token doc edge; chunk_text joins the exact token
    slice."""
    from rastertiler_rs_spark.operators.text import doc_chunks

    rows = [(1, "a b c d e f g h i j"), (2, "solo"),
            (3, "  padded   with   runs  of spaces "),
            (4, " ".join(f"t{i}" for i in range(50)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in doc_chunks(docs, size=4, stride=3).collect():
        got[(r["doc_id"], r["chunk_id"])] = (r["n_chunk_tokens"],
                                             r["chunk_text"])
    want = {}
    for did, text in rows:
        toks = text.split()
        n = len(toks)
        i = 0
        while i * 3 < n:
            sl = toks[i * 3:i * 3 + 4]
            want[(did, i)] = (len(sl), " ".join(sl))
            i += 1
    assert got == want
    # every token index is covered by at least one chunk
    for did, text in rows:
        n = len(text.split())
        covered = set()
        for (d, i), (ln, _) in want.items():
            if d == did:
                covered.update(range(i * 3, i * 3 + ln))
        assert covered == set(range(n))
    import pytest as _pt
    with _pt.raises(ValueError, match="size and stride"):
        doc_chunks(docs, size=0)


def test_lsh_posexplode_matches_per_band_buckets(spark):
    """r6 rewrote the banding as ONE posexplode over per-band bucket
    arrays (the union-of-selects form re-planned the signature
    aggregation per band per join side). Pin the rewrite against a
    driver-side recomputation of the banded buckets from the signature
    table: candidate pairs = pairs sharing >= 1 band bucket, with
    n_bands_shared the exact shared-band count."""
    from itertools import combinations

    from rastertiler_rs_spark.operators.text import (
        lsh_candidate_pairs, minhash_signatures)

    docs = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands_shared"]
             for r in lsh_candidate_pairs(docs, num_perms=16,
                                          band_size=4).collect()}
    sig = {r["doc_id"]: [r[f"h{k}"] for k in range(16)]
           for r in minhash_signatures(docs, 16, 3).collect()}
    import pyspark.sql.functions as F
    # band bucket = xxhash64 of the 4-slice; recompute via the engine
    # for hash parity, one tiny local table
    rows = [(d, b, *sig[d][b * 4:(b + 1) * 4])
            for d in sig for b in range(4)]
    bdf = spark.createDataFrame(
        rows, "doc_id long, band int, a long, b long, c long, d long")
    buck = {(r["doc_id"], r["band"]): r["bucket"]
            for r in bdf.select("doc_id", "band",
                                F.xxhash64("a", "b", "c", "d")
                                .alias("bucket")).collect()}
    want = {}
    for x, y in combinations(sorted(sig), 2):
        n = sum(buck[(x, b)] == buck[(y, b)] for b in range(4))
        if n:
            want[(x, y)] = n
    assert pairs == want
