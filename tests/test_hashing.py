"""xxhash64 parity with Spark's builtin F.xxhash64 (seed 42) — required
so the numpy oracle's tile_hash values match the distributed plan's."""

import numpy as np
from pyspark.sql import functions as F, types as T

from rastertiler_rs_spark.functions.hashing import splitmix64, xxhash64


def test_xxhash64_matches_spark(spark):
    rng = np.random.default_rng(42)
    samples = [
        b"",
        b"a",
        b"abc",
        b"0123",
        b"01234567",
        b"0123456789abcdef0123456789abcde",   # 31 (< 32)
        b"0123456789abcdef0123456789abcdef",  # 32
        bytes(rng.integers(0, 256, 33, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 100, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 65537, dtype=np.uint8)),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(samples)],
        T.StructType([
            T.StructField("i", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]),
    )
    got = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("data").alias("h")).collect()}
    for i, s in enumerate(samples):
        assert xxhash64(s) == got[i], f"mismatch at sample {i} (len {len(s)})"


def test_splitmix64_reference_vectors():
    # published SplitMix64 test vectors (seed sequence from 1234567)
    # from the canonical splitmix64.c by Sebastiano Vigna (public domain):
    # state advances by golden gamma; our splitmix64(x) = finalizer of
    # (x + gamma), so splitmix64(1234567) equals the first output.
    assert int(splitmix64(np.uint64(0))) == 0xE220A8397B1DCDAF
    assert int(splitmix64(np.uint64(1))) == 0x910A2DEC89025CC1
    v = splitmix64(np.arange(4, dtype=np.uint64))
    assert int(v[0]) == 0xE220A8397B1DCDAF and int(v[1]) == 0x910A2DEC89025CC1
