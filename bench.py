"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "tiles": N, "tiles_per_sec": T, "cpus": C}

The flagship is the z0-z14 render pyramid over the synthesized
image+caption table (BASELINE.json metric: tiles/sec); the remaining
queries exercise the operator inventory at the sf dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RENDER_N = int(os.environ.get("SPARK_GRAFT_RENDER_N", "2048"))
RENDER_MAXZOOM = int(os.environ.get("SPARK_GRAFT_RENDER_MAXZOOM", "14"))
RENDER_TILESIZE = int(os.environ.get("SPARK_GRAFT_RENDER_TILESIZE", "256"))


def _force(df) -> int:
    """Run the full plan; return row count (noop-style sink)."""
    return df.count()


def _cpu_sample() -> tuple[int, int] | None:
    """(steal_jiffies, total_jiffies) from /proc/stat — the round-2 bench
    regression turned out to be hypervisor contention, so every bench run
    now self-reports steal%% across its timed region."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from rastertiler_rs_spark.fixtures import images_parquet
    from rastertiler_rs_spark.operators.render import render
    from rastertiler_rs_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # pre-generate fixture outside the timed region
    img_path = images_parquet(RENDER_N, "u8")
    spark.read.parquet(img_path).count()  # warm FS cache + JVM

    # warmup: spin up python UDF workers + JIT before any timed region
    warm_path = images_parquet(64, "u8")
    _force(render(spark.read.parquet(warm_path), 0, 6, tile_size=64, dtype_tag="u8"))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    cpu0 = _cpu_sample()
    try:
        extras["load1_at_start"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    t0 = time.time()
    fused = render(spark.read.parquet(img_path), 0, RENDER_MAXZOOM,
                   tile_size=RENDER_TILESIZE, dtype_tag="u8")
    n_tiles = _force(fused.select("zoom", "x", "tile_row", "tile_hash"))
    dt = time.time() - t0
    timings["render_pyramid_z0_14"] = round(dt, 3)
    extras["tiles"] = n_tiles
    extras["tiles_per_sec"] = round(n_tiles / dt, 1)

    # production configuration: overview cascade below z8 (the 100 TB
    # shape — no low-zoom skew; ≙ the reference's default overview mode)
    from rastertiler_rs_spark.operators.overview import render_pyramid

    t0 = time.time()
    fused_p = render_pyramid(spark.read.parquet(img_path), 0, RENDER_MAXZOOM,
                             tile_size=RENDER_TILESIZE, dtype_tag="u8",
                             overview_below=8)
    n_tiles_p = _force(fused_p.select("zoom", "x", "tile_row", "tile_hash"))
    dt_p = time.time() - t0
    timings["render_pyramid_overviews"] = round(dt_p, 3)
    extras["tiles_production"] = n_tiles_p
    extras["tiles_per_sec_production"] = round(n_tiles_p / dt_p, 1)

    qs = entrymod.queries()

    # minhash_lsh: bench the PRODUCTION xxhash64 banding path (the
    # contract entry is its integer-exact verification twin, which pays
    # a per-char fold the scale path doesn't) — keeps r1 comparability
    def _minhash_production(spark, sf_dir):
        from rastertiler_rs_spark.operators.text import lsh_candidate_pairs
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % 5 == 0))
        return lsh_candidate_pairs(docs, num_perms=16, band_size=4)

    # doc_quality: keep the r1-comparable single-operator timing (the
    # contract entry is now the joined doc_stats profile)
    def _doc_quality(spark, sf_dir):
        from rastertiler_rs_spark.operators.text import quality_scores
        return quality_scores(
            spark.read.parquet(f"{sf_dir}/documents.parquet"))

    qs = dict(qs, minhash_lsh=_minhash_production, doc_quality=_doc_quality)
    for name in ["bbox_join", "knn", "dedup_exact", "window_agg", "histogram",
                 "minhash_lsh", "ngram_jaccard", "embedding_topk_int",
                 "embedding_cosine", "doc_quality", "tile_cover"]:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    cpu1 = _cpu_sample()
    if cpu0 and cpu1 and cpu1[1] > cpu0[1]:
        extras["steal_pct"] = round(
            100.0 * (cpu1[0] - cpu0[0]) / (cpu1[1] - cpu0[1]), 2)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total wall sec (render z0-14 pyramid + operator suite); tiles/sec in extras",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "render_n_images": RENDER_N,
        "render_tilesize": RENDER_TILESIZE,
        **extras,
    }))


if __name__ == "__main__":
    main()
