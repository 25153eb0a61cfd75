"""Optimization-round measurement harness (bench.py is FROZEN; this
file is the guide-§1.4 noop-sink isolation + plan capture sidecar).

Usage:
  python bench_extra.py [--plans DIR] [--repeats N] [query ...]

For each selected query (default: the bench.py suite), this:
  - captures df.explain("formatted") into DIR/<name>.txt when --plans set
  - times the full plan via the noop sink, N repeats, prints per-query
    min/median

The render entries time the same fused render/render_pyramid calls
bench.py makes (noop over the same projected columns).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RENDER_N = int(os.environ.get("SPARK_GRAFT_RENDER_N", "2048"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir to write plan files")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--count", action="store_true",
                    help="time df.count() (bench.py methodology) instead of noop")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from rastertiler_rs_spark.fixtures import images_parquet
    from rastertiler_rs_spark.operators.overview import render_pyramid
    from rastertiler_rs_spark.operators.render import render
    from rastertiler_rs_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    img_path = images_parquet(RENDER_N, "u8")
    spark.read.parquet(img_path).count()
    warm_path = images_parquet(64, "u8")
    render(spark.read.parquet(warm_path), 0, 6, tile_size=64,
           dtype_tag="u8").select("zoom", "x", "tile_row", "tile_hash").count()

    qs = entrymod.queries()

    def _minhash_production(spark, sf_dir):
        from rastertiler_rs_spark.operators.text import lsh_candidate_pairs
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % 5 == 0))
        return lsh_candidate_pairs(docs, num_perms=16, band_size=4)

    def _doc_quality(spark, sf_dir):
        from rastertiler_rs_spark.operators.text import quality_scores
        return quality_scores(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def _render_main(spark, sf_dir):
        return render(spark.read.parquet(img_path), 0, 14, tile_size=256,
                      dtype_tag="u8").select("zoom", "x", "tile_row", "tile_hash")

    def _render_over(spark, sf_dir):
        return render_pyramid(spark.read.parquet(img_path), 0, 14,
                              tile_size=256, dtype_tag="u8",
                              overview_below=8).select(
                                  "zoom", "x", "tile_row", "tile_hash")

    qs = dict(qs, minhash_lsh=_minhash_production, doc_quality=_doc_quality,
              render_pyramid_z0_14=_render_main,
              render_pyramid_overviews=_render_over)

    default = ["render_pyramid_z0_14", "render_pyramid_overviews", "bbox_join",
               "knn", "dedup_exact", "window_agg", "histogram", "minhash_lsh",
               "ngram_jaccard", "embedding_topk_int", "embedding_cosine",
               "doc_quality", "tile_cover"]
    names = args.names or default

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if args.count:
                df.count()
            else:
                _noop(df)
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        samples_sorted = sorted(samples)
        out[name] = {"min": samples_sorted[0],
                     "med": samples_sorted[len(samples_sorted) // 2],
                     "samples": samples}
        print(f"{name:26s} min={samples_sorted[0]:7.3f} "
              f"med={samples_sorted[len(samples_sorted) // 2]:7.3f}  {samples}",
              flush=True)

    print(json.dumps({n: v["min"] for n, v in out.items()}))


if __name__ == "__main__":
    main()
