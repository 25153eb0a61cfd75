"""Checkpoint lineage + resume (north-star O7).

The reference restarts from scratch; its nearest analog is WAL +
INSERT OR IGNORE idempotency (/root/reference/src/mbtiles.rs:33-34).
Here every batch commits atomically to a manifest, and resume is an
anti-join of the manifest against the batch plan, so a killed job
continues exactly at the last committed batch and a rerun is
byte-identical.

Batch = (zoom, xblock): at low zooms one batch per zoom; at zooms above
``split_zoom`` tiles are split by tile-column blocks (x >> block_bits of
the covering images' tile range) so a single huge zoom level is many
independently-committable units — per-partition lineage at scale.

Commit protocol (Iceberg-style, filesystem-only): data lands under
``data/zoom=Z/xblock=B/`` via Spark's own atomic job commit, then a
one-line JSON manifest ``manifest/zoom=Z_xblock=B.json`` (row count,
tile stats) is written via temp-file + atomic rename. A batch exists
iff its manifest file exists; partially-written data without a manifest
is overwritten on resume.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .render import render, tile_range_cols, with_footprints


def prune_images_to_block(images_fp: DataFrame, zoom: int, xblock: int,
                          bits: int) -> DataFrame:
    """Keep only images whose zoom-``zoom`` tile range intersects the
    batch's tile-column block [xblock << bits, (xblock+1) << bits).

    This must happen BEFORE render: the tile x column is produced by the
    kernel UDF, so a post-render x filter cannot push below the kernel —
    every batch would decode and render the whole zoom and discard
    (nblocks-1)/nblocks of the work. The range test reuses the exact
    tile_range column math (ε/clamp identical to the kernel), so pruning
    can never drop a contributing image."""
    blo = xblock << bits
    bhi = ((xblock + 1) << bits) - 1
    ranged = tile_range_cols(images_fp.withColumn("zoom", F.lit(zoom)))
    return (
        ranged.filter((F.col("txmin") <= bhi) & (F.col("txmax") >= blo))
        .drop("zoom", "txmin", "txmax", "tymin", "tymax")
    )


def _manifest_path(out_dir: str, zoom: int, xblock: int) -> str:
    return os.path.join(out_dir, "manifest", f"zoom={zoom}_xblock={xblock}.json")


def committed_batches(out_dir: str) -> set[tuple[int, int]]:
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for fn in os.listdir(mdir):
        if fn.startswith("zoom=") and fn.endswith(".json"):
            z, xb = fn[:-5].split("_")
            out.add((int(z.split("=")[1]), int(xb.split("=")[1])))
    return out


def _commit_manifest(out_dir: str, zoom: int, xblock: int, stats: dict) -> None:
    path = _manifest_path(out_dir, zoom, xblock)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"zoom": zoom, "xblock": xblock, **stats}, f)
    os.replace(tmp, path)  # atomic


def plan_batches(minzoom: int, maxzoom: int, split_zoom: int = 10,
                 block_bits: int = 6) -> list[tuple[int, int, int]]:
    """→ [(zoom, xblock, block_bits_effective)]: one batch per zoom up to
    split_zoom, then 2^(z-split_zoom... capped) column blocks per zoom."""
    batches = []
    for z in range(minzoom, maxzoom + 1):
        if z <= split_zoom:
            batches.append((z, 0, 64))  # one block: x >> 64-ish == 0 (use whole range)
        else:
            nblocks = 1 << min(z - split_zoom, 4)
            bits = z - (min(z - split_zoom, 4))
            for b in range(nblocks):
                batches.append((z, b, bits))
    return batches


def render_checkpointed(
    spark: SparkSession,
    images: DataFrame,
    out_dir: str,
    minzoom: int,
    maxzoom: int,
    tile_size: int = 512,
    dtype_tag: str = "u8",
    colormap_str: str | None = None,
    split_zoom: int = 10,
    fail_after_batches: int | None = None,
) -> list[tuple[int, int]]:
    """Render with per-batch checkpoint lineage; resumes automatically.

    Returns the list of batches committed BY THIS CALL.
    ``fail_after_batches`` injects a crash for kill/rerun tests.
    """
    # Pin the parameters that define batch content/identity: a resume
    # under different ones would silently mix incompatible batches into
    # one table (committed batches keep the old tile_size/encoding,
    # new batches render under the new). Zoom RANGE is deliberately not
    # pinned — batches are per-(zoom, xblock) and independent, so
    # extending the range on a rerun is safe.
    params = {"tile_size": tile_size, "dtype_tag": dtype_tag,
              "colormap_str": colormap_str, "split_zoom": split_zoom}
    pfile = os.path.join(out_dir, "manifest", "params.json")
    if os.path.exists(pfile):
        with open(pfile) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"resume parameter mismatch for {out_dir}: committed "
                f"batches were rendered with {prev}, this call passed "
                f"{params}; use a fresh out_dir (or the original "
                "parameters) — mixing would silently corrupt the table")
    else:
        os.makedirs(os.path.dirname(pfile), exist_ok=True)
        _tmp = pfile + ".tmp"
        with open(_tmp, "w") as f:
            json.dump(params, f)
        os.replace(_tmp, pfile)
    done = committed_batches(out_dir)
    committed_now: list[tuple[int, int]] = []
    images_fp = with_footprints(images)
    for zoom, xblock, bits in plan_batches(minzoom, maxzoom, split_zoom):
        if (zoom, xblock) in done:
            continue
        if fail_after_batches is not None and len(committed_now) >= fail_after_batches:
            raise RuntimeError("injected failure for resume test")
        if bits < 64:
            batch_images = prune_images_to_block(images_fp, zoom, xblock, bits)
        else:
            batch_images = images_fp
        fused = render(batch_images, zoom, zoom, tile_size, dtype_tag, colormap_str)
        if bits < 64:
            # exact block membership: a pruned image can still emit tiles
            # outside the block (its range straddles the boundary)
            fused = fused.filter(F.expr(f"shiftright(x, {bits})") == xblock)
        path = os.path.join(out_dir, "data", f"zoom={zoom}", f"xblock={xblock}")
        fused.write.mode("overwrite").parquet(path)
        # lineage stats per the north-star manifest contract: tile ranges
        # completed, row counts, encode stats. PSNR vs golden is infinity
        # by construction on the exact path (lossless PNG, pinned by the
        # parity tests), so the manifest records the encode evidence
        # (byte sizes + distinct content hashes) rather than recomputing
        # a golden diff per batch.
        stats_row = (
            spark.read.parquet(path)
            .agg(F.count("*").alias("rows"),
                 F.min("x").alias("txmin"), F.max("x").alias("txmax"),
                 F.min("tile_row").alias("tymin"), F.max("tile_row").alias("tymax"),
                 F.sum(F.length("png")).alias("png_bytes"),
                 F.countDistinct("tile_hash").alias("distinct_blobs"))
            .collect()[0]
        )
        stats = {k: (int(v) if v is not None else None)
                 for k, v in stats_row.asDict().items()}
        stats["psnr_db"] = "inf"  # lossless parity path
        stats["committed_at"] = time.time()
        _commit_manifest(out_dir, zoom, xblock, stats)
        committed_now.append((zoom, xblock))
    return committed_now


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back only COMMITTED batches (anti-join of data against the
    manifest, done by path selection — uncommitted dirs are excluded)."""
    paths = [
        os.path.join(out_dir, "data", f"zoom={z}", f"xblock={b}")
        for z, b in sorted(committed_batches(out_dir))
    ]
    if not paths:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    return spark.read.parquet(*paths)
