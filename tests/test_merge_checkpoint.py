"""Merge-operator parity vs a SQLite-semantics oracle, and checkpoint
kill/rerun byte-identity."""

import pytest

from rastertiler_rs_spark.fixtures import generate_images
from rastertiler_rs_spark.operators.checkpoint import (
    committed_batches,
    read_checkpointed,
    render_checkpointed,
)
from rastertiler_rs_spark.operators.merge import merge_fused, merge_metadata
from rastertiler_rs_spark.operators.render import metadata_table, render
from rastertiler_rs_spark.oracle import render_oracle


def _spark_images(spark, lo, hi, tag="u8"):
    pdf = generate_images(hi, tag).to_pandas().iloc[lo:hi]
    return spark.createDataFrame(pdf)


def _as_dict(fused_rows):
    return {(r["zoom"], r["x"], r["tile_row"]): (r["tile_hash"], bytes(r["png"]))
            for r in fused_rows}


def test_merge_fused_matches_sqlite_semantics(spark):
    """Oracle: render A and B separately, merge with the reference's
    INSERT OR IGNORE rule in plain python; Spark merge must match."""
    a = render(_spark_images(spark, 0, 12), 2, 6, 64).collect()
    b = render(_spark_images(spark, 8, 24), 2, 6, 64).collect()
    got = _as_dict(merge_fused(
        render(_spark_images(spark, 0, 12), 2, 6, 64),
        render(_spark_images(spark, 8, 24), 2, 6, 64),
    ).collect())

    want = _as_dict(a)
    for k, v in _as_dict(b).items():
        want.setdefault(k, v)  # left wins on conflict
    assert got == want
    # overlap actually exercised (images 8..12 shared)
    assert set(_as_dict(a)) & set(_as_dict(b)), "test fixtures produced no overlap"


def test_merge_metadata_zoom_minmax(spark):
    imgs = _spark_images(spark, 0, 8)
    left = metadata_table(spark, imgs, 3, 8, "left")
    right = metadata_table(spark, imgs, 1, 6, "right")
    merged = {r["name"]: r["value"] for r in merge_metadata(left, right).collect()}
    assert merged["minzoom"] == "1" and merged["maxzoom"] == "8"
    assert merged["name"] == "left"  # destination keeps its identity


def test_checkpoint_resume_byte_identical(spark, tmp_path):
    imgs = _spark_images(spark, 0, 12)
    full_dir, crash_dir = str(tmp_path / "full"), str(tmp_path / "crash")

    done = render_checkpointed(spark, imgs, full_dir, 0, 5, 64)
    assert len(done) == 6  # one batch per zoom at split_zoom=10

    with pytest.raises(RuntimeError, match="injected failure"):
        render_checkpointed(spark, imgs, crash_dir, 0, 5, 64, fail_after_batches=3)
    assert len(committed_batches(crash_dir)) == 3

    resumed = render_checkpointed(spark, imgs, crash_dir, 0, 5, 64)
    assert len(resumed) == 3  # only the missing batches ran

    a = _as_dict(read_checkpointed(spark, full_dir).collect())
    b = _as_dict(read_checkpointed(spark, crash_dir).collect())
    assert a == b  # kill/rerun is replay-idempotent, byte-for-byte


def test_checkpoint_high_zoom_xblock_batches(spark, tmp_path):
    imgs = _spark_images(spark, 0, 6)
    out = str(tmp_path / "hz")
    render_checkpointed(spark, imgs, out, 11, 12, 64, split_zoom=10)
    batches = committed_batches(out)
    assert {z for z, _ in batches} == {11, 12}
    assert len([b for z, b in batches if z == 11]) == 2  # 2^(11-10) blocks
    assert len([b for z, b in batches if z == 12]) == 4
    got = _as_dict(read_checkpointed(spark, out).collect())
    rows = generate_images(6, "u8").to_pylist()
    tiles, blobs = render_oracle(rows, 11, 12, 64)
    want = {(z, x, y): (h, blobs[h]) for z, x, y, h in tiles}
    assert got == want  # x-block split loses/duplicates nothing


def test_checkpoint_block_pruning_shrinks_render_input(spark):
    """Each xblock batch must feed the kernel ONLY images whose tile
    range can intersect the block — the per-batch render input shrinks
    with block count instead of re-rendering the whole zoom — while the
    union of pruned sets keeps every contributing image."""
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.checkpoint import (plan_batches,
                                                           prune_images_to_block)
    from rastertiler_rs_spark.operators.render import (tile_range_cols,
                                                       with_footprints)

    imgs = with_footprints(_spark_images(spark, 0, 48))
    total = imgs.count()
    batches = [b for b in plan_batches(12, 12, split_zoom=10) if b[0] == 12]
    assert len(batches) == 4
    per_block = []
    kept_ids = set()
    for zoom, xblock, bits in batches:
        pruned = prune_images_to_block(imgs, zoom, xblock, bits)
        n = pruned.count()
        per_block.append(n)
        kept_ids |= {r["image_id"] for r in pruned.select("image_id").collect()}
    # scattered footprints: every block sees a strict subset of images
    assert all(n < total for n in per_block)
    assert sum(per_block) < 4 * total  # strictly less than whole-zoom x4
    # no contributing image lost: every image's z12 range hits >= 1 block
    ranged = tile_range_cols(imgs.withColumn("zoom", F.lit(12)))
    want_ids = {r["image_id"] for r in ranged.select("image_id").collect()}
    assert kept_ids == want_ids


def test_resume_rejects_changed_parameters(spark, tmp_path):
    """Resuming a checkpointed render with different tile_size/dtype/
    colormap/split_zoom must raise, not silently mix incompatible
    batches; extending the ZOOM RANGE stays legal (batches are
    per-(zoom, xblock) and independent)."""
    import pytest as _pytest

    imgs = spark.createDataFrame(generate_images(8, "u8").to_pandas())
    out = str(tmp_path / "ckpt")
    with _pytest.raises(RuntimeError):
        render_checkpointed(spark, imgs, out, 2, 4, 64,
                            fail_after_batches=1)
    with _pytest.raises(ValueError, match="parameter mismatch"):
        render_checkpointed(spark, imgs, out, 2, 4, 128)
    with _pytest.raises(ValueError, match="parameter mismatch"):
        render_checkpointed(spark, imgs, out, 2, 4, 64, split_zoom=5)
    # same params: finishes the plan; wider zoom range: allowed
    render_checkpointed(spark, imgs, out, 2, 4, 64)
    extra = render_checkpointed(spark, imgs, out, 2, 5, 64)
    assert (5, 0) in extra
