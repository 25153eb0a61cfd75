"""Quadkey clustering layout: files own disjoint sorted curve ranges
(read back from the parquet footers — the property min/max pruning
relies on), cell reads are correct, and the filter is pushed to the
scan."""

import glob

import pyarrow.parquet as pq
import pytest

from rastertiler_rs_spark.fixtures import images_parquet
from rastertiler_rs_spark.operators.layout import (cluster_by_quadkey,
                                                   quadkey_between,
                                                   read_cell)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout") / "imgs")
    images = spark.read.parquet(images_parquet(96, "u8")).select(
        "image_id")  # footprints derive from image_id (fixture rule)
    cluster_by_quadkey(images, out, zoom=10, n_files=8)
    return out


def test_files_own_disjoint_sorted_ranges(clustered):
    ranges = []
    for f in glob.glob(f"{clustered}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(md.row_group(rg).column(i)
                       for i in range(md.num_columns)
                       if md.row_group(rg).column(i).path_in_schema == "qk")
            ranges.append((col.statistics.min, col.statistics.max))
    assert ranges and all(lo <= hi for lo, hi in ranges)
    ranges.sort()
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # disjoint (boundary equality allowed)


def test_cell_read_correct_and_pushed(spark, clustered):
    full = spark.read.parquet(clustered)
    # pick a prefix that actually matches something
    some_qk = full.select("qk").first()["qk"]
    prefix = some_qk[:4]
    got = {r["image_id"] for r in read_cell(spark, clustered, prefix,
                                            zoom=10).collect()}
    lo, hi = quadkey_between(prefix, 10)
    want = {r["image_id"] for r in full.collect() if lo <= r["qk"] <= hi}
    assert got == want and got
    plan = read_cell(spark, clustered, prefix, 10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "qk" in plan


def test_prefix_validation():
    with pytest.raises(ValueError):
        quadkey_between("04x", 10)
    with pytest.raises(ValueError):
        quadkey_between("0" * 11, 10)
