"""The flagship render pipeline: images table → z/x/y PNG tile tables.

Spark-first re-expression of `rastertiler-rs render`
(/root/reference/src/render.rs:20-156). Dataflow:

  CELL path (zooms >= partition_zoom — the hot path):
  images ──footprint cols── tile-range col exprs at pz (G3, JVM-side)
         ── explode covering-cell sequences (J4 cell assignment)
         ── repartition(cx,cy) + sortWithinPartitions   [THE shuffle:
            compressed source bytes, not pixels]
         ── streamed mapInPandas: per cell decode-once → window-read
            kernel (K1/K2) → mosaic → PNG encode (E1-E5)
         ── xxhash64 content hash + TMS y-flip (S9)

  BLOCKS path (zooms < partition_zoom — low-zoom exact path):
  images ── mapInPandas window-read kernel per (image, tile)
         ── groupBy(zoom,x,y) [+ salt] mosaic+encode
         ── xxhash64 content hash + TMS y-flip (S9)

Design notes for 100 TB scale:
- The tile manifest is generated per image by column expressions and
  explode — there is no manifest⋈images join at all; the spatial join
  (J3) is satisfied by construction, map-side, with zero shuffle. Tiles
  covered by no image never exist (partition pruning P2 for free).
- Exactly ONE shuffle per path, and the cell path's moves compressed
  SOURCE bytes keyed by covering cell (≙ the reference's bounded(1)
  channel boundary, /root/reference/src/render.rs:99, except the
  reference ships tile IDs because every worker holds the whole raster
  — here the shuffle IS the data delivery). The blocks path ships
  per-tile resampled crops instead, which only stays cheap at low
  zooms.
- Kernel UDFs are Arrow-batched; each cell group decodes its images
  once (≙ per-worker dataset handles,
  /root/reference/src/render.rs:166-171).
- Stage parallelism is pinned by explicit repartition (AQE's
  bytes-based coalescing would serialize compute-heavy, byte-light
  python stages) and groups stream through sorted partitions, so one
  python call + one Arrow batch covers MANY cells.
- Skew: cell-group cost is bounded by images-per-cell; raise
  partition_zoom to split dense areas (quadtree descent). For
  pathological low-zoom overlap pass salt_buckets — salted partial
  mosaics (pixelwise img_ord-argmax summaries) merged by a second tiny
  aggregate. At scale, prefer building low zooms with the overview
  cascade (operators/overview.py): every group <= 4 rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tilemath as tm
from ..fixtures import NODATA, image_index
from ..kernel import encode_tile, mosaic, read_tile_block
from ..png import Colormap, decode_band


def with_footprints(images: DataFrame) -> DataFrame:
    """Attach the engine footprint rule (fixtures.footprint_from_index)
    as PURE JVM column expressions — bit-identical to the numpy rule and
    fused by whole-stage codegen straight into the scan, so the
    scan→footprint→cover-explode map side of the render carries NO
    Python stage at all (the pandas-UDF version cost one Arrow
    round-trip per scan task and pinned a python boundary into every
    render plan; profiled as a pure-wait stage at local[32]).

    splitmix64 runs on signed BIGINT with Java wrapping semantics
    (session.py sets ansi off): the unsigned constants appear as their
    two's-complement values and unsigned shifts as shiftrightunsigned —
    exact. The double pipeline replays numpy's op order exactly
    ((cx + ox) * cs then the origin add), every intermediate is
    integer-exact below 2^53, so footprints match the oracle to the
    last bit (pinned by tests/test_render_parity.py::test_jvm_footprints).

    Tables that already carry georeferencing (minx/miny/maxx/maxy in
    EPSG:3857) pass through untouched — the derivation rule is only the
    default for the bare input_hint schema.

    ANSI dispatch: the wrapping bigint multiplies THROW under Spark 4's
    default ANSI mode (our sessions disable it; a caller-provided
    session may not — the driver's own smoke-check session doesn't).
    When the active session is ANSI, fall back to the numpy/pandas-UDF
    form of the same rule — bit-identical output, one Arrow round-trip
    slower, never wrong."""
    if {"minx", "miny", "maxx", "maxy"} <= set(images.columns):
        return images
    # no fallback default here: get(key) resolves Spark's EFFECTIVE
    # value (Spark 4 defaults ANSI on even when the key is unset;
    # get(key, "false") would mask that and take the throwing path)
    if images.sparkSession.conf.get(
            "spark.sql.ansi.enabled").lower() == "true":
        return _with_footprints_udf(images)

    from ..fixtures import ZBASE

    n = 1 << ZBASE
    cs = tm.CE / float(n)
    # splitmix64 constants as signed 64-bit (two's complement)
    c1, c2, c3 = -7046029254386353131, -4658895280553007687, -7723592293110705685
    df = (
        images
        .withColumn("_z", F.expr(f"cast(substring(image_id, 4) as bigint) + {c1}L"))
        .withColumn("_z", F.expr(f"(_z ^ shiftrightunsigned(_z, 30)) * {c2}L"))
        .withColumn("_z", F.expr(f"(_z ^ shiftrightunsigned(_z, 27)) * {c3}L"))
        .withColumn("_g", F.expr("_z ^ shiftrightunsigned(_z, 31)"))
        .drop("_z")
    )
    cx = F.least(F.col("_g").bitwiseAND(F.lit(n - 1)), F.lit(n - 3)).cast("double")
    cy = F.least(F.expr(f"shiftrightunsigned(_g, 13) & {n - 1}"),
                 F.lit(n - 3)).cast("double")
    ox = F.expr("shiftrightunsigned(_g, 26) & 3").cast("double") * F.lit(0.25)
    oy = F.expr("shiftrightunsigned(_g, 28) & 3").cast("double") * F.lit(0.25)
    span = F.lit(0.5) + F.lit(0.5) * F.expr("shiftrightunsigned(_g, 30) & 3").cast("double")
    minx = F.lit(-tm.ORIGIN) + (cx + ox) * F.lit(cs)
    maxy = F.lit(tm.ORIGIN) - (cy + oy) * F.lit(cs)
    return (
        df.withColumn("minx", minx)
        .withColumn("maxy", maxy)
        .withColumn("miny", F.col("maxy") - span * F.lit(cs))
        .withColumn("maxx", F.col("minx") + span * F.lit(cs))
        .drop("_g")
    )


_FOOTPRINT_SCHEMA = "minx double, miny double, maxx double, maxy double"


def _with_footprints_udf(images: DataFrame) -> DataFrame:
    """ANSI-session fallback: the same footprint rule through the
    shared numpy implementation (wrapping uint64 arithmetic stays in
    numpy, which ANSI cannot reject)."""
    from ..fixtures import footprint_from_index

    @F.pandas_udf(_FOOTPRINT_SCHEMA)
    def fp(image_id: pd.Series) -> pd.DataFrame:
        idx = image_index(image_id)
        minx, miny, maxx, maxy = footprint_from_index(idx)
        return pd.DataFrame({"minx": minx, "miny": miny,
                             "maxx": maxx, "maxy": maxy})

    return images.withColumn("_fp", fp("image_id")).select(
        "*", "_fp.*").drop("_fp")


def tile_range_cols(df: DataFrame, zoom_col: str = "zoom") -> DataFrame:
    """G3 (/root/reference/src/tileid.rs:100-131) as JVM column
    expressions — identical IEEE double op order to tilemath.tile_range,
    so tile assignment is bit-for-bit the same as the numpy oracle."""
    z = F.expr(f"cast(shiftleft(1L, cast({zoom_col} as int)) as double)")
    zmax = F.expr(f"shiftleft(1L, cast({zoom_col} as int))") - 1
    origin = F.lit(-tm.ORIGIN)
    ce = F.lit(tm.CE)
    eps = F.lit(1e-11)

    def clamp(c):
        return F.greatest(F.lit(0).cast("long"), F.least(zmax, c.cast("long")))

    return (
        df.withColumn("txmin", clamp(F.floor(((F.col("minx") - origin) / ce) * z)))
        .withColumn("tymin", clamp(F.floor((F.lit(1.0) - ((F.col("maxy") - origin) / ce)) * z)))
        .withColumn("txmax", clamp(F.floor((((F.col("maxx") - origin) / ce) - eps) * z)))
        .withColumn("tymax", clamp(F.floor((F.lit(1.0) - (((F.col("miny") - origin) / ce) + eps)) * z)))
    )


def tile_manifest(images_fp: DataFrame, minzoom: int, maxzoom: int) -> DataFrame:
    """G5: explode per-image tile ranges across zooms (x-major order is
    irrelevant distributed — determinism comes from keying, not
    iteration order)."""
    spark = images_fp.sparkSession
    zooms = spark.range(minzoom, maxzoom + 1).select(F.col("id").cast("int").alias("zoom"))
    df = tile_range_cols(images_fp.crossJoin(F.broadcast(zooms)))
    return (
        df.withColumn("tx", F.explode(F.sequence("txmin", "txmax")))
        .withColumn("ty", F.explode(F.sequence("tymin", "tymax")))
        .drop("txmin", "txmax", "tymin", "tymax")
    )


_KERNEL_SCHEMA = (
    "zoom int, x long, y long, image_id string, img_ord long, left int, top int, "
    "bw int, bh int, block binary"
)


def _kernel_all_zooms_fn(minzoom: int, maxzoom: int, tile_size: int,
                         use_input_ord: bool = False):
    """Fused manifest+kernel: one input row per image, PNG bytes cross
    the Arrow boundary ONCE, decode happens once, and the per-zoom tile
    ranges are enumerated in-process (same tile_range math as the
    declarative tile_manifest — pinned by the shared tilemath module).
    Serves the low-zoom BLOCKS path (zooms below partition_zoom, where
    per-tile blocks are tiny); high zooms take the cell path. The
    declarative explode remains for planning queries (q_tile_cover)
    where Catalyst-visibility matters more than byte movement."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import tilemath as tm

        for pdf in batches:
            out = {k: [] for k in
                   ("zoom", "x", "y", "image_id", "img_ord", "left", "top", "bw", "bh", "block")}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.bytes), row.fmt)
                # ord64 (order-preserving key from a distributed sort)
                # when the caller joined one on; else the fixture-scheme
                # parse — int order == string order only for the exact
                # 'img' + 8-digit form (render() checks before choosing)
                img_ord = (int(row.ord64) if use_input_ord
                           else int(image_index(row.image_id)))
                for zoom in range(minzoom, maxzoom + 1):
                    r = tm.tile_range(zoom, row.minx, row.miny, row.maxx, row.maxy)
                    for _, tx, ty in tm.tile_range_iter(zoom, *r):
                        res = read_tile_block(
                            band, row.minx, row.miny, row.maxx, row.maxy,
                            zoom, tx, ty, tile_size, NODATA,
                        )
                        if res is None:
                            continue
                        left, top, bw, bh, block = res
                        out["zoom"].append(zoom)
                        out["x"].append(tx)
                        out["y"].append(ty)
                        out["image_id"].append(row.image_id)
                        out["img_ord"].append(img_ord)
                        out["left"].append(left)
                        out["top"].append(top)
                        out["bw"].append(bw)
                        out["bh"].append(bh)
                        out["block"].append(np.ascontiguousarray(block).tobytes())
            yield pd.DataFrame(out)

    return fn


def _encode_batch_fn(tile_size: int, dtype_tag: str, colormap_str: str | None):
    """Mosaic + encode over rows of (zoom, x, y, contribs:array<struct>) —
    the groups were built by a JVM-side collect_list aggregate, so one
    Arrow batch carries MANY tiles (vs one applyInPandas call per tile)."""
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, NODATA) if colormap_str else None
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "png": []}
            for row in pdf.itertuples(index=False):
                contribs = [
                    (c["image_id"], int(c["left"]), int(c["top"]), int(c["bw"]),
                     int(c["bh"]),
                     np.frombuffer(c["block"], dtype=np_dtype).reshape(int(c["bh"]), int(c["bw"])))
                    for c in row.contribs
                ]
                canvas = mosaic(contribs, tile_size, NODATA, np_dtype)
                if canvas is None:
                    continue
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["png"].append(encode_tile(canvas, dtype_tag, NODATA, colormap))
            yield pd.DataFrame(out)

    return fn


def _render_cell(group: pd.DataFrame, pz: int, zlo: int, zhi: int,
                 tile_size: int, dtype_tag: str, np_dtype, colormap,
                 out: dict) -> None:
    """Render every tile of zooms [zlo, zhi] inside one zoom-``pz`` cell
    given ALL images overlapping it: decode each image once, window-read
    + mosaic + encode fully task-local (the reference's worker model,
    /root/reference/src/render.rs:127-145, where each worker turns
    source windows directly into finished tiles).

    Correctness of the cell split: a tile at z >= pz lies in exactly one
    pz-cell, and tile_range applies the ε-shrink to the NORMALIZED
    coordinate before zoom scaling, so floor(v·2^z) >> (z-pz) ==
    floor(v·2^pz) — an image's zoom-z range is always contained in its
    zoom-pz cover, hence grouping by the pz cover loses no contributor.
    """
    from .. import tilemath as tm

    cx, cy = int(group["cx"].iloc[0]), int(group["cy"].iloc[0])
    group = group.sort_values("image_id")  # mosaic paste order
    bands = [decode_band(bytes(b), f) for b, f in zip(group["bytes"], group["fmt"])]
    boxes = group[["minx", "miny", "maxx", "maxy"]].to_numpy()
    for z in range(zlo, zhi + 1):
        s = z - pz
        ctx0, cty0 = cx << s, cy << s
        ctx1, cty1 = ((cx + 1) << s) - 1, ((cy + 1) << s) - 1
        contribs: dict[tuple[int, int], list[int]] = {}
        for i in range(len(bands)):
            txmin, tymin, txmax, tymax = tm.tile_range(z, *boxes[i])
            for tx in range(max(txmin, ctx0), min(txmax, ctx1) + 1):
                for ty in range(max(tymin, cty0), min(tymax, cty1) + 1):
                    contribs.setdefault((tx, ty), []).append(i)
        for (tx, ty), idxs in contribs.items():
            parts = []
            for i in idxs:
                res = read_tile_block(bands[i], *boxes[i], z, tx, ty,
                                      tile_size, NODATA)
                if res is not None:
                    parts.append((i,) + res)  # already image_id-sorted
            canvas = mosaic(parts, tile_size, NODATA, np_dtype)
            if canvas is None:
                continue
            out["zoom"].append(z)
            out["x"].append(tx)
            out["y"].append(ty)
            out["png"].append(encode_tile(canvas, dtype_tag, NODATA, colormap))


def _cell_stream_fn(pz: int, zlo: int, zhi: int, tile_size: int,
                    dtype_tag: str, colormap_str: str | None,
                    flush_rows: int = 2048):
    """Sort-based cell aggregation: input partitions are hash-distributed
    on (cx, cy) and sorted within partitions, so each cell's rows are
    contiguous — stream Arrow batches, cut groups at key changes, and
    carry only the boundary group between batches. One mapInPandas over
    the whole partition amortizes Python-call and Arrow-batch overhead
    across thousands of cells (vs one applyInPandas call + one tiny
    output batch PER cell — measured ~1.3x wall on dense pyramids) and
    keeps memory at one batch + one group regardless of partition size.
    """
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, NODATA) if colormap_str else None
        out = {"zoom": [], "x": [], "y": [], "png": []}
        # boundary group carried as a LIST of batch slices, concatenated
        # ONCE when the group closes: re-concatenating the accumulated
        # group onto every following batch goes quadratic on a dense
        # cell spanning many Arrow batches (the same trap the fragment
        # assembler documents) — this form is O(group) total copies
        pend_chunks: list[pd.DataFrame] = []
        pend_key: int | None = None

        def flush():
            df = pd.DataFrame(out)
            for k in out:
                out[k] = []
            return df

        def close_group():
            grp = (pend_chunks[0] if len(pend_chunks) == 1
                   else pd.concat(pend_chunks, ignore_index=True))
            _render_cell(grp, pz, zlo, zhi, tile_size, dtype_tag,
                         np_dtype, colormap, out)
            pend_chunks.clear()

        for pdf in batches:
            if not len(pdf):
                continue
            # contiguous runs of (cx, cy); the last run may spill into
            # the next batch — keep it pending
            key = pdf["cx"].to_numpy() * (1 << 32) + pdf["cy"].to_numpy()
            cuts = np.flatnonzero(key[1:] != key[:-1]) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(pdf)]))
            for s, e in zip(starts, ends):
                k = int(key[s])
                if pend_chunks and k != pend_key:
                    close_group()
                pend_chunks.append(pdf.iloc[s:e])
                pend_key = k
                if e < len(pdf):  # a later run exists: this group is done
                    close_group()
                if len(out["zoom"]) >= flush_rows:
                    yield flush()
        if pend_chunks:
            close_group()
        if out["zoom"]:
            yield flush()

    return fn


def _fold_partial(contribs, tile_size: int, np_dtype, nodata=NODATA):
    """Fold one salt bucket's contributions into a (canvas, winner)
    partial: paste ascending by img_ord so winner[p] is the MAX img_ord
    with data at p — associative+commutative, so partials from any
    bucket split merge exactly. Returns None when the bucket carried
    only nodata. ONE copy of the winner rule, shared by the explicit
    salt path and the auto router (a drifted duplicate would break the
    salted-vs-plain byte parity on only one path)."""
    canvas = np.full((tile_size, tile_size), nodata, dtype=np_dtype)
    winner = np.full((tile_size, tile_size), -1, dtype=np.int64)
    for c in sorted(contribs, key=lambda c: int(c["img_ord"])):
        left, top = int(c["left"]), int(c["top"])
        bw, bh = int(c["bw"]), int(c["bh"])
        block = np.frombuffer(c["block"], dtype=np_dtype).reshape(bh, bw)
        mask = block != nodata
        if not mask.any():
            continue
        canvas[top:top + bh, left:left + bw][mask] = block[mask]
        winner[top:top + bh, left:left + bw][mask] = int(c["img_ord"])
    if (winner == -1).all():
        return None
    return canvas, winner


def _argmax_merge(parts, tile_size: int, np_dtype, nodata=NODATA):
    """Pixelwise argmax-merge of (canvas, winner) partials (the other
    half of the _fold_partial contract). Returns None when every partial
    pixel is nodata."""
    canvas = np.full((tile_size, tile_size), nodata, dtype=np_dtype)
    winner = np.full((tile_size, tile_size), -1, dtype=np.int64)
    for p in parts:
        c = np.frombuffer(p["canvas"], dtype=np_dtype).reshape(
            tile_size, tile_size)
        w = np.frombuffer(p["winner"], dtype=np.int64).reshape(
            tile_size, tile_size)
        take = w > winner
        canvas[take] = c[take]
        winner[take] = w[take]
    if (winner == -1).all():
        return None
    return canvas


def _partial_mosaic_fn(tile_size: int, np_dtype):
    """Phase 1 of the salted mosaic: fold one salt-bucket's contributions
    into (canvas, winner) where winner[p] = img_ord of the contributor
    that owns pixel p (-1 = nodata). Pasting ascending by img_ord makes
    winner[p] the MAX img_ord with data at p — an associative,
    commutative summary, so partials merge exactly (img_ord order ==
    image_id order for the fixed-width id scheme)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "canvas": [], "winner": []}
            for row in pdf.itertuples(index=False):
                folded = _fold_partial(row.contribs, tile_size, np_dtype)
                if folded is None:
                    continue
                canvas, winner = folded
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["canvas"].append(canvas.tobytes())
                out["winner"].append(winner.tobytes())
            yield pd.DataFrame(out)

    return fn


def _route_mosaic_fn(tile_size: int, dtype_tag: str,
                     colormap_str: str | None, nodata=NODATA):
    """Unified stage B of the hot-routed mosaic: rows are (zoom, x, y,
    salt, is_hot, contribs). COLD groups (salt 0, not hot) hold their
    tile's ENTIRE contribution list — mosaic + encode to a finished
    png here (one-pass, exactly the plain path's math). HOT groups are
    one salt bucket of a hot tile — fold to a (canvas, winner) partial
    for stage C's argmax merge. Output rows carry either png or
    canvas+winner, never both."""
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, nodata) if colormap_str else None
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "png": [],
                   "canvas": [], "winner": []}
            for row in pdf.itertuples(index=False):
                if not row.is_hot:
                    contribs = [
                        (int(c["img_ord"]), int(c["left"]), int(c["top"]),
                         int(c["bw"]), int(c["bh"]),
                         np.frombuffer(c["block"], dtype=np_dtype)
                         .reshape(int(c["bh"]), int(c["bw"])))
                        for c in row.contribs
                    ]
                    canvas = mosaic(contribs, tile_size, nodata, np_dtype)
                    if canvas is None:
                        continue
                    out["zoom"].append(int(row.zoom))
                    out["x"].append(int(row.x))
                    out["y"].append(int(row.y))
                    out["png"].append(
                        encode_tile(canvas, dtype_tag, nodata, colormap))
                    out["canvas"].append(None)
                    out["winner"].append(None)
                    continue
                folded = _fold_partial(row.contribs, tile_size, np_dtype,
                                       nodata)
                if folded is None:
                    continue
                canvas, winner = folded
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["png"].append(None)
                out["canvas"].append(canvas.tobytes())
                out["winner"].append(winner.tobytes())
            yield pd.DataFrame(out)

    return fn


def _merge_or_pass_fn(tile_size: int, dtype_tag: str,
                      colormap_str: str | None, nodata=NODATA):
    """Unified stage C: finished cold PNGs pass straight through;
    hot tiles argmax-merge their salt partials and encode."""
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, nodata) if colormap_str else None
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "png": []}
            for row in pdf.itertuples(index=False):
                parts = row.partials
                if len(parts) == 1 and parts[0]["png"] is not None:
                    out["zoom"].append(int(row.zoom))
                    out["x"].append(int(row.x))
                    out["y"].append(int(row.y))
                    out["png"].append(bytes(parts[0]["png"]))
                    continue
                canvas = _argmax_merge(parts, tile_size, np_dtype, nodata)
                if canvas is None:
                    continue
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["png"].append(
                    encode_tile(canvas, dtype_tag, nodata, colormap))
            yield pd.DataFrame(out)

    return fn


def _merge_encode_fn(tile_size: int, dtype_tag: str, colormap_str: str | None):
    """Phase 2: pixelwise argmax-merge of salt partials, then encode."""
    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        colormap = Colormap.parse(colormap_str, NODATA) if colormap_str else None
        for pdf in batches:
            out = {"zoom": [], "x": [], "y": [], "png": []}
            for row in pdf.itertuples(index=False):
                canvas = _argmax_merge(row.partials, tile_size, np_dtype)
                if canvas is None:
                    continue
                out["zoom"].append(int(row.zoom))
                out["x"].append(int(row.x))
                out["y"].append(int(row.y))
                out["png"].append(encode_tile(canvas, dtype_tag, NODATA, colormap))
            yield pd.DataFrame(out)

    return fn


# auto-routing threshold: a plain mosaic task costs ~30-60 µs per
# contribution, so keys below ~8k contributions finish in <~0.5 s and
# the two-phase path's winner-array partials (9x the canvas bytes per
# bucket) would cost more than they save; above it the single task is
# a genuine serial tail (65k contributions ≈ 2-4 s; at 10^12 rows, an
# OOM). Relative sizing doesn't matter at corpus scale — every
# sub-partition-zoom tile is astronomically past any threshold.
_AUTO_SALT_THRESHOLD = 8192
# hard cap on the auto-router's driver-collected hot keyset: with
# partition_zoom=None the manifest spans every zoom, and a dense corpus
# could cross the threshold on millions of mid-zoom tiles — only the
# HOTTEST keys matter for the serial-tail problem, and unsalted keys
# still render correctly through the cold path (just single-task). The
# top-K keeps the collect + broadcast bounded at any scale.
_AUTO_SALT_MAX_KEYS = 65536


def render(
    images: DataFrame,
    minzoom: int,
    maxzoom: int,
    tile_size: int = 512,
    dtype_tag: str = "u8",
    colormap_str: str | None = None,
    salt_buckets: int | None | str = "auto",
    partition_zoom: int | None | str = "auto",
    salt_threshold: int | None | str = "auto",
    persisted: list | None = None,
) -> DataFrame:
    """images table → fused tile table
    (zoom int, x long, y long, tile_row long, tile_hash long, png binary)
    where (x, y) is XYZ and tile_row is the TMS-flipped y
    (/root/reference/src/mbtiles.rs:111-113). Lazy — write or collect to
    execute. Validation mirrors /root/reference/src/render.rs:39-48 and
    /root/reference/src/main.rs:108-115, :146-154.

    Physical strategy: zooms >= ``partition_zoom`` (pz) run the CELL
    path — images are exploded to their covering zoom-pz cells and each
    cell group renders its tiles end-to-end, so the shuffle ships
    compressed source bytes (~KBs/image) instead of raw resampled
    pixels (~tile_size² bytes/tile): ~50x less shuffle I/O at high
    zooms, and kernel+mosaic+encode fuse into one stage. Zooms < pz run
    the BLOCKS path (per-tile resampled blocks shuffled to a
    groupBy(zoom,x,y) mosaic) — at low zooms blocks are tiny, and this
    path is the one that accepts salting (salt_buckets) when a single
    low-zoom tile aggregates millions of images; at scale prefer the
    overview cascade (operators/overview.py) for those zooms entirely.
    ``partition_zoom="auto"`` picks min(8, maxzoom); None disables the
    cell path. Both paths produce byte-identical tiles (pinned by the
    parity tests).

    Salting defaults to ``"auto"``: tile keys whose contribution count
    crosses ``_AUTO_SALT_THRESHOLD`` render through the two-phase
    salted mosaic (buckets = defaultParallelism), the long tail through
    the plain single-pass one — a z0-z2 tile over a dense corpus
    otherwise aggregates every image in ONE task, a serial tail that
    flattens N→4N scaling (and at 10^12 rows would simply OOM). The
    routing count is one extra driver action over the persisted block
    stream (the kernel python stage still runs exactly once); see the
    in-function comment for the measured-and-rejected zero-action
    alternatives. ``salt_buckets=None`` forces the plain path;
    explicit ints keep their round-3 semantics (salt everything, or
    route with an explicit integer ``salt_threshold``). Salted and
    plain output is byte-identical (tests/test_overview_salt.py).

    pz tradeoff at 10^12 rows: higher pz → more groups (up to 4^pz,
    plenty of parallelism) and smaller per-group tile counts, but more
    duplication of images spanning cell borders (fan-out = (extent/
    cell + 1)²). Pick pz so a typical image spans ~1 cell; dense-area
    skew is bounded by images-per-cell and can be split further by
    raising pz (quadtree descent) — AQE skew hints apply to the
    exchange either way.
    """
    if colormap_str is not None and dtype_tag != "u8":
        raise ValueError("colormap can only be provided for uint8 data")
    if dtype_tag not in ("u8", "u32"):
        raise ValueError(f"data type is not supported: {dtype_tag}")
    if minzoom > maxzoom:
        raise ValueError("minzoom must be <= maxzoom")
    if not (0 <= minzoom <= 24 and 0 <= maxzoom <= 24):
        raise ValueError("zoom must be no greater than 24")

    if partition_zoom == "auto":
        pz = min(8, maxzoom)
    else:
        pz = partition_zoom

    spark = images.sparkSession
    # Explicit repartitions below pin stage parallelism: AQE's bytes-based
    # coalescing would collapse these Python-UDF-heavy stages to a handful
    # of tasks (shuffle bytes are small — compressed PNGs — but per-row
    # compute is large), serializing the pipeline. Measured 3.5x on the
    # cell stage at local[32].
    #
    # Cell-stage task count is SCALE-ADAPTIVE between cores*2 and
    # cores*MULT (default 8), derived from the input's plan-statistics
    # size (parquet footer file sizes — metadata only, no job):
    # - the CEILING is r4's 65k-image evidence: cell-group costs are
    #   uneven, and at cores*4 the stage ends in a straggler drain
    #   (event-log profiling showed the last wave trickling 32→1 active
    #   tasks); cores*8 halves per-task cost so the tail packs tighter
    #   — ~5-10% off the 65k render wall, and the main reason N→4N
    #   scaling holds. 65k fixture ≈ 46 MB source → the byte target
    #   reproduces ~cores*8 there.
    # - the FLOOR is the python dispatch tax: each task pays ~5-10 ms
    #   of serial driver handshake, so a small input (bench's 2048
    #   images ≈ 1.5 MB) at 256 tasks burns 1.5-2.5 s of wall on
    #   dispatch alone — measured 6.1-8.0 s → 4.7-5.5 s for the same
    #   render at cores*2.
    # A constant multiplier tuned for either end loses at the other;
    # deriving from bytes keeps both measured optima (guide §2).
    from ..session import env_int

    cores_ = spark.sparkContext.defaultParallelism
    mult_cap = env_int("SPARK_GRAFT_CELL_MULT", 8)
    n_parts = max(cores_ * mult_cap, 8)
    try:
        size_b = int(images._jdf.queryExecution().optimizedPlan()
                     .stats().sizeInBytes())
        est = size_b // env_int("SPARK_GRAFT_CELL_TASK_BYTES", 196608)
        n_parts = int(max(min(est, cores_ * mult_cap), cores_ * 2, 8))
    except Exception:
        pass  # no stats (unusual plan): keep the ceiling
    # The kernel MAP stage (decode+window-read per image) pays a measured
    # ~20-30 ms/task python-stage overhead while its per-image work is
    # small — fewer, larger tasks win (128→64 tasks saved ~2.4 s of a
    # ~5 s stage at local[32]); group/encode stages keep 4x parallelism
    # where per-task compute dominates.
    n_parts_map = max(spark.sparkContext.defaultParallelism * 2, 8)
    src = with_footprints(images).select(
        "image_id", "bytes", "fmt", "minx", "miny", "maxx", "maxy"
    )

    cell_tiles = None
    if pz is not None and pz <= maxzoom:
        zlo = max(minzoom, pz)
        # The map side here (scan → footprint → tile-range → explode →
        # shuffle write) is pure JVM codegen since with_footprints became
        # column expressions: no repartition needed to pin parallelism —
        # even a handful of scan tasks push the ~MBs/task through in
        # JVM time, and one fewer exchange means one fewer stage floor.
        # (With the old pandas-UDF footprint stage this same map side
        # was scan-split-bound and needed fine maxPartitionBytes or an
        # explicit exchange; profiled at local[32] as pure Arrow wait.)
        covers = tile_range_cols(src.withColumn("zoom", F.lit(pz).cast("int")))
        exploded = (
            covers.withColumn("cx", F.explode(F.sequence("txmin", "txmax")))
            .withColumn("cy", F.explode(F.sequence("tymin", "tymax")))
            .select("cx", "cy", "image_id", "bytes", "fmt",
                    "minx", "miny", "maxx", "maxy")
        )
        cell_tiles = (
            exploded.repartition(n_parts, "cx", "cy")
            .sortWithinPartitions("cx", "cy")
            .mapInPandas(
                _cell_stream_fn(pz, zlo, maxzoom, tile_size, dtype_tag, colormap_str),
                "zoom int, x long, y long, png binary",
            )
        )
        if minzoom >= pz:
            return _finish(cell_tiles)
        maxzoom = pz - 1  # blocks path covers the remaining low zooms

    np_dtype = np.uint8 if dtype_tag == "u8" else np.uint32
    cores = spark.sparkContext.defaultParallelism

    # The mosaic contract is ascending image_id (string): the salted
    # paths order/argmax by the numeric img_ord, which matches string
    # order ONLY for the exact fixture scheme 'img' + 8 digits. Any
    # other id scheme gets an order-preserving 64-bit key instead:
    # distinct ids sorted distributively, monotonically_increasing_id
    # follows range-partition order (non-dense but order-preserving —
    # order is all the winner/paste rules need), joined back on id.
    # The check itself is a full image_id scan; on the default auto
    # path it rides the hot-count job (one collect, two concurrent
    # subtrees — see below) instead of paying its own driver action.
    _GENERAL_ID_PRED = ~F.col("image_id").rlike("^img[0-9]{8}$")

    def _blocks_src(general_ids: bool) -> DataFrame:
        if general_ids:
            ord_map = (src.select("image_id").distinct()
                       .orderBy("image_id")
                       .withColumn("ord64", F.monotonically_increasing_id()))
            return src.join(ord_map, "image_id")
        return src

    def _blocks(zlo: int, zhi: int, general_ids: bool) -> DataFrame:
        # the repartition costs one pass of source bytes but balances
        # the decode+kernel across tasks (scan splits alone are skewed
        # by row-group byte sizes); measured faster than scan-aligned
        return _blocks_src(general_ids).repartition(
            n_parts_map, "image_id").mapInPandas(
            _kernel_all_zooms_fn(zlo, zhi, tile_size,
                                 use_input_ord=general_ids),
            _KERNEL_SCHEMA)

    def _plain_mosaic(blocks: DataFrame) -> DataFrame:
        # mosaic+encode stage at cores*2, not the cell stage's cores*8:
        # python tasks pay ~10 ms of serial dispatch each, and in the
        # default config this stage only handles the zooms below pz
        # (bounded tile count — at most 4^pz/3 tiles exist there), so
        # per-tile cost is even and tail-packing buys nothing
        return blocks.repartition(n_parts_map, "zoom", "x", "y").groupBy(
            "zoom", "x", "y").agg(
            F.collect_list(
                F.struct("image_id", "left", "top", "bw", "bh", "block")
            ).alias("contribs")
        ).mapInPandas(
            _encode_batch_fn(tile_size, dtype_tag, colormap_str),
            "zoom int, x long, y long, png binary",
        )

    def _salted_mosaic(blocks: DataFrame, buckets: int,
                       n_salt: int, n_merge: int) -> DataFrame:
        # Skew path (north-star: salted repartition by (zoom, cell)):
        # a dense tile key — worst case z0 receiving every image —
        # first folds into <= buckets bounded partials in parallel,
        # then a tiny second aggregate merges them.
        salted = blocks.withColumn(
            "salt", F.pmod(F.col("img_ord"), F.lit(buckets)))
        partials = salted.repartition(n_salt, "zoom", "x", "y", "salt").groupBy(
            "zoom", "x", "y", "salt").agg(
            F.collect_list(
                F.struct("img_ord", "left", "top", "bw", "bh", "block")
            ).alias("contribs")
        ).mapInPandas(
            _partial_mosaic_fn(tile_size, np_dtype),
            "zoom int, x long, y long, canvas binary, winner binary",
        )
        return partials.repartition(n_merge, "zoom", "x", "y").groupBy(
            "zoom", "x", "y").agg(
            F.collect_list(F.struct("canvas", "winner")).alias("partials")
        ).mapInPandas(
            _merge_encode_fn(tile_size, dtype_tag, colormap_str),
            "zoom int, x long, y long, png binary",
        )

    if salt_buckets == "auto":
        # AUTO routing, ONE linear dataflow. Hot keys are detected
        # from the pure-JVM cover counts (tile_manifest explode — no
        # decode, no python; a superset of the kernel's emitted blocks,
        # which is exactly right for routing and costs a sub-second
        # driver job bounded by the sub-pz tile count). The tiny hot
        # keyset broadcast-marks the single block stream — no lazy
        # fork — and the mosaic runs as a unified two-stage pipeline:
        # stage B encodes COLD tiles outright (plain-path math, one
        # pass) and folds HOT salt buckets to (canvas, winner)
        # partials; stage C passes finished PNGs through and
        # argmax-merges the partials. Cold tiles pay one extra shuffle
        # hop of their finished PNG (KBs); hot tiles parallelize
        # across buckets instead of serializing one task per dense
        # tile (at 10^12 rows, the z0 group would OOM it).
        #
        # Alternatives measured and rejected at n=65536: a lazy
        # filter-split of the block stream re-executes the kernel
        # python stage per branch (Catalyst/AQE cannot reuse exchanges
        # under MapInPandas consumers — accumulator-verified, same
        # wall as the round-3 pyramid fork); a kernel-range split at
        # the source decodes every image twice (~2-4 s of kernel CPU
        # per pass at 32c); a persist+count router serializes a full
        # kernel pre-pass before the main job (~7 s at 32c/65k — more
        # than the serial tail it removes).
        # ONE collect, TWO concurrent subtrees: the hot-key top-K and
        # the general-id flag (a full image_id scan either way) union
        # into a single driver action — their stages run in parallel
        # inside one job instead of costing two serial job round-trips
        # (the flag rides as a sentinel zoom=-1 row)
        hot_q = (
            tile_manifest(src, minzoom, maxzoom)
            .groupBy("zoom", "tx", "ty").count()
            .filter(F.col("count") >= _AUTO_SALT_THRESHOLD)
            .orderBy(F.desc("count"), "zoom", "tx", "ty")  # deterministic
            .limit(_AUTO_SALT_MAX_KEYS)
            .select("zoom", F.col("tx").alias("x"), F.col("ty").alias("y"),
                    F.lit(0).alias("gen"))
        )  # bounded: top-K of the aggregated counts (TakeOrdered)
        gen_q = src.agg(
            F.max(F.when(_GENERAL_ID_PRED, 1).otherwise(0)).alias("g")
        ).select(F.lit(-1).alias("zoom"),
                 F.lit(0).cast("long").alias("x"),
                 F.lit(0).cast("long").alias("y"),
                 F.coalesce(F.col("g"), F.lit(0)).alias("gen"))
        fused_rows = hot_q.unionByName(gen_q).collect()
        general_ids = any(r["zoom"] == -1 and r["gen"] == 1
                          for r in fused_rows)
        hot_rows = [r for r in fused_rows if r["zoom"] >= 0]
        if hot_rows:
            hot_keys = spark.createDataFrame(
                [(int(r["zoom"]), int(r["x"]), int(r["y"])) for r in hot_rows],
                "zoom int, x long, y long")
            marked = _blocks(minzoom, maxzoom, general_ids).join(
                F.broadcast(hot_keys.withColumn("_h", F.lit(True))),
                ["zoom", "x", "y"], "left")
            salted = marked.select(
                "*",
                F.coalesce("_h", F.lit(False)).alias("is_hot"),
                F.when(F.coalesce("_h", F.lit(False)),
                       F.pmod(F.col("img_ord"), F.lit(cores)))
                .otherwise(F.lit(0)).cast("int").alias("salt"))
            stage_b = salted.repartition(
                n_parts_map, "zoom", "x", "y", "salt").groupBy(
                "zoom", "x", "y", "salt", "is_hot").agg(
                F.collect_list(
                    F.struct("img_ord", "left", "top", "bw", "bh", "block")
                ).alias("contribs")
            ).mapInPandas(
                _route_mosaic_fn(tile_size, dtype_tag, colormap_str),
                "zoom int, x long, y long, png binary, "
                "canvas binary, winner binary",
            )
            tiles = stage_b.repartition(
                n_parts_map, "zoom", "x", "y").groupBy(
                "zoom", "x", "y").agg(
                F.collect_list(F.struct("png", "canvas", "winner"))
                .alias("partials")
            ).mapInPandas(
                _merge_or_pass_fn(tile_size, dtype_tag, colormap_str),
                "zoom int, x long, y long, png binary",
            )
        else:
            tiles = _plain_mosaic(_blocks(minzoom, maxzoom, general_ids))
        if cell_tiles is not None:
            tiles = tiles.unionByName(cell_tiles)
        return _finish(tiles)

    # non-auto branches: the id-scheme check pays its own (narrow-column)
    # driver action — only the default auto path fuses it into the
    # routing job
    general_ids = not src.filter(_GENERAL_ID_PRED).isEmpty()
    if salt_buckets and salt_buckets > 1 and salt_threshold is not None \
            and salt_threshold != "auto":
        # DATA-DEPENDENT routing — per-key counts split hot tiles from
        # the long tail (winner-array partials cost ~9x the canvas
        # bytes — pure overhead on 1-2-contribution keys). Costs one
        # extra action (the hot count) that doubles as the persist
        # materialization of the shared block stream.
        blocks = _blocks(minzoom, maxzoom, general_ids).persist()
        if persisted is not None:
            # the block cache must outlive the returned lazy DataFrame;
            # callers unpersist after materializing (render_pyramid's
            # out-param pattern) — without a handle a long-lived session
            # leaks one cached block RDD per explicit-threshold render
            persisted.append(blocks)
        hot = (blocks.groupBy("zoom", "x", "y").count()
               .filter(F.col("count") >= salt_threshold)
               .select("zoom", "x", "y"))
        n_hot = hot.count()
        if n_hot:
            cold = blocks.join(F.broadcast(hot), ["zoom", "x", "y"], "left_anti")
            hot_blocks = blocks.join(F.broadcast(hot), ["zoom", "x", "y"],
                                     "left_semi")
            tiles = _salted_mosaic(
                hot_blocks, salt_buckets,
                n_salt=max(min(n_parts, n_hot * salt_buckets), cores),
                n_merge=max(min(n_parts, n_hot), 1),
            ).unionByName(_plain_mosaic(cold))
        else:
            tiles = _plain_mosaic(blocks)
    elif salt_buckets and salt_buckets > 1:
        # explicit buckets, no threshold: every key two-phase
        tiles = _salted_mosaic(_blocks(minzoom, maxzoom, general_ids),
                               salt_buckets,
                               n_salt=n_parts, n_merge=n_parts)
    else:
        tiles = _plain_mosaic(_blocks(minzoom, maxzoom, general_ids))

    if cell_tiles is not None:
        tiles = tiles.unionByName(cell_tiles)
    return _finish(tiles)


def _finish(tiles: DataFrame) -> DataFrame:
    """(zoom,x,y,png) → fused schema: TMS y-flip (S9) + content hash."""
    flip = F.expr("shiftleft(1L, zoom)") - 1 - F.col("y")
    return (
        tiles.withColumn("tile_row", flip)
        .withColumn("tile_hash", F.xxhash64("png"))
        .select("zoom", "x", "y", "tile_row", "tile_hash", "png")
    )


def tiles_table(fused: DataFrame) -> DataFrame:
    """MBTiles `map` shape (/root/reference/src/mbtiles.rs:18-23)."""
    return fused.select(
        F.col("zoom").alias("zoom_level"),
        F.col("x").alias("tile_column"),
        F.col("tile_row"),
        F.col("tile_hash").alias("tile_id"),
    )


def blobs_table(fused: DataFrame) -> DataFrame:
    """MBTiles `images` shape with content dedup (A5,
    /root/reference/src/mbtiles.rs:104-107)."""
    return fused.select(F.col("tile_hash").alias("tile_id"),
                        F.col("png").alias("tile_data")).dropDuplicates(["tile_id"])


def metadata_table(spark: SparkSession, images: DataFrame, minzoom: int, maxzoom: int,
                   name: str = "tiles") -> DataFrame:
    """S8: tileset metadata (/root/reference/src/render.rs:50-89) via a
    distributed envelope aggregate (A3) + driver-side formatting.
    Geographic tables (minlon..maxlat columns — the warp input shape)
    aggregate their degree bounds directly; mercator tables project the
    envelope back to CRS84 like the reference."""
    if "minlon" in images.columns:
        env = images.agg(
            F.min("minlon").alias("xmin"), F.min("minlat").alias("ymin"),
            F.max("maxlon").alias("xmax"), F.max("maxlat").alias("ymax"),
        ).collect()[0]
        gxmin, gymin = env["xmin"], env["ymin"]
        gxmax, gymax = env["xmax"], env["ymax"]
    else:
        env = (
            with_footprints(images)
            .agg(F.min("minx").alias("xmin"), F.min("miny").alias("ymin"),
                 F.max("maxx").alias("xmax"), F.max("maxy").alias("ymax"))
            .collect()[0]
        )
        gxmin, gymin = tm.mercator_to_geo(env["xmin"], env["ymin"])
        gxmax, gymax = tm.mercator_to_geo(env["xmax"], env["ymax"])
    rows = [
        ("name", name),
        ("minzoom", str(minzoom)),
        ("maxzoom", str(maxzoom)),
        ("bounds", f"{gxmin:.5f},{gymin:.5f},{gxmax:.5f},{gymax:.5f}"),
        ("center", f"{(gxmax + gxmin) / 2:.5f},{(gymax + gymin) / 2:.5f},{minzoom}"),
        ("type", "overlay"),
        ("format", "png"),
        ("version", "1.0.0"),
    ]
    return spark.createDataFrame(rows, "name string, value string")
