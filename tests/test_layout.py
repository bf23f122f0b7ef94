"""Z-order layout tests — key interleave correctness, content preservation,
and measured row-group pruning advantage over a linear sort."""

import numpy as np
import pyarrow.parquet as pq_arrow
import pytest
from pyspark.sql import functions as F

from pq_vector_spark.sources.layout import Z_COL, zorder_key, zorder_write


def _grid_df(spark, n=64):
    # exact integer grid 0..n-1 × 0..n-1 → affine coding is exact
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        (x, y) for x in range(n) for y in range(n)
    )]
    return spark.createDataFrame(rows, "id: bigint, x: double, y: double")


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_key_matches_reference_morton(spark):
    n = 16
    df = _grid_df(spark, n)
    df2, key = zorder_key(df, ["x", "y"], bits=4)
    got = {(int(r["x"]), int(r["y"])): r["z"] for r in df2.withColumn("z", key)
           .select("x", "y", "z").collect()}
    # min/max scaling maps 0..15 exactly onto the 4-bit grid
    for (x, y), z in got.items():
        assert z == _morton2(x, y, 4), (x, y)


def test_validations(spark):
    df = _grid_df(spark, 4)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key(df, ["x", "y"], bits=32)


def test_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(1, 5.0, None), (2, 5.0, float("nan")), (3, 5.0, 1.0)],
        "id: bigint, c: double, d: double",
    )
    df2, key = zorder_key(df, ["c", "d"], bits=4)
    out = df2.withColumn("z", key).select("id", "z").collect()
    assert all(r["z"] is not None for r in out)


def test_write_preserves_content(tmp_path, spark):
    df = _grid_df(spark, 32)
    out = str(tmp_path / "z")
    zorder_write(df, ["x", "y"], out, bits=5, num_files=4)
    back = spark.read.parquet(out)
    assert Z_COL not in back.columns
    assert back.count() == 32 * 32
    assert (
        back.select(F.sum("id")).collect()[0][0]
        == df.select(F.sum("id")).collect()[0][0]
    )


def _overlap_fraction(path_dir, x_lo, x_hi, y_lo, y_hi):
    """Fraction of row groups whose (x, y) min/max box intersects the
    query box — i.e. the groups a stats-pruning reader must scan."""
    import glob
    import os

    total = hit = 0
    for f in glob.glob(os.path.join(path_dir, "*.parquet")):
        meta = pq_arrow.ParquetFile(f).metadata
        sch = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            xs = g.column(sch["x"]).statistics
            ys = g.column(sch["y"]).statistics
            total += 1
            if xs.max >= x_lo and xs.min <= x_hi and ys.max >= y_lo and ys.min <= y_hi:
                hit += 1
    return hit / total, total


def test_zorder_prunes_better_than_linear(tmp_path, spark):
    # 100k points uniform in [0,1)²; small parquet row groups so each file
    # holds many groups with meaningful stats
    rng = np.random.default_rng(5)
    pts = rng.random((100_000, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id: bigint, x: double, y: double",
    )
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    small_groups = {"parquet.block.size": 64 * 1024}
    dfz, key = zorder_key(df, ["x", "y"], bits=10)
    (
        dfz.withColumn(Z_COL, key)
        .repartitionByRange(4, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.options(**small_groups)
        .mode("overwrite")
        .parquet(zpath)
    )
    (
        df.repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.options(**small_groups)
        .mode("overwrite")
        .parquet(lpath)
    )
    # y-only slab (x unbounded): the x-sorted layout cannot prune it at all
    # (every group spans all of y), z-order prunes it like any dimension
    zfrac, zn = _overlap_fraction(zpath, 0.0, 1.0, 0.40, 0.45)
    lfrac, ln = _overlap_fraction(lpath, 0.0, 1.0, 0.40, 0.45)
    assert zn > 8 and ln > 8  # enough row groups for the comparison to mean something
    assert lfrac > 0.95  # linear layout scans everything
    assert zfrac < 0.6, (zfrac, lfrac)  # z-order skips a real fraction
    # and on a 2-D box z-order stays within the same order as the linear
    # layout's best case
    zbox, _ = _overlap_fraction(zpath, 0.40, 0.45, 0.40, 0.45)
    assert zbox < 0.25, zbox
