"""Z-order layout (operators.layout): the multi-dimensional data-skipping
lever. Contracts: the Column z-value equals the driver-side reference
bit-interleave; the z-ordered write preserves rows exactly; and on a
2-D box probe the z-ordered layout's parquet footers prune strictly
more files than a linearly-sorted layout of the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.operators import layout


def test_zvalue_matches_reference_interleave(spark):
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (255, 255), (17, 200), (128, 3), (64, 64), (255, 0), (1, 254)]
    )]
    df = spark.createDataFrame(pts, "id INT, x DOUBLE, y DOUBLE")
    got = {
        r.id: r.z
        for r in df.select(
            "id",
            layout.zvalue_expr([("x", 0.0, 255.0), ("y", 0.0, 255.0)], bits=8).alias("z"),
        ).collect()
    }
    for i, x, y in pts:
        want = layout.zvalue_py([x, y], [(0.0, 255.0), (0.0, 255.0)], bits=8)
        assert got[i] == want, f"point {i} ({x},{y})"


def test_zvalue_null_maps_to_lowest_cell(spark):
    df = spark.createDataFrame([(1, None, 10.0)], "id INT, x DOUBLE, y DOUBLE")
    z = df.select(
        layout.zvalue_expr([("x", 0.0, 255.0), ("y", 0.0, 255.0)], bits=8).alias("z")
    ).first().z
    assert z == layout.zvalue_py([None, 10.0], [(0.0, 255.0), (0.0, 255.0)], bits=8)


def test_zvalue_rejects_bad_shapes(spark):
    with pytest.raises(ValueError):
        layout.zvalue_expr([("x", 0.0, 1.0)], bits=8)
    with pytest.raises(ValueError):
        layout.zvalue_expr([("x", 0.0, 1.0), ("y", 0.0, 1.0)], bits=32)


@pytest.fixture(scope="module")
def grid(spark):
    # 64×64 uniform grid: every (x, y) cell once — the worst case for
    # 1-D sorting, the textbook case for the z-curve
    return spark.range(64 * 64).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("bigint").cast("double").alias("y"),
    )


def test_zordered_write_preserves_rows(spark, grid, tmp_path):
    path = str(tmp_path / "zord")
    layout.write_zordered(
        grid, path, [("x", 0.0, 63.0), ("y", 0.0, 63.0)], bits=6, num_files=16
    )
    back = spark.read.parquet(path)
    assert back.count() == 64 * 64
    assert back.select(F.sum("row_id")).first()[0] == grid.select(F.sum("row_id")).first()[0]
    assert set(back.columns) == {"row_id", "x", "y"}  # _z dropped


def test_zorder_prunes_every_dimension_linear_sort_prunes_one(spark, grid, tmp_path):
    """The z-curve's actual contract: a 1-D sort prunes ITS dimension
    perfectly and the others not at all; z-order prunes decently in
    EVERY interleaved dimension. An x-band probe and a y-band probe of
    equal selectivity (8/64): the x-sorted layout scans everything for
    the y probe, the z-ordered layout never scans more than half for
    either — its worst dimension beats the linear layout's worst
    dimension by ≥ 2×."""
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    layout.write_zordered(
        grid, zpath, [("x", 0.0, 63.0), ("y", 0.0, 63.0)], bits=6, num_files=16
    )
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    box_x = {"x": (28.0, 35.0)}
    box_y = {"y": (28.0, 35.0)}
    z_x = layout.file_skip_report(spark, zpath, box_x)["files_scanned"]
    z_y = layout.file_skip_report(spark, zpath, box_y)["files_scanned"]
    l_x = layout.file_skip_report(spark, lpath, box_x)["files_scanned"]
    l_y = layout.file_skip_report(spark, lpath, box_y)["files_scanned"]
    assert layout.file_skip_report(spark, zpath, box_x)["files_total"] == 16
    # the sorted dimension is the linear layout's best case — z-order
    # does not have to beat it there…
    assert l_x <= z_x
    # …but the unsorted dimension is a full scan for the linear layout
    assert l_y == 16
    # z-order prunes BOTH dimensions; its worst case beats linear's
    # worst case by at least 2×
    assert max(z_x, z_y) * 2 <= max(l_x, l_y), (z_x, z_y, l_x, l_y)
    # and a 2-D box composes the pruning multiplicatively-ish
    z_box = layout.file_skip_report(
        spark, zpath, {"x": (28.0, 35.0), "y": (28.0, 35.0)}
    )
    assert z_box["files_scanned"] <= min(z_x, z_y)


def test_skip_report_is_conservative(spark, grid, tmp_path):
    """Every row matching the box lives in a file the report counts as
    scanned — pruning never loses data."""
    path = str(tmp_path / "zsafe")
    layout.write_zordered(
        grid, path, [("x", 0.0, 63.0), ("y", 0.0, 63.0)], bits=6, num_files=16
    )
    box = {"x": (10.0, 20.0), "y": (40.0, 50.0)}
    expect = grid.filter(
        (F.col("x") >= 10.0) & (F.col("x") <= 20.0)
        & (F.col("y") >= 40.0) & (F.col("y") <= 50.0)
    ).count()
    got = (
        spark.read.parquet(path)
        .filter(
            (F.col("x") >= 10.0) & (F.col("x") <= 20.0)
            & (F.col("y") >= 40.0) & (F.col("y") <= 50.0)
        )
        .count()
    )
    assert got == expect  # the real read path (stats + pushed filters)
    rep = layout.file_skip_report(spark, path, box)
    assert 0 < rep["files_scanned"] <= rep["files_total"]


def test_zvalue_plan_stays_jvm(spark, grid):
    df = grid.select(
        layout.zvalue_expr([("x", 0.0, 63.0), ("y", 0.0, 63.0)], bits=6).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for py_node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py_node not in plan
