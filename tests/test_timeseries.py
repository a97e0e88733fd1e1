"""Gap-fill semantics (operators.timeseries) on constructed series —
fabricated rows, zero-fill vs LOCF vs leave-NULL, per-key spine bounds.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.operators import timeseries as TS


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # key "a": hours 0, 3 observed -> 1, 2 fabricated
        ("a", datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", datetime(2024, 1, 1, 3, 10), 40.0),
        ("a", datetime(2024, 1, 1, 3, 50), 60.0),
        # key "b": single hour -> no fabrication
        ("b", datetime(2024, 1, 2, 7, 5), 5.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _run(series, **kw):
    out = TS.bucketed_agg_gapfill(
        series,
        keys=["k"],
        ts_col="ts",
        bucket="1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 6).alias("avg_v"),
        ],
        **kw,
    )
    return sorted(
        ((r["k"], r["bucket"].hour, r["n"], r["avg_v"]) for r in out.collect())
    )


def test_gapfill_zero_and_locf(series):
    got = _run(series, fill_zero=["n"], fill_locf=["avg_v"])
    assert got == [
        ("a", 0, 1, 10.0),
        ("a", 1, 0, 10.0),   # fabricated: n=0, avg carried forward
        ("a", 2, 0, 10.0),
        ("a", 3, 2, 50.0),
        ("b", 7, 1, 5.0),    # single-bucket key: nothing fabricated
    ]


def test_gapfill_default_leaves_null(series):
    got = _run(series)
    fabricated = [g for g in got if g[0] == "a" and g[1] in (1, 2)]
    assert all(n is None and a is None for _, _, n, a in fabricated)


def test_spine_is_per_key_not_global(series):
    """Key 'b' must NOT get rows for key 'a''s hours (no global
    calendar cross join)."""
    got = _run(series, fill_zero=["n"])
    assert [g for g in got if g[0] == "b"] == [("b", 7, 1, 5.0)]


def test_leading_gap_stays_null_under_locf(spark):
    """LOCF has nothing to carry before the first observation of a
    column that starts NULL (an aggregated NULL, e.g. avg of no rows
    can't happen post-agg, so emulate with a NULL-valued bucket)."""
    rows = [
        ("a", datetime(2024, 1, 1, 0, 15), None),
        ("a", datetime(2024, 1, 1, 2, 15), 7.0),
    ]
    series = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = TS.bucketed_agg_gapfill(
        series, keys=["k"], ts_col="ts", bucket="1 hour",
        aggs=[F.avg("v").alias("avg_v")], fill_locf=["avg_v"],
    ).collect()
    by_hour = {r["bucket"].hour: r["avg_v"] for r in out}
    assert by_hour[0] is None          # leading NULL: nothing to carry
    assert by_hour[1] is None          # fabricated before first value
    assert by_hour[2] == 7.0


def test_interval_join_bucketed_equals_naive_and_avoids_nested_loop(spark):
    """Chunked range join: row-set equality with the naive non-equi
    join on a constructed case that spans chunk boundaries (intervals
    crossing chunks, points on exact bounds), collision guard, and a
    plan with a hash equi-join — no nested loop / cartesian."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators import timeseries as TS

    base = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [
            (1, base, base + dt.timedelta(days=2)),          # crosses chunks
            (2, base + dt.timedelta(hours=3), base + dt.timedelta(hours=4)),
            (3, base + dt.timedelta(days=9), base + dt.timedelta(days=20)),
        ],
        "iid INT, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    pts = spark.createDataFrame(
        [
            (10, base),                                     # exact start
            (11, base + dt.timedelta(days=2)),              # exact end
            (12, base + dt.timedelta(hours=3, minutes=30)),
            (13, base + dt.timedelta(days=15)),
            (14, base + dt.timedelta(days=40)),             # matches nothing
        ],
        "pid INT, ts TIMESTAMP",
    )
    got = sorted(
        (r.iid, r.pid)
        for r in TS.interval_point_join_bucketed(
            iv, pts, chunk_seconds=86400
        ).collect()
    )
    naive = sorted(
        (r.iid, r.pid)
        for r in iv.crossJoin(pts)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
        .collect()
    )
    assert got == naive and len(got) == 5

    plan = (
        TS.interval_point_join_bucketed(iv, pts, chunk_seconds=86400)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan

    import pytest as _pt

    with _pt.raises(ValueError, match="collision"):
        TS.interval_point_join_bucketed(iv, iv.withColumnRenamed("iid", "x"))


def test_interval_interval_join_exact_multiplicity(spark):
    """Interval-overlap join: equality with the naive non-equi join on
    a case where overlaps span MANY chunks (the duplication trap the
    overlap-start filter exists for), touching/nested/disjoint pairs."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators import timeseries as TS

    b = dt.datetime(2024, 1, 1)
    d = dt.timedelta
    left = spark.createDataFrame(
        [
            (1, b, b + d(days=10)),          # long: spans 11 chunks
            (2, b + d(days=5), b + d(days=6)),
            (3, b + d(days=30), b + d(days=31)),
        ],
        "lid INT, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, b + d(days=2), b + d(days=9)),   # 8-chunk overlap with lid 1
            (11, b + d(days=10), b + d(days=12)), # touches lid 1's end point
            (12, b + d(days=5, hours=12), b + d(days=5, hours=13)),  # nested
            (13, b + d(days=50), b + d(days=51)),  # disjoint
        ],
        "rid INT, r_start_ts TIMESTAMP, r_end_ts TIMESTAMP",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in TS.interval_interval_join_bucketed(left, right).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter(
            (F.col("start_ts") <= F.col("r_end_ts"))
            & (F.col("r_start_ts") <= F.col("end_ts"))
        )
        .collect()
    )
    assert got == naive
    assert len(got) == len(set(got)), "duplicated pairs leaked through"
    assert (1, 10) in got and (1, 11) in got and (2, 12) in got
    assert (3, 13) not in got
