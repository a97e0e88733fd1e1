"""Laws for operators.skew: the salted join is result-invisible
(row-identical to the plain join, inner AND left), the salt is
deterministic, and the physical join key actually includes the salt
(the whole point — without it the test would pass on a plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import skew as SKW
from ydb_vector_search_demo_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def fact_dim(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    return ev, dim


def test_salted_join_equals_plain_inner(spark, fact_dim):
    ev, dim = fact_dim
    plain = ev.join(dim, ["event_type"])
    salted = SKW.salted_join(ev, dim, ["event_type"], salt_by="event_id")
    assert _rows(plain.select(sorted(plain.columns))) == _rows(
        salted.select(sorted(plain.columns))
    )


def test_salted_join_equals_plain_left(spark, fact_dim):
    ev, dim = fact_dim
    # Shrink the dim so some fact rows have no match: left semantics
    # (null extension) must survive the salting.
    small = dim.where(F.col("event_type").isin("click", "view"))
    plain = ev.join(small, ["event_type"], "left")
    salted = SKW.salted_join(
        ev, small, ["event_type"], salt_by="event_id", how="left"
    )
    assert _rows(plain.select(sorted(plain.columns))) == _rows(
        salted.select(sorted(plain.columns))
    )


def test_salted_join_rejects_unsupported_how(spark, fact_dim):
    ev, dim = fact_dim
    with pytest.raises(ValueError, match="inner/left"):
        SKW.salted_join(ev, dim, ["event_type"], salt_by="event_id", how="full")


def test_salt_is_deterministic_and_bounded(spark, fact_dim):
    ev, _ = fact_dim
    a = SKW.with_salt(ev, "event_id", 8).select("event_id", SKW.SALT_COL)
    b = SKW.with_salt(ev, "event_id", 8).select("event_id", SKW.SALT_COL)
    assert _rows(a) == _rows(b)
    bad = a.where(
        (F.col(SKW.SALT_COL) < 0) | (F.col(SKW.SALT_COL) >= 8)
    ).count()
    assert bad == 0


def test_join_key_includes_salt(spark, fact_dim):
    """The physical shuffle key must be (event_type, __salt) — assert
    the salt column appears in the join condition of the optimized
    plan, so a refactor can't silently degrade to the plain join."""
    ev, dim = fact_dim
    salted = SKW.salted_join(ev, dim, ["event_type"], salt_by="event_id")
    optimized = salted._jdf.queryExecution().optimizedPlan().toString()
    assert SKW.SALT_COL in optimized


def test_skew_report_shares_sum_to_one(spark, fact_dim):
    ev, _ = fact_dim
    rep = SKW.skew_report(ev, "event_type", top=5).collect()
    assert abs(sum(r["row_share"] for r in rep) - 1.0) < 1e-4
    assert [r["n_rows"] for r in rep] == sorted(
        (r["n_rows"] for r in rep), reverse=True
    )
