"""Bucketing: the co-located join the 100 TB docstrings keep promising
(e.g. tpch_q3_shipping: 'bucketing both fact tables by orderkey would
eliminate the shuffle entirely') — proven here. Both fact tables are
written bucketed by the join key; the join then compiles to a
SortMergeJoin with NO Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from ydb_vector_search_demo_spark.sources.tables import load_table


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucket_test_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/warehouse'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    orders = load_table(spark, SF_ORACLE, "orders")
    lineitem = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    (orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(f"{bucket_db}.orders_b"))
    (lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(f"{bucket_db}.lineitem_b"))

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(f"{bucket_db}.orders_b")
        li = spark.table(f"{bucket_db}.lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        join_subtree = plan.split("SortMergeJoin")[1]
        # bucketed co-location: no Exchange feeds the join (the only
        # allowed Exchange is the one ABOVE it, for the final groupBy)
        assert "Exchange" not in join_subtree, (
            "bucketed join must read co-located buckets, not shuffle"
        )

        # and it returns the same result as the plain join
        plain = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
