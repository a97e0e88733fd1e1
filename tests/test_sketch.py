"""Laws for the portable sketches (functions.sketch): HyperLogLog
mergeability + error bound, Count-Min's one-sided guarantee +
mergeability. Oracle parity for the catalog rows (events_hll_users,
text_heavy_hitters_cms) lives in test_oracle_parity.py's sweep; these
pin the algebraic properties the SQL comparison can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.functions import sketch as SK
from ydb_vector_search_demo_spark.functions import textstats as T
from ydb_vector_search_demo_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hll_registers_merge(spark):
    """Sketch state is mergeable: union two shards' register tables
    and re-max == one pass over the union. This is what makes the
    sketch shard/stream-safe at 100 TB."""
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    full = SK.hll_registers(ev, ["event_type"], "user_id")
    merged = (
        SK.hll_registers(a, ["event_type"], "user_id")
        .unionByName(SK.hll_registers(b, ["event_type"], "user_id"))
        .groupBy("event_type", "reg")
        .agg(F.max("mrank").alias("mrank"))
    )
    assert _rows(full) == _rows(merged)


def test_hll_estimate_error_bound(spark):
    """m=512 -> rsd ~4.6%; assert a generous 15% envelope plus the
    register-count cap."""
    ev = load_table(spark, SF_SMOKE, "events")
    regs = SK.hll_registers(ev, ["event_type"], "user_id")
    est = SK.hll_estimate(regs, ["event_type"], out="hll_users")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in est.collect():
        assert r["n_regs"] <= SK.HLL_M
        true = exact[r["event_type"]]
        assert abs(r["hll_users"] - true) / true < 0.15, (r, true)


def test_hist_quantile_error_bound(spark):
    """Each estimate is within one bin width above the exact quantile
    (percentile_disc rank rule: the estimate is the upper edge of the
    bin holding the rank-k element)."""
    ev = load_table(spark, SF_SMOKE, "events")
    lo, hi, nbins = 0.0, 1000.0, 200
    width = (hi - lo) / nbins
    hist = SK.hist_counts(ev, ["event_type"], "value", lo, hi, nbins)
    est = {
        r["event_type"]: r
        for r in SK.hist_quantiles(
            hist, ["event_type"], [0.5, 0.9], lo, hi, nbins
        ).collect()
    }
    import math

    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for k, v in vals.items():
        v.sort()
        for q, col in [(0.5, "p50_est"), (0.9, "p90_est")]:
            exact = v[math.ceil(q * len(v)) - 1]
            got = est[k][col]
            assert exact <= got <= exact + width, (k, q, exact, got)


def test_hist_merge(spark):
    """Bin counts merge by summation: hist(A) + hist(B) == hist(A|B)."""
    ev = load_table(spark, SF_SMOKE, "events")
    lo, hi, nbins = 0.0, 1000.0, 200
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    full = SK.hist_counts(ev, ["event_type"], "value", lo, hi, nbins)
    merged = (
        SK.hist_counts(a, ["event_type"], "value", lo, hi, nbins)
        .withColumnRenamed("cnt", "ca")
        .join(
            SK.hist_counts(b, ["event_type"], "value", lo, hi, nbins)
            .withColumnRenamed("cnt", "cb"),
            ["event_type", "bin"],
            "full_outer",
        )
        .select(
            "event_type",
            "bin",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cnt"),
        )
    )
    assert _rows(full) == _rows(merged)


def test_cms_never_undercounts(spark):
    """Cormode & Muthukrishnan 2005: estimates are one-sided — every
    candidate's min-of-rows counter >= its true count, so heavy-hitter
    scans have no false negatives."""
    ev = load_table(spark, SF_SMOKE, "events")
    cms = SK.cms_build(ev, "user_id")
    cands = ev.select("user_id").distinct()
    est = SK.cms_estimate(cms, cands, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    viol = est.join(exact, "user_id").where(
        F.col("cms_cnt") < F.col("true_cnt")
    )
    assert viol.count() == 0


def test_cms_merge(spark):
    """Counter tables are mergeable by summation: cms(A) + cms(B)
    (outer-join, coalesced sum) == cms(A union B)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    a = toks.filter(F.crc32(F.col("token")) % 2 == 0)
    b = toks.filter(F.crc32(F.col("token")) % 2 == 1)
    full = SK.cms_build(toks, "token")
    merged = (
        SK.cms_build(a, "token")
        .withColumnRenamed("cnt", "ca")
        .join(
            SK.cms_build(b, "token").withColumnRenamed("cnt", "cb"),
            ["depth", "bucket"],
            "full_outer",
        )
        .select(
            "depth",
            "bucket",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cnt"),
        )
    )
    assert _rows(full) == _rows(merged)


def test_cms_bucket_bounds(spark):
    """Every bucket index lands in [0, CMS_WIDTH); the counter table
    never exceeds DEPTH x WIDTH rows (the broadcast-size contract)."""
    ev = load_table(spark, SF_SMOKE, "events")
    cms = SK.cms_build(ev, "user_id")
    n = cms.count()
    assert n <= SK.CMS_DEPTH * SK.CMS_WIDTH
    bad = cms.where(
        (F.col("bucket") < 0) | (F.col("bucket") >= SK.CMS_WIDTH)
    ).count()
    assert bad == 0


def test_hist_merge_equals_direct_sketch(spark):
    """r11 wave 10 (the quantile member of the sketch-mergeability
    matrix): bin-wise-summing two segments' histogram states yields
    counts bit-identical to sketching the union stream directly —
    same n_rows, same cumulative structure, same quantile edges."""
    import pyspark.sql.functions as F

    from ydb_vector_search_demo_spark.functions import sketch as SK

    rows = [("a", float(v)) for v in range(0, 100)] + [
        ("b", float(v)) for v in range(50, 250)
    ]
    df = spark.createDataFrame(rows, "seg STRING, value DOUBLE")
    lo, hi, nb = 0.0, 300.0, 30
    per = SK.hist_counts(df, ["seg"], "value", lo, hi, nb)
    merged = (
        per.groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withColumn("u", F.lit("all"))
    )
    direct = SK.hist_counts(
        df.withColumn("u", F.lit("all")), ["u"], "value", lo, hi, nb
    )
    m = {r["bin"]: r["cnt"] for r in merged.collect()}
    d = {r["bin"]: r["cnt"] for r in direct.collect()}
    assert m == d

    qm = SK.hist_quantiles(merged, ["u"], [0.5, 0.9], lo, hi, nb).first()
    qd = SK.hist_quantiles(direct, ["u"], [0.5, 0.9], lo, hi, nb).first()
    assert (qm["n_rows"], qm["p50_est"], qm["p90_est"]) == (
        qd["n_rows"], qd["p50_est"], qd["p90_est"],
    )
    assert qm["n_rows"] == 300
