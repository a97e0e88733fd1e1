"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compare row count, column names and
the order-insensitive cell values exactly (the driver hashes values, so
anything but exact equality fails there too)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE
from ydb_vector_search_demo_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return names, out


ORACLE_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


def test_every_query_has_oracle_or_is_flagged():
    missing = set(entry_mod.oracle_sql()) - set(entry_mod.queries())
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_ORACLE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(entry_mod.oracle_sql()[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    s_names, s_norm = _normalize(s_cols, s_rows)
    d_names, d_norm = _normalize(d_cols, d_rows)

    assert s_names == d_names, f"{name}: column names differ {s_names} vs {d_names}"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs {len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
