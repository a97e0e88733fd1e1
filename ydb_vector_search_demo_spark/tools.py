"""Developer utilities.

``python -m ydb_vector_search_demo_spark.tools explain <query> [sf_dir]``
prints the formatted physical plan of any catalog query — the fastest
way to check a change kept the plan shape (broadcasts, pushed filters,
TakeOrderedAndProject) that tests/test_plans.py asserts.

``... list`` prints the catalog with oracle coverage flags.
"""

from __future__ import annotations

import sys


def _spark():
    from ydb_vector_search_demo_spark.session import get_spark

    s = get_spark("tools", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str]) -> int:
    from ydb_vector_search_demo_spark.plans.catalog import ORACLES, QUERIES

    if not argv or argv[0] not in ("explain", "list"):
        print(__doc__)
        return 2
    if argv[0] == "list":
        for name in QUERIES:
            flag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:35s} {flag}")
        return 0
    name = argv[1]
    sf_dir = argv[2] if len(argv) > 2 else "/root/testdata/sf0.01"
    if name not in QUERIES:
        print(f"unknown query {name!r}; `list` shows all", file=sys.stderr)
        return 1
    df = QUERIES[name](_spark(), sf_dir)
    df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
