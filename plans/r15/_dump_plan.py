#!/usr/bin/env python
"""Dump .explain('formatted') for catalog queries to plans/r15/.

Usage: python plans/r15/_dump_plan.py <suffix> <query> [<query> ...]
Writes plans/r15/<query>_<suffix>.txt. Uses the bench session shape
(local[$SPARK_GRAFT_CPUS], shuffle=cpus) and $SPARK_GRAFT_SF_DIR
(default sf0.1) so the captured plans match what the bench executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ydb_vector_search_demo_spark.plans.catalog import QUERIES
    from ydb_vector_search_demo_spark.session import get_spark

    spark = get_spark("plandump", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
