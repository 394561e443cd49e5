"""Round-13 optimization helper: time individual SCALE_PATH queries on the
10x scale cache in isolation (bench.py's sf1 section methodology — same
.count() action, same warmup shape on the sf0.1 tables), so growth-factor
regressions can be attributed without a 4-minute full bench run.

Usage: python scripts/sf1_probe.py q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_cache",
        f"{os.path.basename(os.path.normpath(sf_dir))}_x10v3",
    )
    from pyspark.sql import functions as F

    from qdrant_datafusion_spark.entry_queries import QUERIES
    from qdrant_datafusion_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for _ in range(4):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .agg(F.count("*"), F.sum("l_extendedprice"), F.avg("l_quantity"))
            .collect()
        )
    for name in names:
        spark.sparkContext.setJobDescription(f"sf1probe:{name}")
        t0 = time.time()
        n = QUERIES[name](spark, sf1_dir).count()
        print(f"sf1 {name}: {time.time() - t0:.2f}s ({n} rows)", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
