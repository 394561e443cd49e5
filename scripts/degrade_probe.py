"""Round-13 diagnosis: which gates degrade the shared session?

Runs the control query between groups of gates and prints the control
time after each group — a rising control time fingers the group that
left the session slower (storage pinned, GC pressure, leaked state).

Usage: python scripts/degrade_probe.py GROUP[,GROUP...]
where GROUP is a comma-free gate name; groups are separated by commas.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from qdrant_datafusion_spark.entry_queries import QUERIES
    from qdrant_datafusion_spark.session import get_spark

    spark = get_spark(app_name="degrade-probe")

    def control() -> float:
        t0 = time.time()
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .agg(F.count("*"), F.sum("l_extendedprice"), F.avg("l_quantity"))
            .collect()
        )
        return round(time.time() - t0, 3)

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for _ in range(6):
        control()
    print(f"control start: {min(control(), control(), control()):.3f}s", flush=True)

    for group in sys.argv[1:]:
        for name in group.split(","):
            t0 = time.time()
            n = QUERIES[name](spark, sf_dir).count()
            print(f"  {name}: {time.time() - t0:.2f}s ({n} rows)", flush=True)
        gc.collect()
        print(
            f"control after {group}: "
            f"{min(control(), control(), control()):.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
