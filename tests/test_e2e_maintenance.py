"""End-to-end corpus MAINTENANCE cycle — the composed day-N flow the
session-4 operators exist for:

    changelog → validate → fold to snapshot → diff vs yesterday →
    incremental dedup of the new batch → SCD2 history audit

Each stage's output feeds the next; the invariants asserted here are the
ones a production run gates on (contract checks pass before folding, the
diff explains exactly the changelog's effect, history covers the
snapshot, dedup only ever inspects batch-involving pairs).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.cdc import (
    cdc_latest_snapshot,
    scd2_history,
    table_diff,
)
from qdrant_datafusion_spark.operators.dedup import (
    minhash_incremental_dups,
)
from qdrant_datafusion_spark.operators.validate import validate_constraints


DAY1 = [
    # (doc_id, seq, op, text)
    (1, 10, "upsert", "the quick brown fox jumps over the lazy dog"),
    (2, 11, "upsert", "an entirely different document about spark plans"),
    (3, 12, "upsert", "a third unique document with its own words"),
]
DAY2 = [
    (2, 20, "upsert", "an entirely different document about flink plans"),
    (3, 21, "delete", None),
    (4, 22, "upsert", "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def frames(spark):
    schema = "doc_id long, seq long, op string, text string"
    d1 = spark.createDataFrame(DAY1, schema)
    d2 = spark.createDataFrame(DAY2, schema)
    return d1, d2


class TestMaintenanceCycle:
    def test_full_cycle(self, frames, spark):
        d1, d2 = frames
        log = d1.union(d2)

        # 1. contract-gate the incoming changelog before touching state
        audit = {
            (r["check"], r["column"]): r["passed"]
            for r in validate_constraints(
                log,
                not_null=["doc_id", "seq", "op"],
                accepted={"op": ["upsert", "delete"]},
                unique=[["doc_id", "seq"]],
            ).collect()
        }
        assert all(audit.values()), audit

        # 2. fold: yesterday's snapshot, today's snapshot
        snap1 = cdc_latest_snapshot(d1, ["doc_id"], ["seq"], op_col="op")
        snap2 = cdc_latest_snapshot(log, ["doc_id"], ["seq"], op_col="op")
        s2 = {r["doc_id"]: r["text"] for r in snap2.collect()}
        assert set(s2) == {1, 2, 4}  # 3 deleted, 4 added
        assert "flink" in s2[2]  # 2 updated

        # 3. the diff explains exactly the day-2 changelog's effect
        diff = {
            r["doc_id"]: (r["status"], list(r["changed_cols"]))
            for r in table_diff(
                snap1.select("doc_id", "text"),
                snap2.select("doc_id", "text"),
                ["doc_id"],
                ["text"],
            ).collect()
        }
        assert diff == {
            2: ("changed", ["text"]),
            3: ("removed", []),
            4: ("added", []),
        }

        # 4. incremental dedup: only the day-2 batch vs the standing
        # corpus — doc 4 is a verbatim dup of corpus doc 1
        batch_ids = {4}  # upserts that are NEW keys
        corpus = snap2.filter(~F.col("doc_id").isin(list(batch_ids)))
        batch = snap2.filter(F.col("doc_id").isin(list(batch_ids)))
        pairs = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_incremental_dups(
                corpus, batch, "text", "doc_id",
                threshold=0.5, max_bucket_size=None,
            ).collect()
        }
        assert pairs == {(1, 4, 1.0)}

        # 5. history covers the snapshot: open intervals == current rows
        hist = scd2_history(log, ["doc_id"], ["seq"], op_col="op")
        open_rows = {
            r["doc_id"]: r["text"]
            for r in hist.filter("is_current").collect()
        }
        assert open_rows == s2
        # and every key's intervals chain without overlap
        ivs = sorted(
            (r["doc_id"], r["valid_from"], r["valid_to"])
            for r in hist.collect()
        )
        by_key: dict[int, list] = {}
        for k, lo, hi in ivs:
            by_key.setdefault(k, []).append((lo, hi))
        for k, spans in by_key.items():
            for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
                assert hi1 is not None and hi1 <= lo2, (k, spans)
