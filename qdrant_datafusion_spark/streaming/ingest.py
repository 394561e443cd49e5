"""Streaming operators over an event/point stream.

All helpers take an *unbounded* DataFrame (``spark.readStream...``) and
return either a transformed streaming DataFrame or a started query.  For
tests, a file source over the driver's parquet + ``trigger(availableNow)``
+ memory sink drives them to completion synchronously.

Scale notes:
- windowed aggregation keys are (window, group) — state is bounded by the
  watermark horizon; late rows beyond it are dropped, not buffered.
- streaming exact-dedup keeps only the content hash in state
  (``dropDuplicates`` on a 32-char column), not the payload.
- the collection writer is an append-mode parquet sink with checkpointing:
  exactly-once into the same directory layout CollectionCatalog reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts+sums with late-data handling."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), group_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n",
            "sum_value",
        )
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session aggregation via ``session_window`` (the streaming
    sibling of the batch lag+cumsum sessionization in entry_queries)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def stream_dedup_exact(
    points: DataFrame,
    content_col: str,
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time exact dedup: drop rows whose normalized content hash was
    already seen (state = hash only).  With a watermark column, state ages
    out beyond the horizon (bounded state at 100 TB/day ingest)."""
    hashed = points.withColumn(
        "_content_hash", F.md5(F.lower(F.trim(F.col(content_col))))
    )
    if watermark_col is not None:
        hashed = hashed.withWatermark(watermark_col, watermark)
        return hashed.dropDuplicatesWithinWatermark(["_content_hash"]).drop(
            "_content_hash"
        )
    return hashed.dropDuplicates(["_content_hash"]).drop("_content_hash")


def stream_collection_writer(
    points: DataFrame,
    collection_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuous ingestion into a collection directory (parquet append,
    exactly-once via checkpoint) — the streaming version of the write path
    the reference left ``todo!()`` (src/table.rs:186-193)."""
    writer = (
        points.writeStream.format("parquet")
        .option("path", collection_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_topk(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    score_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Custom stateful operator: a running per-key top-k over an unbounded
    stream, via ``applyInPandasWithState`` (Spark has no built-in streaming
    top-k — windowed aggs can't keep "best k ever seen").

    State per key is just the current top-k (ids, scores) — O(k) regardless
    of stream length, so state stays bounded at any ingest volume.  Each
    micro-batch merges its rows into the state with one NumPy argsort over
    ≤ k + batch rows and emits the refreshed ranking (update output mode).
    Ties break by ascending id for deterministic output.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} string, {id_col} bigint, {score_col} double, rank int"
    )
    state_schema = "ids array<bigint>, scores array<double>"

    def update(key, pdfs, state):
        if state.exists:
            ids, scores = state.get
            ids, scores = list(ids), list(scores)
        else:
            ids, scores = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
            scores.extend(float(x) for x in pdf[score_col])
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        ids = [ids[i] for i in order]
        scores = [scores[i] for i in order]
        state.update((ids, scores))
        yield pd.DataFrame(
            {
                key_col: np.repeat(key[0], len(ids)),
                id_col: ids,
                score_col: scores,
                "rank": np.arange(1, len(ids) + 1, dtype="int32"),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
