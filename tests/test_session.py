from __future__ import annotations


class TestSessionScaleConfigs:
    """The two deliberately-coupled parallelism knobs (round 13).

    ``spark.default.parallelism=1`` exists ONLY to stop driver-local
    1-row relations (pyspark.ml DefaultParamsWriter metadata) from being
    sliced into per-core pickled partitions that a coalesce(1) consumer
    walks sequentially through Python-worker roundtrips.  AQE's
    coalescePartitions floor silently falls back to defaultParallelism
    when ``minPartitionNum`` is unset, so the =1 fix would otherwise let
    AQE coalesce every small-byte shuffle to ONE partition and serialize
    CPU-heavy post-shuffle stages (measured 2.3x on the 10x kNN-graph
    gate).  The session must therefore always pin the floor explicitly
    to the scale-parameterised shuffle-partition count.
    """

    def test_aqe_floor_pinned_to_shuffle_partitions(self, spark):
        assert spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum"
        ) == spark.conf.get("spark.sql.shuffle.partitions")

    def test_default_parallelism_stays_one_for_local_relations(self, spark):
        # the ML-writer fix: 1 slice for driver-local parallelize /
        # createDataFrame relations (overridable via
        # $SPARK_GRAFT_DEFAULT_PARALLELISM, untouched in tests)
        import os

        expected = int(os.environ.get("SPARK_GRAFT_DEFAULT_PARALLELISM", "1"))
        assert spark.sparkContext.defaultParallelism == expected

    def test_aqe_does_not_collapse_small_shuffle_to_one_task(self, spark):
        # behavioral pin: a tiny-byte groupBy (the shape AQE would
        # coalesce to 1 on size grounds) keeps at least the floor's
        # parallelism for its post-shuffle stage
        from pyspark.sql import functions as F

        df = (
            spark.range(1000)
            .groupBy((F.col("id") % 64).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # run it and read the FINAL adaptive plan's shuffle-read detail
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # AQEShuffleRead reports "coalesced" only when it merged below
        # the original partition count; with the floor pinned it must
        # not have merged all the way to 1
        assert "coalesced 1 partitions" not in plan, plan
        assert floor >= 2  # the fixture session uses 8
