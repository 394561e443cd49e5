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

    def test_default_parallelism_one_rdd_relation_allowlist(self):
        # Guard for the global default.parallelism=1 knob (r13 VERDICT
        # item 4): any RDD-backed relation (spark.range, parallelize)
        # materializes at ONE partition under it, so a future operator
        # ranging over a large n would silently serialize its kernel.
        # Every spark.range site in the package must either stay a tiny
        # literal relation or be immediately re-spread (fan_out /
        # repartition) before heavy per-row work — reviewed sites are
        # pinned here; adding a new one requires re-review.
        import glob
        import os
        import re

        pkg = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "qdrant_datafusion_spark",
        )
        # (file, enclosing def) pairs for each RDD-relation call
        found = set()
        for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
            rel = os.path.relpath(path, pkg)
            current_def = "<module>"
            with open(path, encoding="utf-8") as f:
                for line in f:
                    m = re.match(r"\s*def\s+(\w+)", line)
                    if m:
                        current_def = m.group(1)
                    if re.search(r"\bspark\.range\(|sparkSession\.range\(|\.parallelize\(", line):
                        found.add((rel, current_def))
        allowed = {
            # boilerplate-skew fixtures: 2x n_docs rows of one constant
            # string, consumed ONLY by signature builders that fan_out
            # before the shingle walk (verified round 13)
            ("entry_queries.py", "_skew_fixture"),
            ("entry_queries.py", "_skew_minhash_buckets"),
            ("entry_queries.py", "_skew_simhash_buckets"),
            # 63-row literal bucket table feeding a broadcast join
            ("entry_queries.py", "q_range_bucket_join"),
        }
        new_sites = found - allowed
        assert not new_sites, (
            "new RDD-backed relation site(s) under default.parallelism=1 "
            f"need review + allowlisting: {sorted(new_sites)}"
        )

    def test_aqe_floor_binds_on_byte_heavy_shuffle(self, spark):
        # Round-14 rewrite of a previously-vacuous pin (ADVICE r13): the
        # old assertion matched a string AQE never renders, over a query
        # that planned NO exchange at all (spark.range is 1-partition
        # under default.parallelism=1, and SinglePartition satisfies the
        # groupBy distribution).  The honest contract, measured:
        #
        # - shuffles ABOVE ~minPartitionNum x minPartitionSize keep at
        #   least the pinned floor's parallelism (no collapse to 1);
        # - shuffles BELOW that merge toward 1 BY DESIGN (byte-bound;
        #   forcing the floor to bind everywhere was A/B-measured in
        #   round 14 as a 1.5-3x net regression across 6 of 18 gates —
        #   see session.py's minPartitionSize note).  CPU-heavy small
        #   shuffles spread explicitly via fan_out instead.
        #
        # Input is explicitly multi-partition and the aggregate payload
        # is kept live downstream (size(hs)) so column pruning cannot
        # shrink the shuffle below the bind threshold.
        from pyspark.sql import functions as F

        df = (
            spark.range(300_000)
            .repartition(8)
            .select(F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
            .groupBy((F.col("id") % 4096).alias("k"))
            .agg(F.collect_list("h").alias("hs"))
            .select(
                F.spark_partition_id().alias("p"), F.size("hs").alias("s")
            )
        )
        # collect(), not count(): count() lets the optimizer prune
        # sum(s) -> s -> the collect_list payload, shrinking the shuffle
        # below the bind threshold (the guide §1.4 count() trap)
        occupied = len(df.groupBy("p").agg(F.sum("s")).collect())
        assert occupied >= 2, f"byte-heavy shuffle collapsed to {occupied}"
