"""edit_distance_pairs (PassJoin) — independence proof vs brute force.

The gate oracle mirrors the pigeonhole candidate CTE, so THIS file is
what makes the gate trustworthy: the operator must equal an all-pairs
``levenshtein`` crossJoin on data the oracle never sees.
"""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def _brute(rows, d):
    want = set()
    for (i1, s1), (i2, s2) in itertools.combinations(rows, 2):
        if len(s1) >= d + 1 and len(s2) >= d + 1:
            dd = _lev(s1, s2)
            if dd <= d:
                want.add((min(i1, i2), max(i1, i2), dd))
    return want


def _rand_corpus(seed, n=90):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = "".join(rng.choice("abcd ") for _ in range(rng.randint(3, 18)))
        rows.append((i, s))
        if rng.random() < 0.4:  # seed near-dups at controlled distance
            t = list(s)
            for _ in range(rng.randint(1, 3)):
                op = rng.choice("ids")
                pos = rng.randrange(max(1, len(t)))
                if op == "i":
                    t.insert(pos, rng.choice("abcd"))
                elif op == "d" and len(t) > 1:
                    del t[pos]
                else:
                    t[pos] = rng.choice("abcd")
            rows.append((1000 + i, "".join(t)))
    return rows


class TestEditDistancePairs:
    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_equals_brute_force(self, spark, d):
        rows = _rand_corpus(seed=7 + d)
        df = spark.createDataFrame(rows, "id long, s string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(df, "s", "id", max_dist=d).collect()
        }
        assert got == _brute(rows, d)

    def test_exact_duplicates_are_distance_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "hello world"), (3, "goodbye")],
            "id long, s string",
        )
        got = edit_distance_pairs(df, "s", "id", max_dist=2).collect()
        assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 0)]

    def test_short_keys_dropped(self, spark):
        # keys shorter than d+1 chars can't be segmented; contract: drop
        df = spark.createDataFrame(
            [(1, "ab"), (2, "ab"), (3, "abcdef"), (4, "abcdxf")],
            "id long, s string",
        )
        got = {
            (r.id_a, r.id_b)
            for r in edit_distance_pairs(df, "s", "id", max_dist=2).collect()
        }
        assert got == {(3, 4)}

    def test_key_expression_column(self, spark):
        df = spark.createDataFrame(
            [(1, "The  Rain"), (2, "the rain"), (3, "the brain")],
            "id long, t string",
        )
        key = F.regexp_replace(F.lower("t"), " +", " ")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(df, key, "id", max_dist=1).collect()
        }
        assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}

    def test_rejects_zero_distance_budget(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, s string")
        with pytest.raises(ValueError):
            edit_distance_pairs(df, "s", "id", max_dist=0)

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame(
            [(i, f"string number {i:04d}") for i in range(40)],
            "id long, s string",
        )
        plan = (
            edit_distance_pairs(df, "s", "id", max_dist=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestEditDistanceIncremental:
    def test_only_batch_involving_pairs(self, spark):
        rows = [
            (1, "aaaa bbbb", False),
            (2, "aaaa bbbc", False),   # corpus-internal pair with 1
            (3, "aaaa bbbd", True),    # new: pairs with 1 and 2
            (4, "zzzz yyyy", True),    # new: no partner
        ]
        df = spark.createDataFrame(rows, "id long, s string, is_new boolean")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(
                df, "s", "id", max_dist=2, new_col="is_new"
            ).collect()
        }
        # (1,2) is corpus-internal -> excluded; batch-batch pairs allowed
        assert got == {(1, 3, 1), (2, 3, 1)}

    def test_matches_restricted_brute_force(self, spark):
        rows = _rand_corpus(seed=99, n=70)
        flagged = [(i, s, i % 3 == 0) for i, s in rows]
        df = spark.createDataFrame(
            flagged, "id long, s string, is_new boolean"
        )
        from qdrant_datafusion_spark.operators.fuzzy import (
            edit_distance_pairs,
        )

        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(
                df, "s", "id", max_dist=2, new_col="is_new"
            ).collect()
        }
        want = {
            (a, b, d)
            for a, b, d in _brute(rows, 2)
            if a % 3 == 0 or b % 3 == 0
        }
        assert got == want


class TestSetSimilarityPairs:
    def _corpus(self, seed, n=110):
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(40)]
        rows = []
        for i in range(n):
            s = rng.sample(vocab, rng.randint(1, 12))
            rows.append((i, s))
            if rng.random() < 0.35:  # near-identical partner
                t = list(s)
                for _ in range(rng.randint(0, 2)):
                    if rng.random() < 0.5 and len(t) > 1:
                        t.pop()
                    else:
                        c = rng.choice(vocab)
                        if c not in t:
                            t.append(c)
                rows.append((1000 + i, t))
        return rows

    def _brute(self, rows, t_num, t_den):
        want = set()
        for (i1, s1), (i2, s2) in itertools.combinations(rows, 2):
            a, b = set(s1), set(s2)
            inter, union = len(a & b), len(a | b)
            if inter * t_den >= t_num * union:
                want.add((min(i1, i2), max(i1, i2), inter, union))
        return want

    @pytest.mark.parametrize("t_num,t_den", [(1, 2), (7, 10), (1, 3), (1, 1)])
    def test_equals_brute_force(self, spark, t_num, t_den):
        from qdrant_datafusion_spark.operators.fuzzy import (
            set_similarity_pairs,
        )

        rows = self._corpus(seed=17 + t_num)
        df = spark.createDataFrame(rows, "id long, toks array<string>")
        got = {
            (r.id_a, r.id_b, r.inter, r.n_union)
            for r in set_similarity_pairs(
                df, "toks", "id", t_num, t_den
            ).collect()
        }
        assert got == self._brute(rows, t_num, t_den)

    def test_empty_sets_dropped(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import (
            set_similarity_pairs,
        )

        df = spark.createDataFrame(
            [(1, []), (2, []), (3, ["a", "b"]), (4, ["a", "b"])],
            "id long, toks array<string>",
        )
        got = {
            (r.id_a, r.id_b)
            for r in set_similarity_pairs(df, "toks", "id", 1, 2).collect()
        }
        assert got == {(3, 4)}  # empty-empty is NOT a pair

    def test_threshold_one_is_set_equality(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import (
            set_similarity_pairs,
        )

        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, ["b", "a", "a"]), (3, ["a", "b", "c"])],
            "id long, toks array<string>",
        )
        got = [
            (r.id_a, r.id_b, r.inter, r.n_union)
            for r in set_similarity_pairs(df, "toks", "id", 1, 1).collect()
        ]
        assert got == [(1, 2, 2, 2)]  # duplicates collapse; superset != equal

    def test_rejects_bad_threshold(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import (
            set_similarity_pairs,
        )

        df = spark.createDataFrame([(1, ["a"])], "id long, toks array<string>")
        with pytest.raises(ValueError):
            set_similarity_pairs(df, "toks", "id", 0, 2)
        with pytest.raises(ValueError):
            set_similarity_pairs(df, "toks", "id", 3, 2)

    def test_no_cartesian_in_plan(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import (
            set_similarity_pairs,
        )

        df = spark.createDataFrame(
            [(i, [f"w{i}", f"w{i+1}", "common"]) for i in range(30)],
            "id long, toks array<string>",
        )
        plan = (
            set_similarity_pairs(df, "toks", "id", 1, 2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestContainmentPairs:
    def _corpus(self, seed, n=100):
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(35)]
        rows = []
        for i in range(n):
            s = rng.sample(vocab, rng.randint(1, 12))
            rows.append((i, s))
            if rng.random() < 0.3:  # seed subsets and supersets
                if rng.random() < 0.5 and len(s) > 2:
                    rows.append((1000 + i, rng.sample(s, rng.randint(1, len(s) - 1))))
                else:
                    extra = [v for v in vocab if v not in s]
                    rows.append((1000 + i, s + rng.sample(extra, rng.randint(1, 4))))
        return rows

    @pytest.mark.parametrize("t_num,t_den", [(4, 5), (1, 2), (1, 1)])
    def test_equals_brute_force(self, spark, t_num, t_den):
        from qdrant_datafusion_spark.operators.fuzzy import containment_pairs

        rows = self._corpus(seed=29 + t_num)
        df = spark.createDataFrame(rows, "id long, toks array<string>")
        got = {
            (r.id_a, r.id_b, r.inter, r.n_a)
            for r in containment_pairs(df, "toks", "id", t_num, t_den).collect()
        }
        want = set()
        for (i1, s1), (i2, s2) in itertools.permutations(rows, 2):
            a, b = set(s1), set(s2)
            if a and b and len(a & b) * t_den >= t_num * len(a):
                want.add((i1, i2, len(a & b), len(a)))
        assert got == want

    def test_asymmetry(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import containment_pairs

        # small fully inside big: (small -> big) holds, reverse doesn't
        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, ["a", "b", "c", "d", "e", "f", "g", "h"])],
            "id long, toks array<string>",
        )
        got = [
            (r.id_a, r.id_b, r.containment)
            for r in containment_pairs(df, "toks", "id", 4, 5).collect()
        ]
        assert got == [(1, 2, 1.0)]

    def test_near_equal_sets_hold_both_directions(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import containment_pairs

        df = spark.createDataFrame(
            [(1, ["a", "b", "c", "d", "e"]), (2, ["a", "b", "c", "d", "x"])],
            "id long, toks array<string>",
        )
        got = {
            (r.id_a, r.id_b)
            for r in containment_pairs(df, "toks", "id", 4, 5).collect()
        }
        assert got == {(1, 2), (2, 1)}

    def test_rejects_bad_threshold(self, spark):
        from qdrant_datafusion_spark.operators.fuzzy import containment_pairs

        df = spark.createDataFrame([(1, ["a"])], "id long, toks array<string>")
        with pytest.raises(ValueError):
            containment_pairs(df, "toks", "id", 0, 5)
