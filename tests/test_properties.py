"""Property-based kernel tests (Hypothesis): random vectors/texts vs
NumPy/pure-Python oracles, exercised through the real Spark surface.

Strategy note: one Spark job per hypothesis example would be minutes-slow,
so each property collects a BATCH of generated rows into one DataFrame and
asserts element-wise — same coverage, two orders of magnitude fewer jobs.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    euclid_distance,
    manhattan_distance,
)
from qdrant_datafusion_spark.functions.sparse import sparse_dot_columns
from qdrant_datafusion_spark.functions.text import match_text, token_count

finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=4, max_size=4)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestDistanceProperties:
    @SETTINGS
    @given(st.lists(st.tuples(vec, vec), min_size=1, max_size=16))
    def test_kernels_match_numpy(self, spark, pairs):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "i int, a array<float>, b array<float>",
        )
        rows = df.select(
            "i",
            dot_product("a", "b").alias("dot"),
            euclid_distance("a", "b").alias("euc"),
            manhattan_distance("a", "b").alias("man"),
        ).collect()
        for r in rows:
            a = np.array(pairs[r.i][0], dtype=np.float32).astype(np.float64)
            b = np.array(pairs[r.i][1], dtype=np.float32).astype(np.float64)
            assert r.dot == pytest.approx(float(a @ b), rel=1e-9, abs=1e-9)
            assert r.euc == pytest.approx(float(np.linalg.norm(a - b)), rel=1e-9, abs=1e-9)
            assert r.man == pytest.approx(float(np.abs(a - b).sum()), rel=1e-9, abs=1e-9)

    @SETTINGS
    @given(st.lists(st.tuples(vec, vec), min_size=1, max_size=8))
    def test_cosine_bounded_and_symmetric(self, spark, pairs):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "i int, a array<float>, b array<float>",
        )
        rows = df.select(
            "i",
            cosine_similarity("a", "b").alias("ab"),
            cosine_similarity("b", "a").alias("ba"),
        ).collect()
        for r in rows:
            if r.ab is not None and not math.isnan(r.ab):
                assert -1.0000001 <= r.ab <= 1.0000001
                assert r.ab == pytest.approx(r.ba, rel=1e-12)


class TestSparseProperties:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.lists(st.integers(0, 50), min_size=0, max_size=6, unique=True),
                st.dictionaries(st.integers(0, 50), finite, max_size=5),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_sparse_dot_matches_python(self, spark, cases):
        rows = []
        for i, (idxs, qmap) in enumerate(cases):
            vals = [float(j % 7) / 7 for j in range(len(idxs))]
            rows.append((i, idxs, vals))
        df = spark.createDataFrame(rows, "i int, idx array<long>, val array<float>")
        for i, (idxs, qmap) in enumerate(cases):
            q = {int(k): float(np.float32(v)) for k, v in qmap.items()}
            got = (
                df.filter(F.col("i") == i)
                .select(sparse_dot_columns("idx", "val", q).alias("s"))
                .collect()[0]
                .s
            )
            vals = [float(np.float32(float(j % 7) / 7)) for j in range(len(idxs))]
            expected = sum(q.get(ix, 0.0) * v for ix, v in zip(idxs, vals))
            assert got == pytest.approx(expected, rel=1e-6, abs=1e-9)


words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0, max_size=12
)


class TestTextProperties:
    @SETTINGS
    @given(st.lists(words, min_size=1, max_size=10))
    def test_token_count_matches_split(self, spark, texts):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
        df = spark.createDataFrame(rows, "i int, text string")
        got = {r.i: r.n for r in df.select("i", token_count("text").alias("n")).collect()}
        for i, ws in enumerate(texts):
            assert got[i] == len([w for w in ws if w])

    @SETTINGS
    @given(words, words)
    def test_match_text_fraction(self, spark, doc_words, query_words):
        text = " ".join(doc_words)
        query = " ".join(query_words)
        df = spark.createDataFrame([(text,)], "text string")
        got = df.select(match_text("text", query).alias("m")).collect()[0].m
        # distinct-term semantics (shared with SQL MATCH_TEXT): repeated
        # query terms count once in numerator and denominator
        qterms = list(dict.fromkeys(w.lower() for w in query.split() if w))
        if not qterms:
            assert got == 0.0
        else:
            toks = {w.lower() for w in text.split() if w}
            expected = sum(1 for t in qterms if t in toks) / len(qterms)
            assert got == pytest.approx(expected)


class TestDedupProperties:
    edges = st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=25,
    )

    @SETTINGS
    @given(edges)
    def test_dup_clusters_matches_union_find(self, spark, pairs):
        from qdrant_datafusion_spark.operators import dup_clusters

        # pure-Python union-find reference
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in pairs:
            union(a, b)
        truth = {x: find(x) for x in parent}

        df = spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a long, id_b long"
        )
        got = {r.id: r.cluster_id for r in dup_clusters(df).collect()}
        assert got == truth

    @SETTINGS
    @given(
        edges,
        st.lists(st.integers(0, 5), min_size=31, max_size=31),
    )
    def test_select_canonical_matches_argmax(self, spark, pairs, scores):
        from qdrant_datafusion_spark.operators import dup_clusters, select_canonical

        ids = sorted({x for p in pairs for x in p} | {97})  # 97: always a singleton
        rows = [(i, scores[i % len(scores)]) for i in ids]
        df = spark.createDataFrame(rows, "id long, s long")
        clusters = dup_clusters(
            spark.createDataFrame(list(pairs), "id_a long, id_b long")
        )
        cl = {r.id: r.cluster_id for r in clusters.collect()}
        got = {
            r.id: (r.cluster_id, r.kept)
            for r in select_canonical(df, clusters, "id", "s").collect()
        }
        # python reference: per cluster keep max score, tie-break min id
        score = dict(rows)
        by_cluster: dict[int, list[int]] = {}
        for i in ids:
            by_cluster.setdefault(cl.get(i, i), []).append(i)
        for cid, members in by_cluster.items():
            best = max(members, key=lambda i: (score[i], -i))
            for i in members:
                assert got[i] == (cid, i == best), (cid, i, got[i])
        assert len(got) == len(ids)

    @SETTINGS
    @given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=12))
    def test_exact_dedup_partitions_the_input(self, spark, texts):
        from qdrant_datafusion_spark.operators import exact_dedup

        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "id long, text string")
        out = exact_dedup(df, "text", "id").collect()
        # dup_counts partition the input exactly; survivors are min ids
        assert sum(r.dup_count for r in out) == len(texts)
        norm = {}
        for i, t in enumerate(texts):
            norm.setdefault(t.strip().lower(), []).append(i)
        assert {r.id for r in out} == {min(v) for v in norm.values()}


class TestQuantizationProperties:
    vectors = st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=64),
        min_size=2,
        max_size=32,
    )

    @SETTINGS
    @given(vectors)
    def test_scalar_quant_bound_holds(self, spark, vec):
        from qdrant_datafusion_spark.operators.quantize import (
            scalar_dequantize,
            scalar_quantize,
        )

        df = spark.createDataFrame([(1, vec)], "id int, v array<double>")
        q = scalar_quantize(df, "v")
        row = q.select(
            "codes", "q_lo", "q_scale",
            scalar_dequantize("codes", "q_lo", "q_scale").alias("r"),
        ).collect()[0]
        assert all(0 <= c <= 255 for c in row.codes)
        bound = row.q_scale * 0.5 + 1e-9 + abs(row.q_lo) * 1e-12
        for x, xh in zip(vec, row.r):
            assert abs(x - xh) <= bound

    @SETTINGS
    @given(vectors)
    def test_binary_pack_matches_query_packer(self, spark, vec):
        from qdrant_datafusion_spark.operators.quantize import (
            binary_quantize,
            binary_quantize_query,
        )

        df = spark.createDataFrame([(1, vec)], "id int, v array<double>")
        words = binary_quantize(df, "v").select("bits").collect()[0].bits
        assert words == binary_quantize_query(vec)
        # unpack round-trip: bit d is set iff vec[d] > 0
        for d, x in enumerate(vec):
            w = words[d // 64] & ((1 << 64) - 1)
            assert bool(w >> (d % 64) & 1) == (x > 0.0)


class TestAsOfJoinProperties:
    """as_of_join vs pandas merge_asof (the industry-reference as-of
    implementation).  Right-side (key, ts) pairs are deduplicated before
    comparison — merge_asof breaks ties by input position while the
    operator uses an explicit seq column (pinned separately in
    test_temporal.py); on unique timestamps the two must agree exactly."""

    events = st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    )

    @SETTINGS
    @given(events, events, st.one_of(st.none(), st.integers(0, 200)))
    def test_backward_matches_merge_asof(self, spark, lefts, rights, tol):
        import pandas as pd

        from qdrant_datafusion_spark.operators.temporal import as_of_join

        lpdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)],
            columns=["k", "ts", "lid"],
        )
        rpdf = (
            pd.DataFrame(
                [(k, t, float(i)) for i, (k, t) in enumerate(rights)],
                columns=["k", "ts", "val"],
            )
            .drop_duplicates(["k", "ts"], keep="last")
            .sort_values("ts", kind="stable")
            .reset_index(drop=True)
        )
        expect = pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rpdf,
            on="ts",
            by="k",
            direction="backward",
            suffixes=("", "_r"),
            tolerance=tol,
        )
        # merge_asof keeps the matched value but not the matched ts when
        # joining on= — recover it by joining val back (vals are unique)
        want = {
            int(r.lid): (None if pd.isna(r.val) else r.val)
            for r in expect.itertuples()
        }

        left = spark.createDataFrame(lpdf, "k int, ts long, lid int")
        right = spark.createDataFrame(rpdf, "k int, ts long, val double")
        got = {
            r.lid: r.val_right
            for r in as_of_join(
                left, right, on="ts", by="k", value_cols=["val"], tolerance=tol
            ).collect()
        }
        assert got == want


class TestPackSequencesProperties:
    """pack_sequences vs an exact pure-Python replay of the greedy rule —
    the operator is deterministic, so the distributed result must equal
    the sequential reference bit-for-bit."""

    @SETTINGS
    @given(
        st.lists(st.integers(0, 50), min_size=1, max_size=60),
        st.integers(8, 40),
        st.integers(1, 4),
    )
    def test_matches_sequential_greedy(self, spark, toks, budget, buckets):
        from qdrant_datafusion_spark.operators.pipeline import pack_sequences

        docs = spark.createDataFrame(
            [(i, "w " * n) for i, n in enumerate(toks)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.bucket, r.pack_id, r.n_tokens)
            for r in pack_sequences(
                docs, budget=budget, num_buckets=buckets
            ).collect()
        }
        # sequential replay of the documented rule per bucket, id order
        expect = {}
        state = {}  # bucket -> (pack_id, fill, started)
        for i, n in enumerate(toks):
            b = i % buckets
            pack, fill, started = state.get(b, (0, 0, False))
            if not started:
                fill = n
            elif fill + n > budget:
                pack, fill = pack + 1, n
            else:
                fill += n
            state[b] = (pack, fill, True)
            expect[i] = (b, pack, n)
        assert got == expect


_json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)
_json_value = st.recursive(
    _json_scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=6), inner, max_size=4),
    ),
    max_leaves=12,
)


def _to_grpc_value(v) -> dict:
    """Plain JSON value → qdrant ``Value`` proto-JSON (what MessageToDict
    emits, int64 as string) — the test-side inverse of _grpc_value."""
    if v is None:
        return {"null_value": "NULL_VALUE"}
    if isinstance(v, bool):
        return {"bool_value": v}
    if isinstance(v, int):
        return {"integer_value": str(v)}
    if isinstance(v, float):
        return {"double_value": v}
    if isinstance(v, str):
        return {"string_value": v}
    if isinstance(v, list):
        return {"list_value": {"values": [_to_grpc_value(x) for x in v]}}
    return {
        "struct_value": {"fields": {k: _to_grpc_value(x) for k, x in v.items()}}
    }


class TestGrpcTranslationProperties:
    """The pure gRPC dict translations (sources.client) against
    structural invariants: payload Value decoding inverts the proto-JSON
    encoding for any JSON value, and every builder request produces a
    body whose oneof arms are exclusive and typed."""

    @SETTINGS
    @given(st.dictionaries(st.text(min_size=1, max_size=6), _json_value, max_size=4))
    def test_value_decode_inverts_proto_json(self, payload):
        from qdrant_datafusion_spark.sources.client import grpc_point_to_wire

        point = {
            "id": {"num": "7"},
            "payload": {k: _to_grpc_value(v) for k, v in payload.items()},
        }
        wire = grpc_point_to_wire(point)
        got = wire["payload"] or {}
        assert set(got) == set(payload)
        for k, v in payload.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, nan_ok=False)
            else:
                assert got[k] == v

    @SETTINGS
    @given(
        st.booleans(),
        st.one_of(st.integers(0, 2**31), st.text(min_size=1, max_size=8)),
        st.lists(
            st.one_of(
                st.integers(-(2**31), 2**31), st.text(min_size=1, max_size=6)
            ),
            min_size=1,
            max_size=5,
        ),
    )
    def test_query_body_match_arms_are_typed(self, with_payload, eq_value, any_values):
        from qdrant_datafusion_spark.sources.client import grpc_query_body

        body = grpc_query_body(
            {
                "collection_name": "c",
                "with_vectors": False,
                "with_payload": with_payload,
                "filter": {
                    "must": [
                        {"key": "a", "match": {"value": eq_value}},
                        {"key": "b", "match": {"any": any_values}},
                    ]
                },
            }
        )
        assert body["with_payload"] == {"enable": with_payload}
        eq_match = body["filter"]["must"][0]["field"]["match"]
        assert len(eq_match) == 1  # exactly one oneof arm
        arm, val = next(iter(eq_match.items()))
        assert arm == ("integer" if isinstance(eq_value, int) else "keyword")
        assert val == eq_value
        any_match = body["filter"]["must"][1]["field"]["match"]
        assert len(any_match) == 1
        arm = next(iter(any_match))
        if all(isinstance(v, int) for v in any_values):
            assert arm == "integers" and any_match[arm] == {"integers": any_values}
        else:
            assert arm == "keywords" and any_match[arm] == {
                "strings": [str(v) for v in any_values]
            }


class TestBpeBoundaryEncoding:
    """The core trick of operators/tokenizer.py: applying a BPE merge as
    a flat-string ``replace`` over double-separator boundaries must equal
    the canonical greedy left-to-right tuple scan for ARBITRARY symbol
    sequences — including pathological overlap runs (aaaa + (a,a))."""

    @staticmethod
    def _replace_merges(texts, n_merges):
        # pure-python mirror of the Spark/DuckDB string pipeline: python
        # str.replace shares the left-to-right non-overlapping contract
        from qdrant_datafusion_spark.operators.tokenizer import END_MARK, SEP

        B = SEP + SEP
        freq = {}
        for t in texts:
            for w in t.lower().split():
                freq[w] = freq.get(w, 0) + 1
        vocab = {
            B + B.join(list(w) + [END_MARK]) + B: n for w, n in freq.items()
        }
        merges = []
        for rank in range(1, n_merges + 1):
            counts = {}
            for s, n in vocab.items():
                syms = s.strip(SEP).split(B)
                for j in range(len(syms) - 1):
                    p = (syms[j], syms[j + 1])
                    counts[p] = counts.get(p, 0) + n
            if not counts:
                break
            (a, b), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, a, b, cnt))
            new_vocab = {}
            for s, n in vocab.items():
                s2 = s.replace(SEP + a + B + b + SEP, SEP + a + b + SEP)
                new_vocab[s2] = new_vocab.get(s2, 0) + n
            vocab = new_vocab
        return merges

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=10),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=1, max_value=6),
    )
    def test_replace_equals_greedy_scan(self, words, n_merges):
        from qdrant_datafusion_spark.operators.tokenizer import bpe_reference

        texts = [" ".join(words)]
        assert self._replace_merges(texts, n_merges) == bpe_reference(
            texts, n_merges
        )


class TestHilbertProperties:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(0, 255)),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_reference_walk(self, spark, pts):
        from qdrant_datafusion_spark.operators.layout import hilbert_value

        def xy2d(n, x, y):
            d, s = 0, n // 2
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x, y = n - 1 - x, n - 1 - y
                    x, y = y, x
                s //= 2
            return d

        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "i int, x long, y long",
        )
        rows = df.select(
            "i", hilbert_value(F.col("x"), F.col("y"), 8).alias("h")
        ).collect()
        for r in rows:
            x, y = pts[r.i]
            assert r.h == xy2d(256, x, y), (x, y)


class TestKmvProperties:
    @SETTINGS
    @given(
        st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                 min_size=1, max_size=200),
        st.integers(1, 5),
    )
    def test_estimate_invariant_under_duplication(self, spark, keys, copies):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build,
            kmv_estimate,
        )

        once = spark.createDataFrame([(k,) for k in keys], "k string")
        dup = spark.createDataFrame(
            [(k,) for k in keys for _ in range(copies)], "k string"
        )
        a = kmv_estimate(kmv_build(once, "k", 32), 32).collect()[0]
        b = kmv_estimate(kmv_build(dup, "k", 32), 32).collect()[0]
        # the sketch sees DISTINCT hashes only: duplication is invisible
        assert (a["n_sketch"], a["kth_hash"], a["est_distinct"]) == (
            b["n_sketch"], b["kth_hash"], b["est_distinct"],
        )
        exact = len(set(keys))
        if exact < 32:
            assert a["est_distinct"] == exact


class TestHistProperties:
    @SETTINGS
    @given(
        st.lists(st.integers(-1000, 1000), min_size=2, max_size=300),
        st.integers(2, 32),
        st.integers(1, 999_999),
    )
    def test_quantile_bucket_contains_rank(self, spark, vals, buckets, q):
        from qdrant_datafusion_spark.operators.sketch import (
            hist_build,
            hist_quantiles,
        )

        df = spark.createDataFrame([(v,) for v in vals], "c long")
        r = hist_quantiles(
            hist_build(df, "c", buckets), buckets, [q]
        ).collect()[0]
        true_v = sorted(vals)[r["rank_r"] - 1]
        assert r["b_lo"] <= true_v <= r["b_hi"]
        assert r["b_lo"] <= r["est"] <= r["b_hi"]


class TestResampleProperties:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(st.integers(0, 400), st.integers(-1000, 1000)),
            min_size=1,
            max_size=60,
            unique_by=lambda tv: tv[0],
        ),
        st.integers(5, 50),
    )
    def test_matches_python_interpolation(self, spark, obs, step):
        from qdrant_datafusion_spark.operators.temporal import (
            resample_interpolate,
        )

        df = spark.createDataFrame(
            [("k", t, v, i) for i, (t, v) in enumerate(obs)],
            "k string, t long, v long, e long",
        )
        got = {
            r["t"]: r["v"]
            for r in resample_interpolate(
                df, ts_col="t", by="k", value_col="v", step=step, seq_col="e"
            ).collect()
        }
        pts = sorted(obs)
        lo = -(-pts[0][0] // step) * step
        hi = (pts[-1][0] // step) * step
        want = {}
        for g in range(lo, hi + 1, step):
            prev = max((t, v) for t, v in pts if t <= g)
            nxt = min((t, v) for t, v in pts if t >= g)
            if nxt[0] > prev[0]:
                num = (nxt[1] - prev[1]) * (g - prev[0])
                den = nxt[0] - prev[0]
                w = prev[1] + int(num / den)  # trunc toward zero
            else:
                w = prev[1]
            want[g] = w
        assert got == want


class TestParagraphDedupProperties:
    @SETTINGS
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", "ii jj"]),
                min_size=1,
                max_size=5,
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_global_first_occurrence(self, spark, doc_units):
        """Random unit sequences over a tiny alphabet (heavy collisions
        guaranteed): the operator must equal the sequential
        first-occurrence fold exactly."""
        from qdrant_datafusion_spark.operators.dedup import (
            paragraph_dedup_global,
        )

        rows = [(i, "\n".join(us)) for i, us in enumerate(doc_units)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_units"], r["n_kept"], r["kept_text"])
            for r in paragraph_dedup_global(df).collect()
        }
        seen: set[str] = set()
        want = {}
        for i, us in enumerate(doc_units):
            kept = []
            for u in us:
                if u not in seen:
                    seen.add(u)
                    kept.append(u)
            want[i] = (len(us), len(kept), " ".join(kept))
        assert got == want

    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.sampled_from([-1, 1]),
            ),
            min_size=1,
            max_size=40,
        ).filter(lambda ps: any(y == 1 for _, y in ps)),
        st.integers(min_value=1, max_value=8),
    )
    def test_pr_curve_matches_python_fold(self, spark, points, nb):
        """Random (score, label) sets at random bucket counts: the
        bucketed curve must equal the pure-Python cumulative fold,
        including the HALF_UP ppm arithmetic."""
        from qdrant_datafusion_spark.operators.classify import pr_curve

        df = spark.createDataFrame(points, "margin long, y long")
        got = [tuple(r) for r in pr_curve(df, n_buckets=nb).collect()]
        lo = min(s for s, _ in points)
        hi = max(s for s, _ in points)
        width = hi - lo + 1
        buckets: dict[int, list[int]] = {}
        for s, y in points:
            b = (s - lo) * nb // width
            pos, neg = buckets.get(b, (0, 0))
            buckets[b] = (pos + (y == 1), neg + (y == -1))
        p_total = sum(p for p, _ in buckets.values())
        want = []
        tp = fp = 0
        for b in sorted(buckets, reverse=True):
            pos, neg = buckets[b]
            tp += pos
            fp += neg
            fn = p_total - tp
            thr_lo = lo + (b * width + nb - 1) // nb
            prec = (2 * 10**6 * tp + (tp + fp)) // (2 * (tp + fp))
            rec = (2 * 10**6 * tp + (tp + fn)) // (2 * (tp + fn))
            want.append((b, thr_lo, tp, fp, fn, prec, rec))
        assert got == want

    @SETTINGS
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", "ii jj"]),
                min_size=1,
                max_size=4,
            ),
            min_size=2,
            max_size=8,
        )
    )
    def test_incremental_with_tiny_bloom_stays_exact(self, spark, doc_units):
        """Random store/batch splits with a 32-bit Bloom (dense — false
        positives guaranteed): the exact-verify tier must scrub every FP
        so the result equals the pure set-membership fold."""
        from qdrant_datafusion_spark.operators.dedup import (
            paragraph_dedup_incremental,
        )

        half = len(doc_units) // 2
        store_rows = [(i, "\n".join(us)) for i, us in enumerate(doc_units[:half])]
        batch_rows = [
            (100 + i, "\n".join(us))
            for i, us in enumerate(doc_units[half:])
        ]
        store = spark.createDataFrame(store_rows, "doc_id long, text string")
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_units"], r["n_kept"], r["kept_text"])
            for r in paragraph_dedup_incremental(
                batch, store=store, m_bits=32, num_hashes=2
            ).collect()
        }
        store_units = {u for us in doc_units[:half] for u in us}
        seen: set[str] = set()
        want = {}
        for i, us in enumerate(doc_units[half:]):
            kept = []
            for u in us:
                if u not in store_units and u not in seen:
                    seen.add(u)
                    kept.append(u)
            want[100 + i] = (len(us), len(kept), " ".join(kept))
        assert got == want


class TestCdcMergeProperties:
    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),    # key
                st.sampled_from(["upsert", "delete"]),
                st.sampled_from(["a", "b", "c"]),
            ),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=0, max_value=19),
    )
    def test_scd2_incremental_equals_full_fold(self, spark, ops, cut_idx):
        """Random keyed changelogs with random upsert/delete interleavings
        and a random time split: merging the late half into the early
        half's SCD2 history must equal folding the whole log at once."""
        from qdrant_datafusion_spark.operators.cdc import (
            scd2_apply_changes,
            scd2_history,
        )

        rows = [
            (k, seq, op, v) for seq, (k, op, v) in enumerate(ops)
        ]
        cutoff = min(cut_idx, len(rows) - 1)
        schema = "k long, seq long, op string, val string"
        log = spark.createDataFrame(rows, schema)
        kwargs = dict(
            key_cols=["k"], order_cols=["seq"], op_col="op",
            delete_ops=("delete",),
        )
        full = scd2_history(log, **kwargs)
        base = scd2_history(log.filter(F.col("seq") <= cutoff), **kwargs)
        delta = log.filter(F.col("seq") > cutoff)
        if delta.take(1):
            merged = scd2_apply_changes(base, delta, **kwargs)
        else:
            merged = base
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )

    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),
                st.sampled_from(["upsert", "delete"]),
                st.sampled_from(["a", "b", "c"]),
            ),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=0, max_value=19),
    )
    def test_snapshot_merge_equals_full_fold(self, spark, ops, cut_idx):
        """apply_changes mirror of the SCD2 property: folding the late
        half into the early half's latest-state snapshot must equal the
        one-shot latest-state fold of the whole log."""
        from qdrant_datafusion_spark.operators.cdc import (
            apply_changes,
            cdc_latest_snapshot,
        )

        rows = [(k, seq, op, v) for seq, (k, op, v) in enumerate(ops)]
        cutoff = min(cut_idx, len(rows) - 1)
        schema = "k long, seq long, op string, val string"
        log = spark.createDataFrame(rows, schema)
        kwargs = dict(key_cols=["k"], order_cols=["seq"], op_col="op",
                      delete_ops=("delete",))
        full = cdc_latest_snapshot(log, **kwargs)
        base = cdc_latest_snapshot(
            log.filter(F.col("seq") <= cutoff), **kwargs
        )
        delta = log.filter(F.col("seq") > cutoff)
        merged = (
            apply_changes(base, delta, **kwargs) if delta.take(1) else base
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )


class TestHitsProperties:
    """operators.graph.hits vs a pure-Python fold of the same integer
    L1-normalized algebra, over random directed graphs — catches any
    divergence between the distributed join/groupBy formulation and the
    sequential definition (sum order, absent-key handling, HALF_UP
    boundaries)."""

    graphs = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
        unique=True,
    )

    @staticmethod
    def _reference(edges, iters, units=10**6):
        def hu(a, b):
            return (2 * a + b) // (2 * b)

        nodes = sorted({n for e in edges for n in e})
        h = {n: hu(units, len(nodes)) for n in nodes}
        a = None
        for _ in range(iters):
            raw = {n: 0 for n in nodes}
            for s, d in edges:
                raw[d] += h[s]
            tot = sum(raw.values())
            a = {n: hu(raw[n] * units, tot) for n in nodes}
            raw = {n: 0 for n in nodes}
            for s, d in edges:
                raw[s] += a[d]
            tot = sum(raw.values())
            h = {n: hu(raw[n] * units, tot) for n in nodes}
        return a, h

    @SETTINGS
    @given(graphs)
    def test_matches_pure_fold(self, spark, edges):
        from qdrant_datafusion_spark.operators.graph import hits

        df = spark.createDataFrame(list(edges), "src long, dst long")
        rows = hits(df, iters=2, materialize=False).collect()
        got_a = {r.node: r.auth_units for r in rows}
        got_h = {r.node: r.hub_units for r in rows}
        ref_a, ref_h = self._reference(list(edges), 2)
        assert got_a == ref_a
        assert got_h == ref_h
        # L1 mass invariant: each side normalizes to ~units (HALF_UP
        # quantization drifts at most 1 per node)
        assert abs(sum(got_a.values()) - 10**6) <= len(got_a)
        assert abs(sum(got_h.values()) - 10**6) <= len(got_h)
