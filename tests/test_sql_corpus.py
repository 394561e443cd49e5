"""The reference's aspirational SQL corpus (tests/bin/tests.sql), rewritten
to this engine's registered surface and actually EXECUTED — the reference
never runs its corpus; we do.

Every statement runs via spark.sql over registered views with all V_*
functions installed (functions.registry.register_all).  Statements are
shaped after the corpus sections: basic search, filtered search, JSON
payload, sparse, distance/radius, geo boost, text match, aggregation over
search results, hybrid CTE fusion, batch lateral, random sampling,
by-id search via scalar subquery, and edge cases.
"""

from __future__ import annotations

import pytest

from qdrant_datafusion_spark.functions.registry import register_all

QV = "CAST(embedding AS ARRAY<DOUBLE>)"


#: (name, sql, min_rows) — executed verbatim; rows asserted >= min_rows
CORPUS = [
    # -- basic search (tests.sql:10-13)
    ("topk_search", f"""
        SELECT vec_id, V_SEARCH({QV}, (SELECT {QV} FROM emb WHERE vec_id = 1)) AS score
        FROM emb ORDER BY score DESC LIMIT 10
    """, 10),
    # -- search by point id via scalar subquery (tests.sql:28-35)
    ("search_by_id", f"""
        SELECT e.vec_id, V_SEARCH({QV.replace('embedding', 'e.embedding')},
               (SELECT {QV} FROM emb WHERE vec_id = 42)) AS score
        FROM emb e WHERE e.vec_id <> 42
        ORDER BY score DESC, e.vec_id LIMIT 5
    """, 5),
    # -- distance metric + radius predicate (tests.sql:42-51)
    ("distance_filter", f"""
        SELECT vec_id,
               V_DISTANCE({QV}, (SELECT {QV} FROM emb WHERE vec_id = 7), 'cosine') AS d
        FROM emb WHERE V_DISTANCE({QV}, (SELECT {QV} FROM emb WHERE vec_id = 7), 'cosine') < 0.9
        ORDER BY d ASC LIMIT 20
    """, 1),
    ("within_radius", f"""
        SELECT count(*) AS n FROM emb
        WHERE V_WITHIN({QV}, (SELECT {QV} FROM emb WHERE vec_id = 7), 100.0)
    """, 1),
    # -- JSON payload filtering (tests.sql:56-59, 203-207)
    ("payload_filter", """
        SELECT event_type, count(*) AS n
        FROM ev
        WHERE HAS_FIELD(props, 'k') AND CAST(get_json_object(props, '$.k') AS DOUBLE) > 50
        GROUP BY event_type HAVING count(*) >= 1
    """, 1),
    # -- full-text relevance (tests.sql:210-214)
    ("match_text", """
        SELECT doc_id, MATCH_TEXT(text, 'spark merge sort') AS relevance
        FROM docs WHERE MATCH_TEXT(text, 'spark merge sort') > 0.5
        ORDER BY relevance DESC, doc_id LIMIT 10
    """, 1),
    # -- geo decay boosting (tests.sql:282-303)
    ("geo_decay", """
        SELECT V_GAUSS_DECAY(V_GEO_DISTANCE(48.8566, 2.3522, 52.52, 13.405), 500000.0) AS boost
    """, 1),
    # -- aggregation over search results (tests.sql:233-242)
    ("agg_over_search", f"""
        WITH scored AS (
          SELECT label, V_SEARCH({QV}, (SELECT {QV} FROM emb WHERE vec_id = 1)) AS score
          FROM emb
        )
        SELECT label, count(*) AS n, max(score) AS best, avg(score) AS mean
        FROM scored GROUP BY label HAVING count(*) >= 3
    """, 1),
    # -- hybrid two-branch CTE fusion on id (tests.sql:175-196 shape)
    ("hybrid_cte", f"""
        WITH dense AS (
          SELECT vec_id AS id, V_SEARCH({QV}, (SELECT {QV} FROM emb WHERE vec_id = 1)) AS s
          FROM emb ORDER BY s DESC LIMIT 50
        ),
        alt AS (
          SELECT vec_id AS id, V_SEARCH({QV}, (SELECT {QV} FROM emb WHERE vec_id = 2)) AS s
          FROM emb ORDER BY s DESC LIMIT 50
        )
        SELECT COALESCE(d.id, a.id) AS id,
               COALESCE(d.s, 0) * 0.7 + COALESCE(a.s, 0) * 0.3 AS fused
        FROM dense d FULL OUTER JOIN alt a ON d.id = a.id
        ORDER BY fused DESC LIMIT 10
    """, 10),
    # -- batch lateral search (tests.sql:327-344)
    ("lateral_batch", f"""
        SELECT q.qid, t.vec_id, t.score
        FROM (VALUES (1), (2)) AS q(qid),
        LATERAL (
          SELECT e.vec_id, V_SEARCH(CAST(e.embedding AS ARRAY<DOUBLE>),
                 (SELECT {QV} FROM emb WHERE vec_id = 10)) AS score
          FROM emb e ORDER BY score DESC LIMIT 3
        ) t
    """, 6),
    # -- random sampling (tests.sql:310-320); V_RANDOM is SQL-defined over
    # rand() so it sits in the select list, and the sort references the
    # alias (the bare ORDER BY V_RANDOM() corpus form goes through
    # corpus_sql, which rewrites it to rand() — covered below)
    ("random_sample", """
        SELECT doc_id FROM (
          SELECT doc_id, V_RANDOM() AS r FROM docs
        ) ORDER BY r LIMIT 5
    """, 5),
    # -- sparse search over the hetero fixture (tests.sql:67-77)
    ("sparse_search", """
        SELECT id, V_SPARSE_SEARCH(keywords_indices, keywords_values,
                                   array(0L, 5L), array(1.0D, 2.0D)) AS score
        FROM hetero ORDER BY score DESC NULLS LAST, id LIMIT 3
    """, 3),
    # -- colbert multi-vector rerank (tests.sql:157-168)
    ("colbert", """
        SELECT id, V_COLBERT(multi_embeddings,
                             array(array(0.7D, 0.8D), array(0.9D, 0.1D))) AS maxsim
        FROM hetero WHERE multi_embeddings IS NOT NULL
        ORDER BY maxsim DESC LIMIT 1
    """, 1),
    # -- CASE boost (tests.sql:258-279)
    ("case_boost", f"""
        SELECT vec_id,
               V_SEARCH({QV}, (SELECT {QV} FROM emb WHERE vec_id = 1))
               * CASE WHEN label = 0 THEN 1.5 ELSE 1.0 END AS boosted
        FROM emb ORDER BY boosted DESC, vec_id LIMIT 10
    """, 10),
    # -- edge: empty query vector is NULL-scored, not an error (tests.sql:390-392)
    ("empty_vector_edge", f"""
        SELECT vec_id FROM emb
        WHERE V_SEARCH({QV}, array()) IS NOT NULL LIMIT 1
    """, 0),
    # -- recommendation with NULL negatives (tests.sql:83-114, 395-398)
    ("recommend_null_neg", f"""
        SELECT vec_id, V_RECOMMEND({QV},
               array((SELECT {QV} FROM emb WHERE vec_id = 1),
                     (SELECT {QV} FROM emb WHERE vec_id = 2)),
               NULL) AS score
        FROM emb WHERE vec_id NOT IN (1, 2)
        ORDER BY score DESC, vec_id LIMIT 5
    """, 5),
    # -- discovery: target + weighted context (tests.sql:121-137)
    ("discover", f"""
        SELECT vec_id, V_DISCOVER({QV},
               (SELECT {QV} FROM emb WHERE vec_id = 3),
               array((SELECT {QV} FROM emb WHERE vec_id = 4)),
               array(0.5D)) AS score
        FROM emb ORDER BY score DESC, vec_id LIMIT 5
    """, 5),
    # -- edge: very high-dimensional sparse indices (tests.sql:401-407)
    ("high_dim_sparse_edge", """
        SELECT id, V_SPARSE_SEARCH(keywords_indices, keywords_values,
               array(1L, 100L, 500L, 1000L, 5000L, 10000L, 50000L, 100000L),
               array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)) AS score
        FROM hetero ORDER BY score DESC NULLS LAST, id LIMIT 3
    """, 3),
]


@pytest.fixture(scope="module", autouse=True)
def corpus_views(spark, sf_dir):
    from qdrant_datafusion_spark import fixtures

    register_all(spark)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView("emb")
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("docs")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("ev")
    fixtures.hetero_df(spark).createOrReplaceTempView("hetero")


@pytest.mark.parametrize("name,sql,min_rows", CORPUS, ids=[c[0] for c in CORPUS])
def test_corpus_statement_runs(spark, name, sql, min_rows):
    rows = spark.sql(sql).collect()
    assert len(rows) >= min_rows, f"{name}: {len(rows)} rows"


def test_recommend_null_neg_equals_search_on_mean(spark):
    """V_RECOMMEND(v, pos, NULL) must equal V_SEARCH(v, mean(pos)) — the
    documented NULL-negatives semantics, asserted row-by-row in SQL."""
    n = spark.sql(f"""
        SELECT count(*) AS n FROM emb
        WHERE ABS(
          V_RECOMMEND({QV}, array((SELECT {QV} FROM emb WHERE vec_id = 1),
                                  (SELECT {QV} FROM emb WHERE vec_id = 2)), NULL)
          - V_SEARCH({QV}, V_MEAN_VEC(array(
                (SELECT {QV} FROM emb WHERE vec_id = 1),
                (SELECT {QV} FROM emb WHERE vec_id = 2))))
        ) > 1e-12
    """).collect()[0].n
    assert n == 0


def test_v_random_sort_is_native_rand(spark):
    """The corpus's ``ORDER BY V_RANDOM()`` resolves to native rand():
    no Python UDF node anywhere in the plan (V_RANDOM was the last
    surviving row-at-a-time lambda in the SQL surface), and the rewrite
    itself is clause-position exact."""
    from qdrant_datafusion_spark.fixtures import CORPUS_COLL
    from qdrant_datafusion_spark.sql_dialect import corpus_sql

    resolved = corpus_sql(
        "SELECT doc_id FROM docs ORDER BY V_RANDOM() LIMIT 5", CORPUS_COLL,
    )
    assert "V_RANDOM" not in resolved and "rand()" in resolved
    df = spark.sql(resolved)
    assert len(df.collect()) == 5
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in physical
    assert "ArrowEvalPython" not in physical


class TestVerbatimCorpus:
    """The corpus call shapes Spark's parser can't take directly —
    named-field V_SEARCH, by-id V_SEARCH, bracket arrays, payload arrows —
    copied VERBATIM from /root/reference/tests/bin/tests.sql and resolved
    through sql_dialect.corpus_sql against a registered collection."""

    @pytest.fixture(scope="class")
    def corpus_view(self, spark):
        from qdrant_datafusion_spark.fixtures import CORPUS_COLL, corpus_df

        register_all(spark)
        corpus_df(spark).createOrReplaceTempView("collection_name")
        return CORPUS_COLL

    def _run(self, spark, corpus_view, sql):
        from qdrant_datafusion_spark.sql_dialect import corpus_sql

        return spark.sql(corpus_sql(sql, corpus_view)).collect()

    def test_named_vector_search_verbatim(self, spark, corpus_view):
        # tests/bin/tests.sql:15-19
        rows = self._run(spark, corpus_view, """
SELECT id, payload, V_SEARCH('text_embedding', [0.1, 0.2, 0.3]) as score
FROM collection_name
ORDER BY score DESC
LIMIT 10;
""")
        assert len(rows) == 10  # runs; dim-3 query on dim-2 field -> NULL scores

    def test_named_vector_search_matching_dim(self, spark, corpus_view):
        rows = self._run(spark, corpus_view, """
SELECT id, V_SEARCH('text_embedding', [0.1, 0.9]) as score
FROM collection_name
ORDER BY score DESC
LIMIT 3;
""")
        assert rows[0].id == "43cf51e2-8777-4f52-bc74-c2cbde0c8b04"
        assert rows[0].score == pytest.approx(1.0)  # exact vector match

    def test_v_search_with_bound_parameters(self, spark, corpus_view):
        """A V_* query with spark.sql named-parameter binding: the query
        vector and k arrive via args= (:q / :k), never f-string
        interpolation — the convention for SQL built from runtime
        values (the v_search_udtf gate binds the same way)."""
        rows = spark.sql(
            """
            SELECT id, V_SEARCH(text_embedding, :q) AS score
            FROM collection_name
            ORDER BY score DESC, id
            LIMIT :k
            """,
            args={"q": [0.1, 0.9], "k": 3},
        ).collect()
        assert len(rows) == 3
        assert rows[0].id == "43cf51e2-8777-4f52-bc74-c2cbde0c8b04"
        assert rows[0].score == pytest.approx(1.0)

    def test_search_by_point_id_verbatim(self, spark, corpus_view):
        # tests/bin/tests.sql:21-25
        rows = self._run(spark, corpus_view, """
SELECT id, payload, V_SEARCH('43cf51e2-8777-4f52-bc74-c2cbde0c8b04') as score
FROM collection_name
ORDER BY score DESC
LIMIT 10;
""")
        assert len(rows) == 10
        assert rows[0].id == "43cf51e2-8777-4f52-bc74-c2cbde0c8b04"
        assert rows[0].score == pytest.approx(1.0)  # self-similarity

    def test_multiple_named_searches_verbatim(self, spark, corpus_view):
        # tests/bin/tests.sql:27-35 — text (cosine) + image (dot: metric
        # comes from collection config, so image scores are dot products)
        rows = self._run(spark, corpus_view, """
SELECT
    id,
    V_SEARCH('text_embedding', [0.1, 0.2]) as text_score,
    V_SEARCH('image_embedding', [0.3, 0.4, 0.5]) as image_score,
    payload
FROM collection_name
ORDER BY text_score * 0.7 + image_score * 0.3 DESC
LIMIT 20;
""")
        assert len(rows) == 15
        by_id = {r.id: r for r in rows}
        # dot metric: doc-2 image [0.1,0.7,0.2] . [0.3,0.4,0.5] = 0.41
        assert by_id["doc-2"].image_score == pytest.approx(0.41)
        assert all(r.text_score is not None for r in rows)

    def test_multi_vector_fusion_verbatim(self, spark, corpus_view):
        # tests/bin/tests.sql:350-383 — named fields, payload arrows with
        # boolean compares, bracket array of column refs, scalar V_FUSION
        rows = self._run(spark, corpus_view, """
WITH
text_search AS (
    SELECT
        id,
        V_SEARCH('text_embedding', [0.1, 0.2]) as text_score
    FROM collection_name
    WHERE payload->'language' = 'en'
    ORDER BY text_score DESC
    LIMIT 50
),
image_search AS (
    SELECT
        id,
        V_SEARCH('image_embedding', [0.3, 0.4, 0.5]) as image_score
    FROM collection_name
    WHERE payload->'has_thumbnail' = true
    ORDER BY image_score DESC
    LIMIT 50
)
SELECT
    c.id,
    c.payload,
    V_FUSION([t.text_score, i.image_score], 'rrf') *
    CASE
        WHEN c.payload->'verified' = true THEN 1.2
        ELSE 1.0
    END as final_score
FROM collection_name c
JOIN text_search t ON c.id = t.id
JOIN image_search i ON c.id = i.id
WHERE c.payload->'status' = 'published'
ORDER BY final_score DESC
LIMIT 10;
""")
        # en + thumbnail + published: the uuid point, doc-2, and the ten
        # named example points (LIMIT 10 keeps the best ten)
        ids = {r.id for r in rows}
        assert len(rows) == 10
        assert "43cf51e2-8777-4f52-bc74-c2cbde0c8b04" in ids
        assert all(r.final_score is not None for r in rows)
        # doc-2 is the only unverified candidate: no 1.2 boost -> never #1
        assert rows[0].id != "doc-2"

    def test_empty_vector_search_verbatim(self, spark, corpus_view):
        # tests/bin/tests.sql:390-392
        rows = self._run(spark, corpus_view, """
SELECT id FROM collection_name
WHERE V_SEARCH([]) IS NOT NULL
LIMIT 1;
""")
        assert rows == []  # empty query -> NULL scores, handled gracefully


class TestFullCorpusFile:
    """EVERY statement of the reference's tests/bin/tests.sql executed
    verbatim through the dialect resolver against the kitchen-sink corpus
    collection — the 'a reference user can run every query they run
    today' proof.  No skips: all 32 statements must execute."""

    @pytest.fixture(scope="class")
    def corpus_view(self, spark):
        from qdrant_datafusion_spark.fixtures import CORPUS_COLL, corpus_df

        register_all(spark)
        corpus_df(spark).createOrReplaceTempView("collection_name")
        return CORPUS_COLL

    @staticmethod
    def _statements():
        import re as _re

        src = open("/root/reference/tests/bin/tests.sql").read()
        stmts = [s for s in src.split(";")]
        return [
            s.strip() for s in stmts
            if _re.sub(r"--[^\n]*", "", s).strip()
        ]

    def test_every_statement_executes(self, spark, corpus_view):
        from qdrant_datafusion_spark.sql_dialect import corpus_sql

        stmts = self._statements()
        assert len(stmts) == 32  # the whole file, nothing filtered out
        failures = []
        for i, s in enumerate(stmts):
            try:
                spark.sql(corpus_sql(s, corpus_view)).collect()
            except Exception as e:  # noqa: BLE001 - collecting a report
                head = " ".join(s.split())[:90]
                failures.append(f"#{i}: {head} -> {str(e)[:160]}")
        assert not failures, "\n".join(failures)

    def test_value_spot_checks(self, spark, corpus_view):
        from qdrant_datafusion_spark.sql_dialect import corpus_sql

        def run(sql):
            return spark.sql(corpus_sql(sql, corpus_view)).collect()

        # @> containment + nested arrows (tests.sql:217-226): every row
        # carries tags ["electronics","sale"] but only country=USA passes
        rows = run("""
SELECT id, payload->'address'->'city' as city
FROM collection_name
WHERE payload->'address'->'country' = 'USA'
  AND payload->'tags' @> '["electronics"]'
""")
        assert len(rows) == 14 and all(r.city == "Berlin" for r in rows)

        # MATCH_TEXT over the description payload (tests.sql:210-214)
        rows = run("""
SELECT id, MATCH_TEXT(payload->'description', 'machine learning') as text_score
FROM collection_name
WHERE MATCH_TEXT(payload->'description', 'machine learning') > 0.0
ORDER BY text_score DESC
LIMIT 10
""")
        assert len(rows) == 10 and rows[0].text_score == pytest.approx(1.0)

        # by-id recommend over a REAL id resolves to that point's vector
        # (tests.sql:395-398) — valid_id ranks itself first
        rows = run("""
SELECT id, V_RECOMMEND(['valid_id'], NULL) as score
FROM collection_name
ORDER BY score DESC
LIMIT 5
""")
        assert rows[0].id == "valid_id" and rows[0].score == pytest.approx(1.0)

        # named sparse search scores by index-overlap dot product
        # (tests.sql:73-77): the named example points share indices 10/20/30
        rows = run("""
SELECT id, V_SPARSE_SEARCH('sparse_text', [10, 20, 30], [0.5, 0.3, 0.7]) as score
FROM collection_name
ORDER BY score DESC
LIMIT 10
""")
        expect = 0.5 * 0.5 + 0.3 * 0.3 + 0.7 * 0.7
        assert rows[0].score == pytest.approx(expect)

        # discovery with named field + context ids (tests.sql:130-137)
        rows = run("""
SELECT id, V_DISCOVER(
    'text_embedding',
    [0.1, 0.2],
    [['ctx_id1', 0.8], ['ctx_id2', 0.2]]
) as score
FROM collection_name
ORDER BY score DESC
LIMIT 10
""")
        assert len(rows) == 10 and rows[0].score is not None


class TestAdversarialLiterals:
    """String literals CONTAINING dialect syntax must pass through the
    textual resolvers untouched (round-7 verdict hardening): the
    mask/restore lexer in corpus_sql hides every plain literal from the
    regex passes, keeping only true operator operands visible."""

    def _resolve(self, sql):
        from qdrant_datafusion_spark.fixtures import CORPUS_COLL
        from qdrant_datafusion_spark.sql_dialect import corpus_sql

        return corpus_sql(sql, CORPUS_COLL)

    def test_arrow_inside_literal_survives(self):
        lit = "'p->''k'' chain'"
        out = self._resolve(
            f"SELECT id FROM collection_name WHERE payload->>'category' <> {lit}"
        )
        assert lit in out  # the literal is verbatim
        assert "get_json_object(payload, '$.category')" in out  # real arrow resolved

    def test_containment_inside_literal_survives(self):
        lit = "'x @> ''[a]'' y'"
        out = self._resolve(f"SELECT id FROM collection_name WHERE id <> {lit}")
        assert lit in out
        assert "array_except" not in out  # no containment rewrite fired

    def test_brackets_inside_literal_not_arrayified(self):
        out = self._resolve(
            "SELECT 'arr [1, 2]' AS note, id FROM collection_name LIMIT 1"
        )
        assert "'arr [1, 2]'" in out
        assert "array(" not in out

    def test_double_dash_inside_literal_is_not_a_comment(self):
        out = self._resolve(
            "SELECT id FROM collection_name WHERE id <> 'a -- b' LIMIT 1"
        )
        assert "'a -- b'" in out and "LIMIT 1" in out

    def test_v_random_text_inside_literal_survives(self):
        out = self._resolve(
            "SELECT 'call V_RANDOM() later' AS note, id "
            "FROM collection_name LIMIT 1"
        )
        assert "'call V_RANDOM() later'" in out

    def test_real_comment_still_stripped(self):
        out = self._resolve(
            "SELECT id FROM collection_name -- tail [1] ->'k' @> '[x]'\nLIMIT 1"
        )
        assert "tail" not in out and "LIMIT 1" in out

    def test_adversarial_statement_executes(self, spark):
        from qdrant_datafusion_spark.fixtures import CORPUS_COLL, corpus_df
        from qdrant_datafusion_spark.sql_dialect import corpus_sql

        register_all(spark)
        corpus_df(spark).createOrReplaceTempView("collection_name")
        rows = spark.sql(
            corpus_sql(
                "SELECT id, 'x @> ''[a]'' -- not a comment' AS trap\n"
                "FROM collection_name -- real [1] comment ->'k'\n"
                "WHERE payload->>'category' <> 'p->''k'''\n"
                "ORDER BY id LIMIT 3",
                CORPUS_COLL,
            )
        ).collect()
        assert len(rows) == 3
        assert all(r["trap"] == "x @> '[a]' -- not a comment" for r in rows)

    def test_property_random_literal_payloads(self):
        """Property sweep: any literal built from dialect-colliding
        fragments survives resolution byte-for-byte."""
        import itertools

        frags = ["->", "->>", "@>", "[1, 2]", "''", " -- ", "V_RANDOM()",
                 "->'k'", "@> '[a]'".replace("'", "''"), "(", ")", ","]
        for combo in itertools.permutations(frags, 2):
            body = " ".join(combo)
            lit = "'" + body + "'"
            out = self._resolve(
                f"SELECT id FROM collection_name WHERE id <> {lit} LIMIT 1"
            )
            assert lit in out, f"literal corrupted for body {body!r}"
