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
    # -- random sampling (tests.sql:310-320)
    ("random_sample", """
        SELECT doc_id FROM docs ORDER BY V_RANDOM() LIMIT 5
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
