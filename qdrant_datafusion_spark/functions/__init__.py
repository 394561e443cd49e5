"""V_* function surface.

The reference declares these in its aspirational SQL corpus
(reference tests/bin/tests.sql) and implements none of them
(src/udfs.rs registers only an external JSON suite).  Here each is a real,
tested function:

- ``distance``:   v_search, v_distance, v_within, v_random — native Columns
- ``sparse``:     v_sparse_search — native map-lookup kernel + explode/join scale path
- ``multivector``: v_colbert MaxSim — native nested-HOF kernel
- ``composite``:  v_recommend, v_discover — example resolution + composite query
- ``fusion``:     v_fusion — true rank-based RRF via window functions
- ``json_fns``:   has_field, payload_get, payload contains — JSON payload surface
- ``text``:       match_text, token_count, quality/langid/fingerprint kernels
- ``geo``:        v_geo_distance haversine, v_gauss_decay

``register_all(spark)`` installs SQL-callable aliases for every function so
both ``df.select(v_search(...))`` and ``spark.sql("SELECT V_SEARCH(...)")``
work — the analogue of the reference's ``register_json_udfs``
(src/udfs.rs:13-16).
"""

from qdrant_datafusion_spark.functions.distance import (  # noqa: F401
    cosine_similarity,
    dot_product,
    euclid_distance,
    manhattan_distance,
    norm,
    v_distance,
    v_random,
    v_search,
    v_within,
)
from qdrant_datafusion_spark.functions.sparse import (  # noqa: F401
    sparse_dot_columns,
    v_sparse_search,
)
from qdrant_datafusion_spark.functions.multivector import v_colbert  # noqa: F401
from qdrant_datafusion_spark.functions.composite import (  # noqa: F401
    v_discover,
    v_recommend,
)
from qdrant_datafusion_spark.functions.fusion import rrf_fuse, v_fusion  # noqa: F401
from qdrant_datafusion_spark.functions.json_fns import (  # noqa: F401
    has_field,
    payload_contains,
    payload_get,
    payload_get_float,
)
from qdrant_datafusion_spark.functions.geo import (  # noqa: F401
    v_gauss_decay,
    v_geo_distance,
)
from qdrant_datafusion_spark.functions.text import (  # noqa: F401
    clean_text,
    doc_fingerprint,
    language_score,
    match_text,
    pii_counts,
    quality_score,
    redact_pii,
    strip_markup,
    token_count,
    word_shingles,
)
from qdrant_datafusion_spark.functions.registry import register_all  # noqa: F401
