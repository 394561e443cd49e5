"""Plan inspection utilities — how this engine proves its physical plans
are the ones a 100 TB deployment needs (pushdown reached the scan, top-k
avoided a global sort, small sides broadcast)."""

from qdrant_datafusion_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_take_ordered,
    pushed_filters,
    scan_schema_columns,
)
