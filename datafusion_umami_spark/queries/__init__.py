"""Operator-coverage query modules. Importing this package registers
every query into `datafusion_umami_spark.registry.REGISTRY`.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep walks the
registry in registration (= import) order under a budget, so modules
that were unverified in round 1 come first (TPC-H, joins, windows,
subqueries), then the rest of SURVEY.md §2, then the LLM-pipeline and
streaming modules whose queries are individually slower.
"""

from datafusion_umami_spark.queries import (  # noqa: F401
    tpch,
    joins,
    windows,
    subqueries,
    aggregates,
    functions_nested,
    dedup,
    relational,
    functions_scalar,
    sources_sinks,
    json_funcs,
    types_edges,
    udfs,
    recursive,
    h2o,
    clickbench,
    job_shapes,
    catalog_ddl,
    dataframe_ops,
    bucketing,
    asof,
    simsearch,
    textanalysis,
    multimodal,
    streaming_queries,
)
