"""Operator-coverage query modules. Importing this package registers
every query into `datafusion_umami_spark.registry.REGISTRY`."""

from datafusion_umami_spark.queries import (  # noqa: F401
    aggregates,
    asof,
    bucketing,
    catalog_ddl,
    clickbench,
    dataframe_ops,
    dedup,
    functions_nested,
    functions_scalar,
    h2o,
    joins,
    json_funcs,
    multimodal,
    recursive,
    relational,
    simsearch,
    sources_sinks,
    streaming_queries,
    subqueries,
    textanalysis,
    tpch,
    types_edges,
    udfs,
    windows,
)
