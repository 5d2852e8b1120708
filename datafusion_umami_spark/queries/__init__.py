"""Operator-coverage query modules. Importing this package registers
every query into `datafusion_umami_spark.registry.REGISTRY`."""

from datafusion_umami_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    functions_nested,
    functions_scalar,
    joins,
    multimodal,
    relational,
    simsearch,
    subqueries,
    textanalysis,
    tpch,
    windows,
)
