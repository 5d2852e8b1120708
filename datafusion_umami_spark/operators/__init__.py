"""Helpers for capabilities the reference has but Spark lacks as a single
built-in: date_bin bucketing, recursive CTEs, as-of joins, MinHash-LSH
dedup, ANN search. Each composes built-in DataFrame ops (JVM-side) and
only drops to Pandas UDFs where semantics require."""
