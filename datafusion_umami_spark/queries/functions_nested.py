"""Array / map / struct functions + unnest (explode).

Covers SURVEY.md §2.9 (reference `datafusion/functions-nested/src/`:
array_has, cardinality, concat, distance, element/slice, flatten,
make_array, map ops, min/max, position, remove, repeat, replace, resize,
reverse, set ops, sort, to_string) and §2.10 UnnestExec
(physical-plan/src/unnest.rs:60) → explode/posexplode/inline.

embeddings.embedding is array<float>; Spark higher-order functions
(transform/filter/aggregate/zip_with) are the JVM-side evaluation path —
the oracle twins use DuckDB list_* lambdas.

Float note: element-wise float32 math upcast to double can differ between
engines; distance/norm outputs are rounded to 6 digits on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.functions import array_distance, array_replace_all, array_resize
from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# PRECONDITION (r12 ANSI-crash-class audit): the element_at(embedding,
# <literal index>) calls in this module ride the generator contract
# that `embeddings.embedding` is fixed 64-dim and non-empty
# (TESTDATA.md).  Under the session's pinned ANSI mode element_at
# THROWS on an empty array where DuckDB's list[i] yields NULL — the
# same crash class fenced in agg_nth_value (data-dependent index) and
# the zero-norm cosine batch (data-dependent value).  These specs
# exercise the array-function SURFACE on schema-shaped data, so the
# fixed-dim precondition is documented rather than fenced; a pipeline
# ingesting UNTRUSTED variable-length arrays must fence with
# try_element_at / size() guards first.

register_sql(
    "arr_basic_ops",
    """
    SELECT vec_id,
           CAST(size(embedding) AS BIGINT) AS dim,
           CAST(element_at(embedding, 1) AS DOUBLE) AS first_elem,
           CAST(element_at(embedding, -1) AS DOUBLE) AS last_elem,
           CAST(array_max(embedding) AS DOUBLE) AS mx,
           CAST(array_min(embedding) AS DOUBLE) AS mn,
           CAST(size(slice(embedding, 5, 10)) AS BIGINT) AS slice_len,
           CAST(element_at(reverse(embedding), 1) AS DOUBLE) AS rev_first
    FROM embeddings WHERE vec_id < 100
    """,
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[-1] AS DOUBLE) AS last_elem,
           CAST(list_max(embedding) AS DOUBLE) AS mx,
           CAST(list_min(embedding) AS DOUBLE) AS mn,
           CAST(len(embedding[5:14]) AS BIGINT) AS slice_len,
           CAST(list_reverse(embedding)[1] AS DOUBLE) AS rev_first
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("array", "nested"),
)

# Array outputs are projected through array_join/array_to_string: the
# driver's pandas canonicalizer cannot sort list-valued cells (reference
# sqllogictest test_files/array.slt prints arrays as text for the same
# portability reason).
register_sql(
    "arr_literal_setops",
    """
    SELECT t.id,
           array_contains(t.xs, 3) AS has3,
           arrays_overlap(t.xs, array(9, 10)) AS overlaps,
           CAST(array_position(t.xs, 4) AS BIGINT) AS pos4,
           array_join(transform(array_sort(array_distinct(t.xs)),
                                v -> CAST(v AS STRING)), ',') AS dedup,
           array_join(transform(array_sort(array_union(t.xs, array(99))),
                                v -> CAST(v AS STRING)), ',') AS with99,
           array_join(transform(array_sort(array_intersect(t.xs, array(1, 2, 99))),
                                v -> CAST(v AS STRING)), ',') AS common,
           array_join(transform(array_sort(array_except(t.xs, array(1))),
                                v -> CAST(v AS STRING)), ',') AS no1,
           array_join(transform(array_remove(t.xs, 2),
                                v -> CAST(v AS STRING)), ',') AS no2,
           array_join(array_sort(transform(t.xs, v -> CAST(v AS STRING))), '|') AS joined,
           array_join(transform(flatten(array(t.xs, array(7, 8))),
                                v -> CAST(v AS STRING)), ',') AS flat,
           array_join(transform(array_repeat(t.id, 3),
                                v -> CAST(v AS STRING)), ',') AS rep,
           array_join(transform(sequence(1, t.id),
                                v -> CAST(v AS STRING)), ',') AS seq
    FROM (SELECT id, array(CAST(id AS INT) % 5 + 1, 2, 3, 4, 2) AS xs
          FROM range(1, 6) ) t
    """,
    oracle="""
    SELECT t.id,
           list_contains(t.xs, 3) AS has3,
           len(list_intersect(t.xs, [9, 10])) > 0 AS overlaps,
           CAST(list_position(t.xs, 4) AS BIGINT) AS pos4,
           array_to_string(list_sort(list_distinct(t.xs)), ',') AS dedup,
           array_to_string(list_sort(list_distinct(list_concat(t.xs, [99]))), ',') AS with99,
           array_to_string(list_sort(list_intersect(t.xs, [1, 2, 99])), ',') AS common,
           array_to_string(list_sort(list_filter(list_distinct(t.xs), x -> x <> 1)), ',') AS no1,
           array_to_string(list_filter(t.xs, x -> x <> 2), ',') AS no2,
           array_to_string(list_sort(list_transform(t.xs, x -> CAST(x AS VARCHAR))), '|') AS joined,
           array_to_string(list_concat(t.xs, [7, 8]), ',') AS flat,
           array_to_string([CAST(t.id AS BIGINT) for i in range(3)], ',') AS rep,
           array_to_string(range(1, CAST(t.id AS BIGINT) + 1), ',') AS seq
    FROM (SELECT range AS id, [CAST(range AS INT) % 5 + 1, 2, 3, 4, 2] AS xs
          FROM range(1, 6)) t
    """,
    tags=("array", "set-ops"),
)

register_sql(
    "arr_higher_order",
    """
    SELECT vec_id,
           ROUND(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x),
                           CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6) AS norm2,
           CAST(size(filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           ROUND(CAST(element_at(transform(embedding, x -> x * 2.0), 1) AS DOUBLE), 6) AS first_x2
    FROM embeddings WHERE vec_id < 50
    """,
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 6) AS norm2,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           ROUND(CAST(list_transform(embedding, x -> x * 2.0)[1] AS DOUBLE), 6) AS first_x2
    FROM embeddings WHERE vec_id < 50
    """,
    tags=("array", "higher-order", "lambda"),
)


@register(
    "arr_distance_resize_replace",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 30)
    SELECT id_a, id_b,
           ROUND(sqrt(list_sum(list_transform(list_zip(ea, eb),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 6) AS l2_dist,
           CAST(len(list_concat(ea, list_transform(range(80), x -> 0.0))[1:80]) AS BIGINT) AS resized_len,
           CAST(list_concat(ea, list_transform(range(80), x -> 0.0))[1:80][80] AS DOUBLE) AS pad_elem
    FROM pairs
    """,
    tags=("array", "distance", "resize", "helpers"),
)
def arr_distance_resize_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distance / array_resize helpers (reference
    functions-nested distance.rs, resize.rs) over consecutive embedding
    pairs. Self-join on vec_id+1 is an equi-join — shuffle-friendly."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    ea = F.transform(F.col("a.embedding"), lambda x: x.cast("double"))
    eb = F.transform(F.col("b.embedding"), lambda x: x.cast("double"))
    resized = array_resize(F.col("a.embedding"), 80, 0.0)
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .where(F.col("a.vec_id") < 30)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(array_distance(ea, eb), 6).alias("l2_dist"),
            F.size(resized).cast("bigint").alias("resized_len"),
            F.element_at(resized, 80).cast("double").alias("pad_elem"),
        )
    )


register_sql(
    "map_struct_ops",
    """
    SELECT t.id,
           element_at(t.m, 'a') AS a_val,
           CAST(size(t.m) AS BIGINT) AS m_size,
           array_join(array_sort(map_keys(t.m)), ',') AS keys_sorted,
           t.st.x AS struct_x,
           t.st.y AS struct_y
    FROM (SELECT id,
                 map('a', id * 10, 'b', id * 20) AS m,
                 named_struct('x', id, 'y', concat('row', CAST(id AS STRING))) AS st
          FROM range(1, 5)) t
    """,
    oracle="""
    SELECT t.id,
           m['a'][1] AS a_val,
           CAST(cardinality(t.m) AS BIGINT) AS m_size,
           array_to_string(list_sort(map_keys(t.m)), ',') AS keys_sorted,
           t.st.x AS struct_x,
           t.st.y AS struct_y
    FROM (SELECT range AS id,
                 map(['a', 'b'], [range * 10, range * 20]) AS m,
                 {'x': range, 'y': concat('row', CAST(range AS VARCHAR))} AS st
          FROM range(1, 5)) t
    """,
    tags=("map", "struct"),
)

# --- unnest / explode ------------------------------------------------------
register_sql(
    "unnest_explode",
    """
    SELECT vec_id, CAST(pos AS BIGINT) AS pos, CAST(val AS DOUBLE) AS val
    FROM (SELECT vec_id, posexplode(slice(embedding, 1, 8)) AS (pos, val)
          FROM embeddings WHERE vec_id < 20)
    """,
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding[1:8], 1) - 1 AS BIGINT) AS pos,
           CAST(unnest(embedding[1:8]) AS DOUBLE) AS val
    FROM embeddings WHERE vec_id < 20
    """,
    tags=("unnest", "explode"),
)

register_sql(
    "unnest_outer_null",
    """
    SELECT t.id, ex.v
    FROM (SELECT id, CASE WHEN id % 2 = 0 THEN array(id, id + 1) END AS xs
          FROM range(0, 6)) t
    LATERAL VIEW OUTER explode(t.xs) ex AS v
    """,
    oracle="""
    SELECT t.id, CASE WHEN t.xs IS NULL THEN NULL ELSE u.v END AS v
    FROM (SELECT range AS id,
                 CASE WHEN range % 2 = 0 THEN [range, range + 1] END AS xs
          FROM range(0, 6)) t
    LEFT JOIN LATERAL (SELECT unnest(t.xs) AS v) u ON true
    """,
    tags=("unnest", "explode-outer", "preserve-nulls"),
)

register_sql(
    "unnest_struct_inline",
    """
    SELECT t.id, s.k, s.v
    FROM (SELECT id, array(named_struct('k', 'a', 'v', id),
                           named_struct('k', 'b', 'v', id * 2)) AS entries
          FROM range(1, 4)) t
    LATERAL VIEW inline(t.entries) s AS k, v
    """,
    oracle="""
    SELECT t.id, u.e.k AS k, u.e.v AS v
    FROM (SELECT range AS id,
                 [{'k': 'a', 'v': range}, {'k': 'b', 'v': range * 2}] AS entries
          FROM range(1, 4)) t,
    LATERAL (SELECT unnest(t.entries) AS e) u
    """,
    tags=("unnest", "inline", "struct"),
)


# --- map_values / map_entries / map_from_entries / map_concat / compact -----
register_sql(
    "map_entries_values",
    """
    SELECT t.id,
           array_join(transform(array_sort(map_values(t.m)),
                                v -> CAST(v AS STRING)), ',') AS vals_sorted,
           array_join(array_sort(transform(map_entries(t.m),
                                e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',')
             AS entries_str,
           element_at(map_from_entries(map_entries(t.m)), 'b') AS b_roundtrip,
           element_at(map_concat(t.m, map('c', id * 30)), 'c') AS c_val,
           array_join(transform(array_compact(array(id, NULL, id * 2, NULL)),
                                v -> CAST(v AS STRING)), ',') AS compacted
    FROM (SELECT id, map('a', id * 10, 'b', id * 20) AS m FROM range(1, 5)) t
    """,
    oracle="""
    SELECT t.id,
           array_to_string(list_sort(map_values(t.m)), ',') AS vals_sorted,
           array_to_string(list_sort(list_transform(map_entries(t.m),
                                    e -> concat(e.key, '=', CAST(e.value AS VARCHAR)))), ',')
             AS entries_str,
           map_from_entries(map_entries(t.m))['b'][1] AS b_roundtrip,
           (t.m2)['c'][1] AS c_val,
           array_to_string(list_filter([t.id, NULL, t.id * 2, NULL], x -> x IS NOT NULL), ',')
             AS compacted
    FROM (SELECT range AS id,
                 map(['a', 'b'], [range * 10, range * 20]) AS m,
                 map(['c'], [range * 30]) AS m2
          FROM range(1, 5)) t
    """,
    tags=("map", "entries", "compact"),
)

# --- map higher-order functions: transform_keys/values, map_filter,
# map_zip_with (reference functions-nested map module has no HOFs — this
# is the Spark superset; DuckDB twin goes through entries lists) --------
register_sql(
    "map_higher_order",
    """
    SELECT t.id,
           element_at(transform_values(t.m, (k, v) -> v * 10), 'b') AS b_x10,
           element_at(transform_keys(t.m, (k, v) -> upper(k)), 'A') AS a_upper,
           CAST(size(map_filter(t.m, (k, v) -> v >= 20)) AS BIGINT) AS n_big,
           element_at(map_zip_with(t.m, t.m2, (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)),
                      'a') AS a_sum
    FROM (SELECT id,
                 map('a', id, 'b', id * 2) AS m,
                 map('a', id * 100, 'c', 7) AS m2
          FROM range(1, 20)) t
    """,
    oracle="""
    SELECT t.id,
           (t.m['b'])[1] * 10 AS b_x10,
           (t.m['a'])[1] AS a_upper,
           CAST(len(list_filter(map_entries(t.m), e -> e.value >= 20)) AS BIGINT) AS n_big,
           (t.m['a'])[1] + (t.m2['a'])[1] AS a_sum
    FROM (SELECT range AS id,
                 map(['a', 'b'], [range, range * 2]) AS m,
                 map(['a', 'c'], [range * 100, 7]) AS m2
          FROM range(1, 20)) t
    """,
    tags=("map", "higher-order", "nested"),
)

# --- array append / prepend / insert (reference functions-nested
# concat.rs array_append/array_prepend, extract.rs array_insert
# equivalents) — outputs stringified per the canonicalizer convention --
register_sql(
    "arr_append_prepend_insert",
    """
    SELECT t.id,
           array_join(transform(array_append(t.xs, 99),
                                v -> CAST(v AS STRING)), ',') AS appended,
           array_join(transform(array_prepend(t.xs, 0),
                                v -> CAST(v AS STRING)), ',') AS prepended,
           array_join(transform(array_insert(t.xs, 2, -7),
                                v -> CAST(v AS STRING)), ',') AS inserted
    FROM (SELECT id, array(CAST(id AS INT), CAST(id * 2 AS INT),
                           CAST(id * 3 AS INT)) AS xs
          FROM range(1, 8)) t
    """,
    oracle="""
    SELECT t.id,
           array_to_string(list_append(t.xs, 99), ',') AS appended,
           array_to_string(list_prepend(0, t.xs), ',') AS prepended,
           array_to_string(list_concat(list_concat(t.xs[1:1], [-7]), t.xs[2:]), ',')
             AS inserted
    FROM (SELECT range AS id, [CAST(range AS INT), CAST(range * 2 AS INT),
                               CAST(range * 3 AS INT)] AS xs
          FROM range(1, 8)) t
    """,
    tags=("array", "append", "nested"),
)


# --- zip/position/slice/flatten/sequence family (reference array.slt) -------
register_sql(
    "arr_zip_position_slice",
    """
    WITH t AS (
        SELECT vec_id,
               transform(slice(embedding, 1, 4),
                         x -> CAST(round(x * 1000) AS BIGINT)) AS a,
               transform(slice(embedding, 5, 4),
                         x -> CAST(round(x * 1000) AS BIGINT)) AS b
        FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           array_join(zip_with(a, b, (x, y) -> CAST(x + y AS STRING)), '|') AS zsum,
           CAST(array_position(a, element_at(a, 1)) AS BIGINT) AS pos_first,
           array_join(transform(flatten(array(a, b)),
                                v -> CAST(v AS STRING)), '|') AS flat,
           array_join(transform(sequence(1, CAST(size(a) AS INT)),
                                v -> CAST(v AS STRING)), '|') AS seq,
           array_join(transform(slice(a, 2, 2), v -> CAST(v AS STRING)), '|') AS sl
    FROM t ORDER BY vec_id
    """,
    oracle="""
    WITH t AS (
        SELECT vec_id,
               list_transform(embedding[1:4],
                              x -> CAST(round(x * 1000) AS BIGINT)) AS a,
               list_transform(embedding[5:8],
                              x -> CAST(round(x * 1000) AS BIGINT)) AS b
        FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           array_to_string(list_transform(range(1, len(a) + 1),
                           i -> CAST(a[i] + b[i] AS VARCHAR)), '|') AS zsum,
           CAST(list_position(a, a[1]) AS BIGINT) AS pos_first,
           array_to_string(list_transform(flatten([a, b]),
                           v -> CAST(v AS VARCHAR)), '|') AS flat,
           array_to_string(list_transform(range(1, len(a) + 1),
                           v -> CAST(v AS VARCHAR)), '|') AS seq,
           array_to_string(list_transform(a[2:3], v -> CAST(v AS VARCHAR)), '|') AS sl
    FROM t ORDER BY vec_id
    """,
    tags=("nested", "zip", "slice", "sequence"),
)
