"""Similarity search over the embedding column: brute-force cosine top-k
baseline, random-hyperplane LSH buckets, and IVF-style coarse
quantization — the three-tier ANN story for a 100 TB corpus.

Part of the LLM-data-pipeline surface. Scale design:
- brute-force is the *per-bucket* kernel: a broadcast of the query
  vector + a map-side cosine + TakeOrderedAndProject (no shuffle of the
  corpus) — correct baseline at any size, O(corpus) work.
- LSH: 12 fixed hyperplanes (deterministic, seeded, embedded as
  literals) → 12-bit bucket id; candidates = query's bucket only. At
  scale the bucket id is a partition/cluster key, so a probe touches
  1/4096 of the data.
- IVF-grid: coarse cells from the first two dimensions; probing the
  query's cell ± neighbors. Stands in for kmeans centroids with a
  deterministic, oracle-checkable assignment.
- IVF-trained (ann_ivf_trained): real Lloyd's k-means — deterministic
  seed centroids (vec_id < k), argmin assignment via ROW_NUMBER over
  round(L2², 9) with centroid-id tie-break, centroid recompute through
  EXACT scaled-integer per-dimension sums (partition-order independent),
  one refinement pass, then probe = cosine top-k within the query's
  cluster only.  At 100 TB: train on a sample, broadcast the k×dim
  centroid table (tiny), assignment is map-side, and the only shuffles
  are the k×dim centroid-mean aggregations — the FAISS coarse-quantizer
  design expressed as two DataFrame aggregation rounds.

All vector math is double-cast element arithmetic — identical in Spark
(zip_with/aggregate) and DuckDB (list_transform/list_sum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# Deterministic hyperplanes: seeded, rounded to 4dp, embedded as literals
# in BOTH engine texts (no runtime randomness — resumable & oracle-safe).
_rng = np.random.RandomState(7)
_PLANES = np.round(_rng.randn(12, 64), 4)


def _sp_plane(p: np.ndarray) -> str:
    return "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + ")"


def _du_plane(p: np.ndarray) -> str:
    return "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + "]"


def _sp_bucket_expr(vec: str) -> str:
    bits = []
    for i, p in enumerate(_PLANES):
        dot = (
            f"aggregate(zip_with({vec}, {_sp_plane(p)}, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def _du_bucket_expr(vec: str) -> str:
    bits = []
    for i, p in enumerate(_PLANES):
        dot = f"list_sum(list_transform(list_zip({vec}, {_du_plane(p)}), z -> z[1] * z[2]))"
        bits.append(f"CASE WHEN {dot} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END")
    return "(" + " + ".join(bits) + ")"



def _sp_bucket4_expr(vec: str) -> str:
    """4-plane (16-bucket) coarse variant for the recall eval — the
    12-bit production bucket is so selective on this corpus that
    single-bucket recall would be vacuously ~0."""
    bits = []
    for i, p in enumerate(_PLANES[:4]):
        dot = (
            f"aggregate(zip_with({vec}, {_sp_plane(p)}, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bits.append(
            f"CASE WHEN {dot} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
            "ELSE 0 END"
        )
    return "(" + " + ".join(bits) + ")"


def _du_bucket4_expr(vec: str) -> str:
    bits = []
    for i, p in enumerate(_PLANES[:4]):
        dot = (
            f"list_sum(list_transform(list_zip({vec}, {_du_plane(p)}), "
            "z -> z[1] * z[2]))"
        )
        bits.append(
            f"CASE WHEN {dot} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
        )
    return "(" + " + ".join(bits) + ")"


_SP_V = "transform(embedding, x -> CAST(x AS DOUBLE))"
_DU_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_SP_COS = (
    "aggregate(zip_with(a.v, q.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    " / (a.nrm * q.nrm)"
)
_DU_COS = "list_sum(list_transform(list_zip(a.v, q.v), z -> z[1] * z[2])) / (a.nrm * q.nrm)"


register_sql(
    "ann_bruteforce_topk",
    f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    normed AS (
      -- finite-norm fence: cosine is undefined for the zero vector, and
      -- an unfenced division ANSI-crashes the whole query on one
      -- corrupt/padded embedding row (found r12 by the IVF property
      -- pin; valid at any corpus scale).  r13 (ADVICE): extended to
      -- exclude NaN/Inf norms too — corrupt encoder output produces
      -- non-finite components as easily as zeros, and BOTH engines
      -- evaluate NaN > 0 as TRUE (probed: Spark NaN-is-largest,
      -- DuckDB total order — the identical phrase below keeps the
      -- texts symmetric), so a bare nrm > 0 let NaN cosines into the
      -- top-k on both sides
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x)) AS nrm
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm FROM normed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_SP_COS}, 6) AS cosine
    FROM normed a CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 10
    """,
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    normed AS (
      SELECT * FROM (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm FROM normed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_DU_COS}, 6) AS cosine
    FROM normed a CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 10
    """,
    tags=("ann", "cosine", "topk", "llm-pipeline"),
    bench=True,
)

# --- vectorized numpy kernel: the actual 100 TB fast path -------------------
@register(
    "ann_bruteforce_vectorized",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    normed AS (
      SELECT * FROM (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm FROM normed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_DU_COS}, 6) AS cosine
    FROM normed a CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 10
    """,
    tags=("ann", "cosine", "topk", "pandas-udf", "vectorized", "llm-pipeline"),
    bench=True,
)
def ann_bruteforce_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched numpy kernel for brute-force cosine top-k: each
    batch computes a (batch × dim)·(dim,) matrix-vector product and
    emits only its local top-k; the global TakeOrderedAndProject merges
    k rows per partition.  This two-phase top-k is the pattern that
    scales — the corpus never shuffles, only k·partitions candidate
    rows move.  Local selection uses EXACTLY the oracle's total order
    (round(cos, 6) DESC, vec_id ASC), so local-top-k ∪ global-merge is
    lossless at the k boundary; numpy's pairwise summation can differ
    from a sequential fold in the last ulp, but the comparison key is
    the 6-decimal rounding on both engines."""
    emb = table(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.expr(_SP_V).alias("v"))
        .head()[0]
    )
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.sqrt(np.sum(q * q))
    k = 10
    if qn == 0.0 or not np.isfinite(qn):
        # zero/non-finite-norm query: cosine undefined for every
        # candidate (the SQL twins' fence drops the query row and
        # return empty) — short-circuit instead of emitting NaN rows
        return spark.createDataFrame([], "vec_id bigint, cosine double")

    def topk_per_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue  # np.stack raises on an empty batch
            ids = pdf["vec_id"].to_numpy()
            mat_all = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # finite-norm fence: numpy division would yield NaN/garbage
            # silently (not an error like the SQL path) and such rows
            # could displace real candidates in the local top-k.  NaN
            # norms already fail > 0 in numpy (unlike SQL!), but Inf
            # norms pass — isfinite closes both.
            nrms_all = np.sqrt(np.add.reduce(mat_all * mat_all, axis=1))
            mask = (ids != 0) & (nrms_all > 0) & np.isfinite(nrms_all)
            if not mask.any():
                continue
            mat = mat_all[mask]
            dots = np.add.reduce(mat * q, axis=1)
            nrms = nrms_all[mask]
            cos = dots / (nrms * qn)
            # HALF-AWAY-FROM-ZERO at 6dp, matching Spark/DuckDB ROUND on
            # decimal midpoints — np.round is banker's (half-to-even) and
            # flips exact-midpoint cosines like 1/128 to the OTHER value
            # (same masked-boundary class as the session-window find;
            # repr-level ulp disagreements remain and stay measure-zero)
            cos_r = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6, cos)
            # select by the SAME total order the global merge / oracle
            # uses: (rounded cosine DESC, vec_id ASC) — lexsort's last
            # key is primary
            idx = np.lexsort((ids[mask], -cos_r))[:k]
            yield pd.DataFrame({"vec_id": ids[mask][idx], "cosine": cos_r[idx]})

    local = emb.mapInPandas(topk_per_batch, "vec_id bigint, cosine double")
    return local.orderBy(F.desc("cosine"), "vec_id").limit(k)


register_sql(
    "ann_lsh_buckets",
    f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, {_sp_bucket_expr("v")} AS bucket FROM e)
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_id
    FROM bucketed
    GROUP BY bucket
    HAVING COUNT(*) > 1
    """,
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, {_du_bucket_expr("v")} AS bucket FROM e)
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_id
    FROM bucketed
    GROUP BY bucket
    HAVING COUNT(*) > 1
    """,
    tags=("ann", "lsh", "llm-pipeline"),
)

register_sql(
    "ann_lsh_probe",
    f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    bucketed AS (
      -- zero-norm fence (cosine undefined; see ann_bruteforce_topk)
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x)) AS nrm,
               {_sp_bucket_expr("v")} AS bucket
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, bucket FROM bucketed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_SP_COS}, 6) AS cosine
    FROM bucketed a JOIN q ON a.bucket = q.bucket
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """,
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    bucketed AS (
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               {_du_bucket_expr("v")} AS bucket
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, bucket FROM bucketed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_DU_COS}, 6) AS cosine
    FROM bucketed a JOIN q ON a.bucket = q.bucket
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """,
    tags=("ann", "lsh", "probe", "llm-pipeline"),
)

register_sql(
    "ann_ivf_grid",
    f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    cells AS (
      -- zero-norm fence (cosine undefined; see ann_bruteforce_topk)
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x)) AS nrm,
               CAST(floor(element_at(v, 1) / 0.1) AS BIGINT) AS cx,
               CAST(floor(element_at(v, 2) / 0.1) AS BIGINT) AS cy
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, cx, cy FROM cells WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_SP_COS}, 6) AS cosine
    FROM cells a JOIN q
      ON a.cx BETWEEN q.cx - 1 AND q.cx + 1
     AND a.cy BETWEEN q.cy - 1 AND q.cy + 1
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """,
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    cells AS (
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               CAST(floor(v[1] / 0.1) AS BIGINT) AS cx,
               CAST(floor(v[2] / 0.1) AS BIGINT) AS cy
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, cx, cy FROM cells WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_DU_COS}, 6) AS cosine
    FROM cells a JOIN q
      ON a.cx BETWEEN q.cx - 1 AND q.cx + 1
     AND a.cy BETWEEN q.cy - 1 AND q.cy + 1
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """,
    tags=("ann", "ivf", "llm-pipeline"),
)


# --- per-label embedding centroid (exact-integer aggregation) ---------------
# r10 hardening (same class as the z-score s2 fix, found by the round's
# self-scan for agg x agg BIGINT products): sumx = SUM(xs) grows with
# vectors-per-label, so SUM(sumx * sumx) in BIGINT overflowed 2^63 at
# ~3e5 vecs/label (|x|~1).  One factor cast to DECIMAL(19,0) widens the
# product to D(38,0) per the CLAUDE.md width rule (exact on both
# engines); the remaining bound is |sumx| < 4e17 per dim — ~4e13
# vecs/label, far past 100 TB of 64-dim embeddings (~4e11 vectors).
register_sql(
    "embedding_centroid_per_label",
    """
    WITH dims AS (
      SELECT label, pos + 1 AS d,
             CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS xs
      FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x),
    per_dim AS (
      SELECT label, d, SUM(xs) AS sumx, COUNT(*) AS nv
      FROM dims GROUP BY label, d)
    SELECT label,
           MAX(nv) AS n_vecs,
           ROUND(sqrt(CAST(SUM(CAST(sumx AS DECIMAL(19,0)) * sumx)
                           AS DOUBLE)) / (10000.0 * MAX(nv)), 6)
             AS centroid_norm
    FROM per_dim
    GROUP BY label
    ORDER BY label
    """,
    oracle="""
    WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    dims AS (
      SELECT label, d, CAST(round(v[d] * 10000) AS BIGINT) AS xs
      FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS d) ds
      WHERE d <= len(v)),
    per_dim AS (
      SELECT label, d, SUM(xs) AS sumx, COUNT(*) AS nv
      FROM dims GROUP BY label, d)
    SELECT label,
           MAX(nv) AS n_vecs,
           ROUND(sqrt(CAST(SUM(CAST(sumx AS DECIMAL(19,0)) * sumx)
                           AS DOUBLE)) / (10000.0 * MAX(nv)), 6)
             AS centroid_norm
    FROM per_dim
    GROUP BY label
    ORDER BY label
    """,
    tags=("embedding", "centroid", "llm-pipeline"),
)
# Centroid math stays EXACT until the final sqrt: scaled-integer
# components (1e4) make both grouped SUMs associative integer adds, so
# the per-dim mean and the norm are partition-order independent —
# float SUM over a shuffle would not be.  sumx^2 accumulates in
# DECIMAL(38,0) via the D(19) cast above (r10 fence; int64 overflowed
# at ~3e5 vecs/label — see the header comment for the bounds).


# --- IVF with TRAINED centroids (Lloyd's k-means, 2 iterations) -------------
_SP_DIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)
_DU_DIST = "list_sum(list_transform(list_zip({a}, {b}), z -> (z[1] - z[2]) * (z[1] - z[2])))"

# Spark side split at the two REDUCED k-means intermediates: the
# trained centroid table c1 (8 rows) and the final assignment a2.
# Inlined, the single statement re-ran the whole train+assign chain for
# each of `nrmed`'s two consumers — 6 embeddings scans and a DOUBLED
# full-corpus assignment window.  Materializing c1 makes round 2 read
# 8 trained centroids; materializing a2 makes the corpus-wide argmin
# window run exactly once per round (Lloyd's inherent cost).  At 100 TB
# a real pipeline persists exactly these two tables (the coarse
# quantizer and the assignment column).
_SP_IVF_C1 = f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_SP_DIST.format(a="e.v", b="s.cv")}, 9), s.cid
               ) AS rn
        FROM e CROSS JOIN seeds s) t
      WHERE rn = 1),
    m1 AS (
      SELECT cid, idx.i,
             CAST(SUM(CAST(round(element_at(v, idx.i) * 10000) AS BIGINT))
                  AS BIGINT) AS sx,
             COUNT(*) AS n
      FROM a1 CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) idx
      GROUP BY cid, idx.i)
    SELECT cid,
           transform(array_sort(collect_list(named_struct(
               'i', i, 'cx', CAST(sx AS DOUBLE) / (10000.0 * n)))),
             p -> p.cx) AS cv
    FROM m1 GROUP BY cid
"""

_SP_IVF_A2 = f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings)
    SELECT vec_id, v, cid FROM (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY round({_SP_DIST.format(a="e.v", b="c.cv")}, 9), c.cid
             ) AS rn
      FROM e CROSS JOIN __C1__ c) t
    WHERE rn = 1
"""

_SP_IVF_FINAL = f"""
    WITH nrmed AS (
      -- zero-norm fence on the PROBE only: zero vectors cluster fine
      -- (L2 argmin is defined) but have no cosine (see
      -- ann_bruteforce_topk)
      SELECT * FROM (
        SELECT vec_id, v, cid,
               sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x)) AS nrm
        FROM __A2__) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, cid FROM nrmed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_SP_COS}, 6) AS cosine
    FROM nrmed a JOIN q ON a.cid = q.cid
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """


@register(
    "ann_ivf_trained",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_DU_DIST.format(a="e.v", b="s.cv")}, 9), s.cid
               ) AS rn
        FROM e CROSS JOIN seeds s) t
      WHERE rn = 1),
    m1 AS (
      SELECT cid, idx.i,
             CAST(SUM(CAST(round(v[idx.i] * 10000) AS BIGINT)) AS BIGINT) AS sx,
             COUNT(*) AS n
      FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) idx
      GROUP BY cid, idx.i),
    c1 AS (
      SELECT cid, list(CAST(sx AS DOUBLE) / (10000.0 * n) ORDER BY i) AS cv
      FROM m1 GROUP BY cid),
    a2 AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_DU_DIST.format(a="e.v", b="c.cv")}, 9), c.cid
               ) AS rn
        FROM e CROSS JOIN c1 c) t
      WHERE rn = 1),
    nrmed AS (
      SELECT * FROM (
        SELECT vec_id, v, cid,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM a2) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT v, nrm, cid FROM nrmed WHERE vec_id = 0)
    SELECT a.vec_id, ROUND({_DU_COS}, 6) AS cosine
    FROM nrmed a JOIN q ON a.cid = q.cid
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 5
    """,
    tags=("ann", "ivf", "kmeans", "llm-pipeline"),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-centroid IVF probe with the centroid table and final
    assignment materialized once (see _SP_IVF_C1 notes)."""
    from datafusion_umami_spark.operators.materialize import materialize_view
    from datafusion_umami_spark.tables import register_views

    register_views(spark, sf_dir)
    materialize_view("ivf_c1", spark.sql(_SP_IVF_C1), "ivf_c1_m")
    materialize_view(
        "ivf_a2", spark.sql(_SP_IVF_A2.replace("__C1__", "ivf_c1_m")), "ivf_a2_m"
    )
    return spark.sql(_SP_IVF_FINAL.replace("__A2__", "ivf_a2_m"))


# --- recall evaluation: coarse-LSH candidates vs exact top-10 ---------------
register_sql(
    "ann_recall_eval",
    # The tuning signal an ANN deployment actually watches: for 10 query
    # vectors, recall@10 of a single-bucket coarse-LSH probe (4 planes,
    # 16 buckets) against the exact brute-force top-10.  Exact side: one
    # cross join + per-query WindowGroupLimit (rounded cosine, id
    # tie-break).  Candidate side: the bucket equi-join.  At 100 TB the
    # eval runs on a sample; the recall it reports is what decides
    # bucket bits / multi-probe count.
    f"""
    WITH e AS (SELECT vec_id, {_SP_V} AS v FROM embeddings),
    normed AS (
      -- zero-norm fence (cosine undefined; see ann_bruteforce_topk)
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x)) AS nrm,
               {_sp_bucket4_expr("v")} AS bucket
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT vec_id AS qid, v, nrm, bucket FROM normed WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, a.vec_id,
             ROW_NUMBER() OVER (PARTITION BY q.qid
                                ORDER BY ROUND({_SP_COS}, 6) DESC, a.vec_id)
               AS rn
      FROM normed a CROSS JOIN q
      WHERE a.vec_id <> q.qid),
    exact AS (SELECT qid, vec_id FROM scored WHERE rn <= 10),
    cands AS (
      SELECT q.qid, a.vec_id
      FROM normed a JOIN q ON a.bucket = q.bucket
      WHERE a.vec_id <> q.qid)
    SELECT x.qid,
           CAST(COUNT(c.vec_id) AS BIGINT) AS n_hit,
           ROUND(CAST(COUNT(c.vec_id) AS DOUBLE) / 10.0, 2) AS recall_at_10
    FROM exact x LEFT JOIN cands c
      ON x.qid = c.qid AND x.vec_id = c.vec_id
    GROUP BY x.qid
    ORDER BY x.qid
    """,
    oracle=f"""
    WITH e AS (SELECT vec_id, {_DU_V} AS v FROM embeddings),
    normed AS (
      SELECT * FROM (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               {_du_bucket4_expr("v")} AS bucket
        FROM e) t
      WHERE nrm > 0 AND NOT isnan(nrm)
        AND nrm < CAST('Infinity' AS DOUBLE)),
    q AS (SELECT vec_id AS qid, v, nrm, bucket FROM normed WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, a.vec_id,
             ROW_NUMBER() OVER (PARTITION BY q.qid
                                ORDER BY ROUND({_DU_COS}, 6) DESC, a.vec_id)
               AS rn
      FROM normed a CROSS JOIN q
      WHERE a.vec_id <> q.qid),
    exact AS (SELECT qid, vec_id FROM scored WHERE rn <= 10),
    cands AS (
      SELECT q.qid, a.vec_id
      FROM normed a JOIN q ON a.bucket = q.bucket
      WHERE a.vec_id <> q.qid)
    SELECT x.qid,
           CAST(COUNT(c.vec_id) AS BIGINT) AS n_hit,
           ROUND(CAST(COUNT(c.vec_id) AS DOUBLE) / 10.0, 2) AS recall_at_10
    FROM exact x LEFT JOIN cands c
      ON x.qid = c.qid AND x.vec_id = c.vec_id
    GROUP BY x.qid
    ORDER BY x.qid
    """,
    tags=("ann", "recall", "evaluation", "llm-pipeline"),
)
