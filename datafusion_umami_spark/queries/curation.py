"""Dataset-curation operators: the selection / splitting / mixing steps
between a cleaned corpus and a training run.

Completes the LLM-pipeline family (dedup → decontam → quality →
**curation**): balanced per-class sampling, deterministic leak-free
train/val/test splitting, source-mixture token budgeting (the
"how many tokens from each source" step every pretraining mix needs),
and curriculum bucketing by quality score.

All selection is driven by a deterministic 60-bit md5 hash (shared
convention with dedup.py) — never rand() — so results are reproducible
across engines, partitionings, and retries; that determinism is itself
the operator's contract at 100 TB (a resumed job must pick the same
rows).

100 TB notes per query inline. Reference parity: the reference has a
deterministic-sampling surface only via LIMIT/TABLESAMPLE
(sqllogictest/test_files/limit.slt); class-balanced and budgeted
selection are capability-superset work from the build brief.
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register_sql

from datafusion_umami_spark.queries.hashing import DUCK_H64, SPARK_H64  # noqa: E402

# --- balanced per-class sample --------------------------------------------
# Equal doc counts per language: rank docs inside each class by a
# deterministic hash (not rand!) and keep the first K.  The window
# partitions on the class key; at 100 TB this is one shuffle keyed by
# (lang), and WindowGroupLimit prunes each partition to K rows map-side
# before the final sort.
_BAL_BODY = """
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM hashed)
    SELECT doc_id, lang, n_chars
    FROM ranked
    WHERE rn <= 40
    ORDER BY lang, doc_id
    LIMIT 1000
"""

register_sql(
    "cur_balanced_per_class_sample",
    f"""
    WITH hashed AS (
      SELECT doc_id, lang, n_chars,
             {SPARK_H64.format(s="concat('bal:', CAST(doc_id AS STRING))")} AS h
      FROM documents),
    {_BAL_BODY}
    """,
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, lang, n_chars,
             {DUCK_H64.format(s="concat('bal:', CAST(doc_id AS VARCHAR))")} AS h
      FROM documents),
    {_BAL_BODY}
    """,
    tags=("curation", "sampling", "llm-pipeline"),
)

# --- deterministic leak-free split ----------------------------------------
# train/val/test by CONTENT hash (not doc_id): byte-identical documents
# always land in the same split, so exact duplicates can never leak
# from train into eval.  n_spanning counts content hashes that appear
# in more than one split — structurally zero, and the query proves it.
_SPLIT_BODY = """
    assigned AS (
      SELECT doc_id, content_h,
             CASE WHEN content_h % 100 < 90 THEN 'train'
                  WHEN content_h % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM hashed),
    per_split AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT content_h) AS BIGINT) AS n_distinct
      FROM assigned GROUP BY split),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_spanning
      FROM (SELECT content_h FROM assigned
            GROUP BY content_h HAVING COUNT(DISTINCT split) > 1) t)
    SELECT p.split, p.n_docs, p.n_distinct, l.n_spanning
    FROM per_split p CROSS JOIN leak l
    ORDER BY p.split
"""

register_sql(
    "cur_hash_split_leakfree",
    f"""
    WITH hashed AS (
      SELECT doc_id, {SPARK_H64.format(s='text')} AS content_h
      FROM documents),
    {_SPLIT_BODY}
    """,
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {DUCK_H64.format(s='text')} AS content_h
      FROM documents),
    {_SPLIT_BODY}
    """,
    tags=("curation", "split", "llm-pipeline"),
)

# --- source-mixture token budget (largest-remainder allocation) -----------
# Given per-source token counts, allocate an integer token budget of
# 100k proportionally: base = floor share, then +1 to the sources with
# the largest fractional remainders until the budget is exact.  All
# integer arithmetic (cross-engine exact); the allocation table is
# |sources|-sized — trivially small at any corpus scale, computed from
# one aggregation over the corpus.
_MIX_BODY_T = """
    tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total_toks FROM src),
    alloc AS (
      -- NATIVE integer floor division on each engine (Spark DIV,
      -- DuckDB //) — all operands positive, so both truncate == floor,
      -- exactly.  The previous "portable" form (a - a%b)/b routed the
      -- numerator through DOUBLE division, which silently loses ulps
      -- once a = toks*100000 exceeds 2^53, i.e. for any source past
      -- ~9e10 tokens — the live regime at 100 TB (caught by
      -- tests/test_fuzz.py::
      -- test_mixture_budget_matches_largest_remainder_reference).
      -- r13 (ADVICE item 3): the numerator is WIDENED like the ppm
      -- helpers — toks*100000 in BIGINT throws on ANSI overflow once a
      -- single source passes ~9.2e13 tokens, one order of magnitude
      -- over the per-source regime the 100 TB plan describes.  Spark
      -- accumulates in DECIMAL(38,0), DuckDB in HUGEINT (both exact
      -- far past any corpus; probed identical), remainder included.
      SELECT s.source, s.toks,
             CAST({idiv} AS BIGINT) AS base_alloc,
             {rem} AS rem
      FROM src s CROSS JOIN tot t),
    ranked AS (
      SELECT source, toks, base_alloc,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
      FROM alloc),
    need AS (
      SELECT CAST(100000 - SUM(base_alloc) AS BIGINT) AS topup FROM ranked)
    SELECT r.source, r.toks AS source_tokens,
           CAST(r.base_alloc + CASE WHEN r.rr <= n.topup THEN 1 ELSE 0 END
                AS BIGINT) AS allocated_tokens
    FROM ranked r CROSS JOIN need n
    ORDER BY r.source
"""

_MIX_BODY_SP = _MIX_BODY_T.format(
    idiv="CAST(s.toks AS DECIMAL(38,0)) * 100000 DIV t.total_toks",
    rem="CAST(CAST(s.toks AS DECIMAL(38,0)) * 100000 % t.total_toks"
    " AS DECIMAL(38,0))",
)
_MIX_BODY_DU = _MIX_BODY_T.format(
    idiv="CAST(s.toks AS HUGEINT) * 100000 // t.total_toks",
    rem="CAST(s.toks AS HUGEINT) * 100000 % t.total_toks",
)

register_split_sql(
    "cur_source_mixture_budget",
    # |sources|-row token-sum aggregate materialized once: inlined, the
    # corpus-wide SUM shuffle re-ran for every downstream reference
    # (4 documents scans).
    stages=[
        (
            r"""
      SELECT source,
             CAST(SUM(size(split(trim(text), '\\s+'))) AS BIGINT) AS toks
      FROM documents GROUP BY source""",
            "mix_src_m",
        )
    ],
    final_sql="WITH " + _MIX_BODY_SP.replace("FROM src", "FROM mix_src_m"),
    oracle=r"""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS toks
      FROM documents GROUP BY source),
    """
    + _MIX_BODY_DU,
    tags=("curation", "mixture", "llm-pipeline"),
)

# --- curriculum buckets by quality score ----------------------------------
# Quality deciles (same score recipe as text_quality_score) with
# per-bucket profiles — the ordering a curriculum loader consumes.
# r13 (verdict weak item): boundary-banded, not NTILE — the global
# NTILE(10) sorted ALL documents through one partition; the nine
# decile boundaries are a percentile_disc ordered-set aggregate over
# the rounded score (state = distinct q values), broadcast as scalar
# subqueries, and each doc bands by value comparison.  The boundaries
# are actual q elements, so the double compares are exact and
# identical cross-engine; ties on a boundary take the better bucket.
_CURR_BOUNDS = ",\n".join(
    f"        percentile_disc(0.{k}) WITHIN GROUP (ORDER BY q DESC) AS b{k}"
    for k in range(1, 10)
)
_CURR_CASE = (
    "CASE "
    + " ".join(
        f"WHEN q >= (SELECT b{k} FROM bounds) THEN {k}" for k in range(1, 10)
    )
    + " ELSE 10 END"
)
_CURR_SCORED_T = """
      SELECT doc_id,
             ROUND(least(n_tokens / 50.0, 1.0) * 0.4
                   + least(n_stop / greatest(n_tokens, 1.0) * 5.0, 1.0) * 0.4
                   + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 10.0,
                                  1.0)) * 0.2,
                   6) AS q
      FROM ({feats}) feats"""
_CURR_FEATS_SPARK = r"""
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(regexp_count(text, '[^a-z0-9 ]') AS DOUBLE) AS n_punct,
             CAST(regexp_count(text, '\\b(the|a|of|and|is|in|to)\\b') AS DOUBLE)
               AS n_stop
      FROM documents"""
_CURR_FEATS_DUCK = r"""
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
               AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
               AS n_punct,
             CAST(len(regexp_extract_all(text, '\b(the|a|of|and|is|in|to)\b'))
               AS DOUBLE) AS n_stop
      FROM documents"""
_CURR_BODY = f"""
    bounds AS (
      SELECT
{_CURR_BOUNDS}
      FROM {{sc}}),
    buckets AS (
      SELECT doc_id, q,
             {_CURR_CASE} AS bucket
      FROM {{sc}})
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(MIN(q), 6) AS min_q,
           ROUND(MAX(q), 6) AS max_q
    FROM buckets
    GROUP BY bucket
    ORDER BY bucket
"""

register_split_sql(
    "cur_quality_curriculum_buckets",
    # the |docs|-sized scored table feeds the boundary aggregate AND
    # the banding pass — materialized once (one documents scan).
    stages=[
        (_CURR_SCORED_T.format(feats=_CURR_FEATS_SPARK), "curr_scored_m")
    ],
    final_sql="WITH " + _CURR_BODY.format(sc="curr_scored_m").lstrip(),
    oracle="WITH scored AS ("
    + _CURR_SCORED_T.format(feats=_CURR_FEATS_DUCK)
    + "),\n"
    + _CURR_BODY.format(sc="scored").lstrip(),
    tags=("curation", "curriculum", "llm-pipeline"),
)

# --- token-budget-constrained greedy selection ----------------------------
# Select documents by quality-per-token value until a 10k-token budget
# is spent: rank by (quality desc, doc_id), take docs while the
# cumulative token count of STRICTLY better docs stays under budget.
# Exact integers end-to-end (quality scaled to micro-units).
# r13 (verdict weak item): the single global running-sum window forced
# every document through one partition.  Now a TWO-LEVEL prefix sum:
# (1) coarse-band each doc by q_micro decile boundaries
# (percentile_disc — a tiny ordered-set aggregate, broadcast); bands
# are order-prefixes of (q_micro DESC, doc_id) because the band is a
# monotone function of q_micro alone; (2) per-band token totals (≤10
# rows) turn into per-band OFFSETS via a tiny band<band self-join;
# (3) the running sum windows PARTITION BY band, offset by the band's
# predecessor total.  toks_before = offset + within-band prefix is
# IDENTICAL to the old global prefix sum — same output, bit for bit
# (pinned against a pure-Python greedy reference in tests/test_fuzz.py)
# — but the widest window partition is one decile, not the corpus.
# Worst case (all q_micro equal) degenerates to one band — a data-skew
# bound, not a plan bound.
_BUDGET_BOUNDS = ",\n".join(
    "        CAST(percentile_disc(0.%d) WITHIN GROUP (ORDER BY q_micro DESC)"
    " AS BIGINT) AS b%d" % (k, k)
    for k in range(1, 10)
)
_BUDGET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN q_micro >= (SELECT b{k} FROM bounds) THEN {k}"
        for k in range(1, 10)
    )
    + " ELSE 10 END"
)
_BUDGET_BODY = f"""
    bounds AS (
      SELECT
{_BUDGET_BOUNDS}
      FROM {{sc}}),
    banded AS (
      SELECT doc_id, n_toks, q_micro,
             {_BUDGET_CASE} AS band
      FROM {{sc}}),
    btot AS (
      SELECT band, CAST(SUM(n_toks) AS BIGINT) AS btoks
      FROM banded GROUP BY band),
    boff AS (
      SELECT a.band,
             CAST(COALESCE(SUM(b.btoks), 0) AS BIGINT) AS off_toks
      FROM btot a LEFT JOIN btot b ON b.band < a.band
      GROUP BY a.band),
    ranked AS (
      SELECT d.doc_id, d.n_toks, d.q_micro,
             o.off_toks
               + CAST(COALESCE(SUM(d.n_toks) OVER (PARTITION BY d.band
                        ORDER BY d.q_micro DESC, d.doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS toks_before
      FROM banded d JOIN boff o ON d.band = o.band)
    SELECT doc_id, n_toks, q_micro, toks_before
    FROM ranked
    WHERE toks_before < 10000
    ORDER BY q_micro DESC, doc_id
    LIMIT 2000
"""
_BUDGET_SCORED_SPARK = r"""
      SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_toks,
             CAST(round(
               (least(size(split(trim(text), '\\s+')) / 50.0, 1.0) * 0.6
                + (1.0 - least(CAST(regexp_count(text, '[^a-z0-9 ]') AS DOUBLE)
                               / greatest(length(text), 1) * 10.0, 1.0)) * 0.4)
               * 1000000) AS BIGINT) AS q_micro
      FROM documents"""
_BUDGET_SCORED_DUCK = r"""
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_toks,
             CAST(round(
               (least(len(string_split_regex(trim(text), '\s+')) / 50.0, 1.0)
                  * 0.6
                + (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]'))
                                    AS DOUBLE)
                               / greatest(length(text), 1) * 10.0, 1.0)) * 0.4)
               * 1000000) AS BIGINT) AS q_micro
      FROM documents"""

register_split_sql(
    "cur_token_budget_greedy",
    # the |docs|-sized scored table feeds the boundary aggregate AND the
    # banding pass — materialized once (one documents scan).
    stages=[(_BUDGET_SCORED_SPARK, "tbg_scored_m")],
    final_sql="WITH " + _BUDGET_BODY.format(sc="tbg_scored_m").lstrip(),
    oracle="WITH scored AS ("
    + _BUDGET_SCORED_DUCK
    + "),\n"
    + _BUDGET_BODY.format(sc="scored").lstrip(),
    tags=("curation", "token-budget", "llm-pipeline"),
)
