"""Train/eval decontamination + repetition-quality + TF-IDF operators.

These complete the LLM-training-data pipeline family (brief: dedup,
similarity, text analysis): before training, a corpus must be checked
for n-gram overlap against held-out evaluation sets (the standard
13-gram decontamination from the GPT-3/PaLM appendices, public
methodology), filtered for degenerate repetition (the Gopher/
MassiveText repetition rules: duplicate-word fraction, top-bigram
fraction), and profiled for salient terms (classic TF-IDF).

Spark-first design, 100 TB notes per query in docstrings/comments:
- n-gram generation is a pure map (split → higher-order transform →
  explode) inside whole-stage codegen — no Python, no UDFs;
- the eval-set n-gram table is tiny relative to the corpus (held-out
  benchmarks are MBs, corpora are TBs) → Catalyst broadcasts it; the
  only shuffle keyed by the corpus carries (doc_id, ngram-hash);
- per-doc statistics use one partial-aggregating groupBy on doc_id.

Reference parity: the reference engine has no corpus-analysis surface
(its string/regex functions stop at scalar transforms,
functions/src/string/ and functions/src/regex/); this module is
capability-superset work mandated by the build brief.

Portable 60-bit hash convention: queries/hashing.py (single source).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

from datafusion_umami_spark.queries.hashing import DUCK_H64, SPARK_H64  # noqa: E402

# --- word 5-gram builders (same degenerate-tail convention as dedup.py's
# 3-gram shingles: documents shorter than n repeat the last word, which
# both engines compute identically) ---------------------------------------

_SP_5G = r"""
      SELECT {cols}, ngram
      FROM {src}
      LATERAL VIEW explode(
        transform(sequence(1, greatest(size(ws) - 4, 1)),
                  i -> concat_ws(' ',
                         element_at(ws, i),
                         element_at(ws, least(i + 1, size(ws))),
                         element_at(ws, least(i + 2, size(ws))),
                         element_at(ws, least(i + 3, size(ws))),
                         element_at(ws, least(i + 4, size(ws)))))) t AS ngram
"""

_DU_5G = r"""
      SELECT {cols}, unnest(
        list_transform(range(1, greatest(len(ws) - 4, 1) + 1),
                  i -> concat_ws(' ',
                         ws[i],
                         ws[least(i + 1, len(ws))],
                         ws[least(i + 2, len(ws))],
                         ws[least(i + 3, len(ws))],
                         ws[least(i + 4, len(ws))]))) AS ngram
      FROM {src}
"""

# Corpus = every source except src0; eval set = src0 (a held-out 5%
# slice standing in for a benchmark suite). At 100 TB the asymmetry is
# far larger — which is exactly why eg broadcasts.

_SP_DECON_CTES = f"""
    corpus AS (SELECT doc_id, split(trim(text), '\\\\s+') AS ws
               FROM documents WHERE source <> 'src0'),
    eval_docs AS (SELECT doc_id, split(trim(text), '\\\\s+') AS ws
                  FROM documents WHERE source = 'src0'),
    cg AS (SELECT DISTINCT doc_id, {SPARK_H64.format(s='ngram')} AS h
           FROM ({_SP_5G.format(cols='doc_id', src='corpus')})),
    eg AS (SELECT DISTINCT doc_id, {SPARK_H64.format(s='ngram')} AS h
           FROM ({_SP_5G.format(cols='doc_id', src='eval_docs')}))
"""

_DU_DECON_CTES = f"""
    corpus AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
               FROM documents WHERE source <> 'src0'),
    eval_docs AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                  FROM documents WHERE source = 'src0'),
    cg AS (SELECT DISTINCT doc_id, {DUCK_H64.format(s='ngram')} AS h
           FROM ({_DU_5G.format(cols='doc_id', src='corpus')})),
    eg AS (SELECT DISTINCT doc_id, {DUCK_H64.format(s='ngram')} AS h
           FROM ({_DU_5G.format(cols='doc_id', src='eval_docs')}))
"""

# Per-corpus-doc contamination: distinct 5-grams hit by ANY eval doc /
# total distinct 5-grams.  eh drops eval doc_ids before the probe join
# so a doc whose n-gram appears in several eval docs counts it once.
_DECON_BODY = """
    eh AS (SELECT DISTINCT h FROM eg),
    hit AS (
      SELECT cg.doc_id,
             COUNT(*) AS n_total,
             COUNT(eh.h) AS n_hit
      FROM cg LEFT JOIN eh ON cg.h = eh.h
      GROUP BY cg.doc_id)
    SELECT doc_id,
           CAST(n_total AS BIGINT) AS n_ngrams,
           CAST(n_hit AS BIGINT) AS n_contaminated,
           ROUND(CAST(n_hit AS DOUBLE) / n_total, 6) AS contamination_frac,
           CAST(CASE WHEN n_hit * 5 >= n_total THEN 1 ELSE 0 END AS BIGINT)
             AS flag_contaminated
    FROM hit
    ORDER BY doc_id
    LIMIT 2000
"""

register_sql(
    "text_decontam_flags",
    "WITH " + _SP_DECON_CTES + "," + _DECON_BODY,
    oracle="WITH " + _DU_DECON_CTES + "," + _DECON_BODY,
    tags=("text", "decontamination", "llm-pipeline"),
)

# Which eval doc contaminates which corpus doc (audit view): inner join
# on the ngram hash, counted per (corpus, eval) pair.  The join is an
# equi-join on the hash — candidate pairs only materialize where an
# actual n-gram collision exists, never an all-pairs comparison.
_PAIR_BODY = """
    pairs AS (
      SELECT cg.doc_id AS corpus_doc, eg.doc_id AS eval_doc,
             COUNT(*) AS n_shared
      FROM cg JOIN eg ON cg.h = eg.h
      GROUP BY cg.doc_id, eg.doc_id)
    SELECT corpus_doc, eval_doc, CAST(n_shared AS BIGINT) AS n_shared
    FROM pairs
    WHERE n_shared >= 3
    ORDER BY n_shared DESC, corpus_doc, eval_doc
    LIMIT 1000
"""

register_sql(
    "text_decontam_pair_overlap",
    "WITH " + _SP_DECON_CTES + "," + _PAIR_BODY,
    oracle="WITH " + _DU_DECON_CTES + "," + _PAIR_BODY,
    tags=("text", "decontamination", "llm-pipeline"),
)

# --- Gopher/MassiveText repetition signals --------------------------------
# duplicate-word fraction (1 - distinct/total) is computed with
# array_distinct INSIDE the row — zero shuffle; the top-bigram fraction
# needs a per-(doc, bigram) count → one partial-aggregating groupBy.
# The flag thresholds are the published MassiveText ones scaled to these
# short synthetic docs.

_REP_BODY = """
    tot AS (SELECT doc_id,
                   CAST({size_fn}(ws) AS BIGINT) AS n_tok,
                   CAST({size_fn}({distinct_fn}(ws)) AS BIGINT) AS n_uniq
            FROM toks),
    bgc AS (SELECT doc_id, bigram, COUNT(*) AS c
            FROM bg GROUP BY doc_id, bigram),
    top AS (SELECT doc_id, MAX(c) AS top_c FROM bgc GROUP BY doc_id)
    SELECT t.doc_id, t.n_tok,
           ROUND(1.0 - CAST(t.n_uniq AS DOUBLE) / t.n_tok, 6)
             AS dup_word_frac,
           ROUND(2.0 * CAST(p.top_c AS DOUBLE) / t.n_tok, 6)
             AS top_bigram_frac,
           CAST(CASE WHEN t.n_uniq * 10 <= t.n_tok * 3
                       OR p.top_c * 10 >= t.n_tok * 2
                     THEN 1 ELSE 0 END AS BIGINT) AS flag_repetitive
    FROM tot t JOIN top p ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
    LIMIT 2000
"""

_SP_BIGRAMS = r"""
      SELECT doc_id, bigram
      FROM toks
      LATERAL VIEW explode(
        transform(sequence(1, greatest(size(ws) - 1, 1)),
                  i -> concat_ws(' ', element_at(ws, i),
                                 element_at(ws, least(i + 1, size(ws)))))) t
        AS bigram
"""

_DU_BIGRAMS = r"""
      SELECT doc_id, unnest(
        list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
                  i -> concat_ws(' ', ws[i],
                                 ws[least(i + 1, len(ws))]))) AS bigram
      FROM toks
"""

register_sql(
    "text_repetition_gopher",
    r"""
    WITH toks AS (SELECT doc_id, split(trim(text), '\\s+') AS ws
                  FROM documents),
    bg AS ("""
    + _SP_BIGRAMS
    + """),"""
    + _REP_BODY.format(size_fn="size", distinct_fn="array_distinct"),
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                  FROM documents),
    bg AS ("""
    + _DU_BIGRAMS
    + """),"""
    + _REP_BODY.format(size_fn="len", distinct_fn="list_distinct"),
    tags=("text", "repetition", "quality", "llm-pipeline"),
)

# --- TF-IDF top terms per document ----------------------------------------
# tf: one groupBy (doc_id, word); df: one groupBy (word) — the df table
# is vocabulary-sized (tiny vs the corpus) so the score join broadcasts;
# the per-doc top-3 is a WindowGroupLimit (rank pushdown), not a full
# sort.  Scores round to 4 decimals BEFORE ranking so the float ulp of
# ln() can't flip cross-engine ordering (ties break on the word).

_TFIDF_BODY = """
    tf AS (SELECT doc_id, word, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, word),
    dfreq AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
              FROM tok GROUP BY word),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      -- scalar subquery (not CROSS JOIN): Spark executes it once and
      -- inlines the literal, avoiding a nested-loop join against the
      -- 1-row count relation
      SELECT tf.doc_id, tf.word, tf.tf,
             ROUND(tf.tf * (ln(((SELECT n_docs FROM n) + 1.0)
                                / (dfreq.df + 1.0)) + 1.0), 4)
               AS tfidf
      FROM tf JOIN dfreq ON tf.word = dfreq.word),
    ranked AS (
      SELECT doc_id, word, tf, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rk
      FROM scored)
    SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, tfidf,
           CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= 3
    ORDER BY doc_id, rk
    LIMIT 2000
"""

register_sql(
    "text_tfidf_top_terms",
    r"""
    WITH tok AS (
      SELECT doc_id, word
      FROM (SELECT doc_id, split(trim(text), '\\s+') AS ws FROM documents)
      LATERAL VIEW explode(ws) t AS word),"""
    + _TFIDF_BODY,
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(ws) AS word
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
            FROM documents)),"""
    + _TFIDF_BODY,
    tags=("text", "tfidf", "llm-pipeline"),
)
