"""Text-analysis operators for large-scale training-data pipelines:
token counting, language-ID heuristic, quality scoring, document
fingerprinting.

These extend the reference's string/regex surface (SURVEY.md §2.8)
to the LLM-data-pipeline operations the build brief requires. All
expressions are JVM-side (regexp_count / split / length arithmetic) —
they run inside whole-stage codegen and scale linearly with no shuffle
(pure map over `documents`).

Portable 60-bit hash convention (shared with dedup.py):
  spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  duckdb: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

SPARK_H64 = "CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
DUCK_H64 = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"

register_sql(
    "text_token_stats",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws,
           CAST(regexp_count(text, '[a-z0-9]+') AS BIGINT) AS n_word_tokens,
           CAST(regexp_count(text, "[a-z]+|[0-9]+|[^a-z0-9\\s]") AS BIGINT) AS n_bpe_ish_tokens,
           ROUND(CAST(length(text) AS DOUBLE)
                 / greatest(size(split(trim(text), '\\s+')), 1), 6) AS chars_per_token
    FROM documents
    """,
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_ish_tokens,
           ROUND(CAST(length(text) AS DOUBLE)
                 / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS chars_per_token
    FROM documents
    """,
    tags=("text", "tokenize", "llm-pipeline"),
)

# Language-ID: n-gram/marker-word scoring. Deterministic heuristic —
# scores a few high-frequency marker patterns per language and picks the
# argmax (ties break by fixed language order).
_SPARK_LANGID = r"""
    WITH scored AS (
      SELECT doc_id, lang,
             regexp_count(text, '\\b(the|a|of)\\b') AS s_en,
             regexp_count(text, '\\b(el|la|de|que)\\b') AS s_es,
             regexp_count(text, '\\b(der|die|das|und)\\b') AS s_de,
             regexp_count(text, '\\b(le|la|et|les)\\b') AS s_fr
      FROM documents)
    SELECT doc_id, lang,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_es AS BIGINT) AS s_es,
           CAST(s_de AS BIGINT) AS s_de, CAST(s_fr AS BIGINT) AS s_fr,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
"""

register_sql(
    "text_langid_ngram",
    _SPARK_LANGID,
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '\b(the|a|of)\b')) AS s_en,
             len(regexp_extract_all(text, '\b(el|la|de|que)\b')) AS s_es,
             len(regexp_extract_all(text, '\b(der|die|das|und)\b')) AS s_de,
             len(regexp_extract_all(text, '\b(le|la|et|les)\b')) AS s_fr
      FROM documents)
    SELECT doc_id, lang,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_es AS BIGINT) AS s_es,
           CAST(s_de AS BIGINT) AS s_de, CAST(s_fr AS BIGINT) AS s_fr,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
    tags=("text", "langid", "llm-pipeline"),
)

register_sql(
    "text_quality_score",
    r"""
    WITH feats AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(regexp_count(text, '[^a-z0-9 ]') AS DOUBLE) AS n_punct,
             CAST(regexp_count(text, '\\b(the|a|of|and|is|in|to)\\b') AS DOUBLE) AS n_stop
      FROM documents)
    SELECT doc_id,
           ROUND(n_punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
           ROUND(n_stop / greatest(n_tokens, 1.0), 6) AS stopword_ratio,
           ROUND(n_chars / greatest(n_tokens, 1.0), 6) AS mean_token_len,
           ROUND(least(n_tokens / 50.0, 1.0) * 0.4
                 + least(n_stop / greatest(n_tokens, 1.0) * 5.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2,
                 6) AS quality_score
    FROM feats
    """,
    oracle=r"""
    WITH feats AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) AS n_punct,
             CAST(len(regexp_extract_all(text, '\b(the|a|of|and|is|in|to)\b')) AS DOUBLE) AS n_stop
      FROM documents)
    SELECT doc_id,
           ROUND(n_punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
           ROUND(n_stop / greatest(n_tokens, 1.0), 6) AS stopword_ratio,
           ROUND(n_chars / greatest(n_tokens, 1.0), 6) AS mean_token_len,
           ROUND(least(n_tokens / 50.0, 1.0) * 0.4
                 + least(n_stop / greatest(n_tokens, 1.0) * 5.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2,
                 6) AS quality_score
    FROM feats
    """,
    tags=("text", "quality", "llm-pipeline"),
)

_sp_content_h = SPARK_H64.format(s="lower(trim(text))")
_sp_prefix_expr = "array_join(slice(split(trim(text), '\\\\s+'), 1, 8), ' ')"
_sp_prefix_h = SPARK_H64.format(s=_sp_prefix_expr)
_du_content_h = DUCK_H64.format(s="lower(trim(text))")
_du_prefix_expr = "array_to_string(string_split_regex(trim(text), '\\s+')[1:8], ' ')"
_du_prefix_h = DUCK_H64.format(s=_du_prefix_expr)

register_sql(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           {_sp_content_h} AS content_h60,
           {_sp_prefix_h} AS prefix8_h60,
           md5(array_join(array_sort(array_distinct(split(trim(text), '\\\\s+'))), ' ')) AS bag_of_words_md5
    FROM documents
    """,
    oracle=f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           {_du_content_h} AS content_h60,
           {_du_prefix_h} AS prefix8_h60,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\\s+'))), ' ')) AS bag_of_words_md5
    FROM documents
    """,
    tags=("text", "fingerprint", "llm-pipeline"),
)
