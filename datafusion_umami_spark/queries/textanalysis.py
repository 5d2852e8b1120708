"""Text-analysis operators for large-scale training-data pipelines:
token counting, language-ID heuristic, quality scoring, document
fingerprinting.

These extend the reference's string/regex surface (SURVEY.md §2.8)
to the LLM-data-pipeline operations the build brief requires. All
expressions are JVM-side (regexp_count / split / length arithmetic) —
they run inside whole-stage codegen and scale linearly with no shuffle
(pure map over `documents`).

Portable 60-bit hash convention: queries/hashing.py (single source).
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register_sql

from datafusion_umami_spark.queries.hashing import DUCK_H64, SPARK_H64  # noqa: E402

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
    bench=True,
    spread_tables=("documents",),
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


# --- winnowing fingerprint (true rolling hash) -------------------------------
# MOSS-style winnowing: polynomial rolling hash over every k=8-gram of
# the character stream (base 257 mod 1e9+7), then the min hash of each
# w=4 window of consecutive k-gram hashes; the distinct mins are the
# document's fingerprints.  Every step is a JVM-side higher-order array
# expression (no UDF) with per-term modular reduction so no product
# exceeds int64.  The DuckDB twin evaluates the identical arithmetic.
_K, _W, _B, _M = 8, 4, 257, 1_000_000_007
_POWS = [pow(_B, _K - 1 - j, _M) for j in range(_K)]


def _poly_terms(elem_at) -> str:
    """Unrolled `(Σ_j cs[i+j]·B^(k-1-j) mod M) mod M` for 1-indexed arrays."""
    terms = " + ".join(
        f"({elem_at('cs', f'i + {j}')} * {_POWS[j]}) % {_M}" for j in range(_K)
    )
    return f"({terms}) % {_M}"


_SP_HASH = _poly_terms(lambda arr, ix: f"element_at({arr}, {ix})")
_DU_HASH = _poly_terms(lambda arr, ix: f"{arr}[{ix}]")
_SP_WIN = ", ".join(f"element_at(khash, i + {j})" for j in range(_W))
_DU_WIN = ", ".join(f"khash[i + {j}]" for j in range(_W))

register_sql(
    "text_winnowing_fingerprint",
    f"""
    WITH codes AS (
      SELECT doc_id,
             transform(sequence(1, length(text)),
                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS cs,
             length(text) AS n
      FROM documents WHERE length(text) >= {_K + _W - 1}),
    kg AS (
      SELECT doc_id,
             transform(sequence(1, n - {_K - 1}), i -> {_SP_HASH}) AS khash
      FROM codes),
    wins AS (
      SELECT doc_id,
             array_distinct(transform(sequence(1, size(khash) - {_W - 1}),
                                      i -> least({_SP_WIN}))) AS fps
      FROM kg)
    SELECT doc_id,
           CAST(size(fps) AS BIGINT) AS n_fingerprints,
           CAST(aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT) AS fp_sum,
           CAST(array_min(fps) AS BIGINT) AS fp_min
    FROM wins
    """,
    oracle=f"""
    WITH codes AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS cs,
             length(text) AS n
      FROM documents WHERE length(text) >= {_K + _W - 1}),
    kg AS (
      SELECT doc_id,
             list_transform(range(1, n - {_K - 2}), i -> {_DU_HASH}) AS khash
      FROM codes),
    wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(khash) - {_W - 2}),
                                          i -> least({_DU_WIN}))) AS fps
      FROM kg)
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(list_sum(fps) AS BIGINT) AS fp_sum,
           CAST(list_min(fps) AS BIGINT) AS fp_min
    FROM wins
    """,
    tags=("text", "fingerprint", "rolling-hash", "winnowing", "llm-pipeline"),
)


# --- PII redaction (training-data scrubbing) --------------------------------
# Email / phone / SSN shaped patterns replaced with typed tokens; the
# patterns use the RE2-compatible subset (character classes, counted
# repetition) so Spark's Java regex and DuckDB's RE2 agree. The fixture
# text contains no PII-shaped substrings at any SF, so a deterministic
# augmentation step (identical on both engines) plants real positives
# on a doc_id-keyed subset — the regex parity is exercised on genuine
# matches AND non-matches, not vacuously. Pure map, zero shuffle.
_PII_AUG_SP = """
      SELECT doc_id,
             concat(text,
               CASE WHEN doc_id % 3 = 0
                    THEN concat(' contact user', CAST(doc_id AS STRING),
                                '@example.com now') ELSE '' END,
               CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789 on file' ELSE '' END,
               CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567 today' ELSE '' END)
               AS text
      FROM documents
"""
_PII_AUG_DU = """
      SELECT doc_id,
             concat(text,
               CASE WHEN doc_id % 3 = 0
                    THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                '@example.com now') ELSE '' END,
               CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789 on file' ELSE '' END,
               CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567 today' ELSE '' END)
               AS text
      FROM documents
"""

register_sql(
    "text_pii_redact",
    rf"""
    WITH aug AS ({_PII_AUG_SP}),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}', '<EMAIL>'),
                 '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '<SSN>'),
               '\\+?[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}', '<PHONE>') AS clean,
             text
      FROM aug)
    SELECT doc_id,
           CAST(length(text) - length(clean) AS BIGINT) AS chars_removed,
           CAST(regexp_count(clean, '<EMAIL>') AS BIGINT) AS n_emails,
           CAST(regexp_count(clean, '<SSN>') AS BIGINT) AS n_ssns,
           CAST(regexp_count(clean, '<PHONE>') AS BIGINT) AS n_phones,
           md5(clean) AS clean_md5
    FROM red
    ORDER BY doc_id
    LIMIT 1000
    """,
    oracle=rf"""
    WITH aug AS ({_PII_AUG_DU}),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
                 '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '<SSN>', 'g'),
               '\+?[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}', '<PHONE>', 'g') AS clean,
             text
      FROM aug)
    SELECT doc_id,
           CAST(length(text) - length(clean) AS BIGINT) AS chars_removed,
           CAST(len(regexp_extract_all(clean, '<EMAIL>')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(clean, '<SSN>')) AS BIGINT) AS n_ssns,
           CAST(len(regexp_extract_all(clean, '<PHONE>')) AS BIGINT) AS n_phones,
           md5(clean) AS clean_md5
    FROM red
    ORDER BY doc_id
    LIMIT 1000
    """,
    tags=("text", "pii", "redaction", "llm-pipeline"),
)


# --- paragraph-level exact dedup (C4/RefinedWeb-style substring dedup) ------
# Documents are split into fixed 5-word chunks (the fixture has no
# sentence punctuation, so word-window units are what repeats — 200+
# spans recur across documents at every SF); a unit appearing in more
# than one document is a repeated span. Output: the top repeated spans
# with their document frequency and the keeper doc — the line-level
# dedup pass that runs BEFORE document-level near-dup at corpus scale
# (explode -> hash-groupBy, one shuffle, linear).
register_sql(
    "text_paragraph_dedup",
    r"""
    WITH w AS (SELECT doc_id, split(trim(text), '\\s+') AS ws FROM documents),
    chunks AS (
      SELECT doc_id, chunk
      FROM w
      LATERAL VIEW explode(
        transform(sequence(0, greatest(size(ws) DIV 5 - 1, 0)),
                  i -> concat_ws(' ', slice(ws, i * 5 + 1, 5)))) t AS chunk
      WHERE size(ws) >= 5),
    good AS (SELECT doc_id, chunk FROM chunks WHERE length(chunk) >= 20),
    spans AS (
      SELECT md5(chunk) AS span_hash,
             MIN(chunk) AS span_text,
             COUNT(DISTINCT doc_id) AS doc_freq,
             MIN(doc_id) AS keeper_doc
      FROM good GROUP BY md5(chunk))
    SELECT span_hash, span_text, doc_freq, keeper_doc
    FROM spans
    WHERE doc_freq >= 2
    ORDER BY doc_freq DESC, span_hash
    LIMIT 500
    """,
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(range(0, greatest(len(ws) // 5, 1)),
                    i -> array_to_string(ws[i * 5 + 1 : i * 5 + 5], ' '))) AS chunk
      FROM w WHERE len(ws) >= 5),
    good AS (SELECT doc_id, chunk FROM chunks WHERE length(chunk) >= 20),
    spans AS (
      SELECT md5(chunk) AS span_hash,
             MIN(chunk) AS span_text,
             COUNT(DISTINCT doc_id) AS doc_freq,
             MIN(doc_id) AS keeper_doc
      FROM good GROUP BY md5(chunk))
    SELECT span_hash, span_text, doc_freq, keeper_doc
    FROM spans
    WHERE doc_freq >= 2
    ORDER BY doc_freq DESC, span_hash
    LIMIT 500
    """,
    tags=("text", "dedup", "paragraph", "llm-pipeline"),
)


# --- composed C4-style cleaning pipeline ------------------------------------
# The end-to-end shape an LLM data pipeline actually runs over a raw
# corpus: language gate → quality-feature gates (length band, mean
# token length, punctuation ratio) → exact-dup removal keeping the
# smallest doc_id per content hash.
#
# r14 split (guide §1/§5): `kept` is referenced TWICE (the dedup
# aggregate and the detail join-back), and Spark inlines CTEs — the
# inlined plan scanned documents twice and re-ran the split/regex/hash
# chain per reference.  Materializing `kept` once is the
# materialize.py-sanctioned shape: it is a REDUCED intermediate (text
# dropped — 7 narrow columns), and the re-scan it replaces is regex-
# dominated, not pushdown-cheap.  Plan effect: 2 documents scans → 1.
# The DuckDB oracle stays the original single statement.
_C4_KEPT = rf"""
    WITH gated AS (
      SELECT doc_id, lang, n_chars,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(regexp_count(text, '[^a-z0-9 ]') AS DOUBLE) AS n_punct,
             {SPARK_H64.format(s='text')} AS content_h
      FROM documents
      WHERE lang IN ('en', 'de', 'fr')
        AND n_chars BETWEEN 64 AND 4096
    ),
    scored AS (
      SELECT *,
             n_chars / greatest(n_tokens, 1.0) AS mean_tok_len,
             n_punct / greatest(CAST(n_chars AS DOUBLE), 1.0) AS punct_ratio
      FROM gated
    )
    SELECT * FROM scored
    WHERE n_tokens >= 10
      AND mean_tok_len BETWEEN 2.0 AND 12.0
      AND punct_ratio < 0.3
    """

_C4_FINAL = """
    WITH deduped AS (
      SELECT MIN(doc_id) AS doc_id, content_h, COUNT(*) AS n_copies
      FROM {kept} GROUP BY content_h
    )
    SELECT d.doc_id, k.lang,
           CAST(k.n_tokens AS BIGINT) AS n_tokens,
           ROUND(k.punct_ratio, 6) AS punct_ratio,
           CAST(d.n_copies AS BIGINT) AS n_copies
    FROM deduped d JOIN {kept} k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    LIMIT 2000
    """

register_split_sql(
    "pipeline_c4_style_filter",
    stages=[(_C4_KEPT, "c4_kept_m")],
    final_sql=_C4_FINAL.format(kept="c4_kept_m"),
    oracle=rf"""
    WITH gated AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) AS n_punct,
             {DUCK_H64.format(s='text')} AS content_h
      FROM documents
      WHERE lang IN ('en', 'de', 'fr')
        AND n_chars BETWEEN 64 AND 4096
    ),
    scored AS (
      SELECT *,
             n_chars / greatest(n_tokens, 1.0) AS mean_tok_len,
             n_punct / greatest(CAST(n_chars AS DOUBLE), 1.0) AS punct_ratio
      FROM gated
    ),
    kept AS (
      SELECT * FROM scored
      WHERE n_tokens >= 10
        AND mean_tok_len BETWEEN 2.0 AND 12.0
        AND punct_ratio < 0.3
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id, content_h, COUNT(*) AS n_copies
      FROM kept GROUP BY content_h
    )
    SELECT d.doc_id, k.lang,
           CAST(k.n_tokens AS BIGINT) AS n_tokens,
           ROUND(k.punct_ratio, 6) AS punct_ratio,
           CAST(d.n_copies AS BIGINT) AS n_copies
    FROM deduped d JOIN kept k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    LIMIT 2000
    """,
    tags=("text", "pipeline", "c4-style", "llm-pipeline"),
    bench=True,
    # no spread opt-in: measured — c4's regex total over documents is
    # smaller than the exchange it would buy (unlike text_token_stats)
)
