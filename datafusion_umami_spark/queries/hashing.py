"""Shared portable 60-bit hash convention (single source of truth).

  spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  duckdb: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)

Both take the top 15 hex digits of md5 and parse them as an integer, so
hash-driven selection (dedup, decontamination, sampling, splitting)
picks the SAME rows on both engines.  Any change here (e.g. widening
the substr) must stay mirrored between the two strings — that is the
whole reason the pair lives in one module.
"""

from __future__ import annotations

SPARK_H64 = "CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
DUCK_H64 = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"
