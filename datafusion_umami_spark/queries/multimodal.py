"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction / frame-sampling as Arrow-batched pandas
UDFs over mapInPandas.

Part of the LLM-data-pipeline surface. The container has no image/audio
libraries, so the *decode* step is a deterministic fake behind
`_decode_image_stub` (clearly marked; a real deployment swaps in
PIL/torchvision there — the Spark-side plumbing (schema, batch shape,
partitioning) is identical either way and is what these queries prove.

Scale notes: binary payloads ride in ordinary parquet BINARY columns —
vectorized scan, no driver materialization; mapInPandas streams Arrow
batches through Python with zero-copy into numpy, so per-batch overhead
is amortized (the pattern that makes Python feature extraction viable on
a 1000-executor cluster).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# --- binary column construction + metadata (oracle-checkable) -------------
register_sql(
    "mm_binary_plumbing",
    """
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           md5(payload) AS payload_md5,
           meta.width AS width, meta.height AS height, meta.channels AS channels,
           CAST(meta.width * meta.height * meta.channels AS BIGINT) AS n_pixels
    FROM (SELECT doc_id,
                 encode(text, 'UTF-8') AS payload,
                 named_struct('width', CAST(doc_id % 64 + 1 AS BIGINT),
                              'height', CAST(doc_id % 48 + 1 AS BIGINT),
                              'channels', CAST(3 AS BIGINT)) AS meta
          FROM documents)
    """,
    oracle="""
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           meta.width AS width, meta.height AS height, meta.channels AS channels,
           CAST(meta.width * meta.height * meta.channels AS BIGINT) AS n_pixels
    FROM (SELECT doc_id, text,
                 CAST(text AS BLOB) AS payload,
                 {'width': CAST(doc_id % 64 + 1 AS BIGINT),
                  'height': CAST(doc_id % 48 + 1 AS BIGINT),
                  'channels': CAST(3 AS BIGINT)} AS meta
          FROM documents)
    """,
    tags=("multimodal", "binary", "struct", "llm-pipeline"),
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'pixels' from the raw bytes.

    A real pipeline would do `PIL.Image.open(io.BytesIO(payload))` here;
    that library is absent in this container, so we expose the bytes as a
    uint8 vector — same shape contract (H*W flattening), fully
    deterministic, lets the downstream plumbing be tested for real.
    """
    return np.frombuffer(payload, dtype=np.uint8)


@register(
    "mm_decode_features",
    # the driver-generated documents are pure ASCII (verified at every SF),
    # so byte intensities == character codes and DuckDB can recompute the
    # stub-decoded features exactly — a FULL oracle for the UDF plumbing.
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes
      FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CASE WHEN n > 0 THEN list_sum(codes) / CAST(n AS DOUBLE) ELSE 0.0 END
             AS mean_intensity,
           CAST(CASE WHEN n > 0 THEN list_max(codes) ELSE 0 END AS BIGINT)
             AS max_intensity,
           CAST(CASE WHEN n > 0 THEN codes[1] ELSE -1 END AS BIGINT) AS first_byte
    FROM b
    """,
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas; the
    decode is the documented stub above. Arrow batches in, Arrow batches
    out — no per-row serde."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pixels.map(len).astype("int64"),
                    "mean_intensity": pixels.map(lambda a: float(a.mean()) if len(a) else 0.0),
                    "max_intensity": pixels.map(lambda a: int(a.max()) if len(a) else 0),
                    "first_byte": pixels.map(lambda a: int(a[0]) if len(a) else -1),
                }
            )

    return docs.mapInPandas(
        extract,
        schema="doc_id long, n_bytes long, mean_intensity double, max_intensity long, first_byte long",
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           i AS frame_idx,
           i * 16 AS offset,
           md5(substr(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_md5
    FROM documents
    CROSS JOIN LATERAL (SELECT unnest(range(0, length(text) // 16)) AS i) t
    WHERE i % 4 = 0
    ORDER BY doc_id, frame_idx
    LIMIT 1000
    """,
    tags=("multimodal", "pandas-udf", "video", "llm-pipeline"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat the payload as fixed-size 16-byte 'frames'
    and emit every 4th frame with its offset + checksum — the video
    keyframe-extraction shape (1 input row → N output rows) through
    mapInPandas."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frame, stride = 16, 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "offset": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame
                for idx in range(0, n_frames, stride):
                    chunk = payload[idx * frame : (idx + 1) * frame]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["offset"].append(idx * frame)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(
            sample, schema="doc_id long, frame_idx long, offset long, frame_md5 string"
        )
        .orderBy("doc_id", "frame_idx")
        .limit(1000)
    )


@register(
    "mm_audio_window_rms",
    oracle="""
    WITH w AS (
      SELECT doc_id, wi,
             list_transform(range(wi * 32 + 1, wi * 32 + 33),
                            i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS DOUBLE))
               AS cs
      FROM documents
      CROSS JOIN LATERAL (SELECT unnest(range(0, length(text) // 32)) AS wi) t)
    SELECT doc_id, wi AS window_idx,
           ROUND(sqrt(list_sum(list_transform(cs, c -> c * c)) / 32.0), 6) AS rms
    FROM w
    ORDER BY doc_id, window_idx
    LIMIT 1000
    """,
    tags=("multimodal", "pandas-udf", "audio", "llm-pipeline"),
)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed RMS over a fake PCM stream (bytes as int8
    samples, 32-sample windows) — the resample/feature shape for audio
    columns, vectorized inside each Arrow batch."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    win = 32

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "window_idx": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                n = len(samples) // win
                if n == 0:
                    continue
                windows = samples[: n * win].reshape(n, win)
                vals = np.sqrt((windows**2).mean(axis=1))
                out["doc_id"].extend([doc_id] * n)
                out["window_idx"].extend(range(n))
                out["rms"].extend(np.round(vals, 6))
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(rms, schema="doc_id long, window_idx long, rms double")
        .orderBy("doc_id", "window_idx")
        .limit(1000)
    )


@register(
    "mm_image_resize_pool",
    oracle="""
    WITH dims AS (
      SELECT doc_id, text, (length(text) // 32) // 2 AS h2
      FROM documents WHERE length(text) // 32 >= 2),
    cells AS (
      SELECT doc_id, r, c,
             (ascii(substr(text, (2*r) * 32 + 2*c + 1, 1))
            + ascii(substr(text, (2*r) * 32 + 2*c + 2, 1))
            + ascii(substr(text, (2*r + 1) * 32 + 2*c + 1, 1))
            + ascii(substr(text, (2*r + 1) * 32 + 2*c + 2, 1))) // 4 AS v
      FROM dims
      CROSS JOIN LATERAL (SELECT unnest(range(0, h2)) AS r) rs
      CROSS JOIN (SELECT unnest(range(0, 16)) AS c) cs)
    SELECT doc_id,
           CAST(MAX(r) + 1 AS BIGINT) AS out_h,
           CAST(16 AS BIGINT) AS out_w,
           CAST(SUM(v) AS BIGINT) AS pooled_sum,
           CAST(MIN(v) AS BIGINT) AS pooled_min,
           CAST(MAX(v) AS BIGINT) AS pooled_max
    FROM cells GROUP BY doc_id
    ORDER BY doc_id
    LIMIT 1000
    """,
    tags=("multimodal", "pandas-udf", "image", "resize", "llm-pipeline"),
)
def mm_image_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE shape: treat the payload as a 32-wide uint8 pixel
    grid and 2x2 average-pool it (integer floor mean — deterministic),
    emitting the resized dims + pooled statistics. The downsample every
    vision pipeline runs before feature extraction, as an Arrow-batched
    vectorized kernel; the DuckDB oracle recomputes the pooling
    arithmetically via the ASCII byte equivalence."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    w = 32

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "out_h": [], "out_w": [],
                "pooled_sum": [], "pooled_min": [], "pooled_max": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = len(payload) // w
                h2 = h // 2
                if h2 == 0:
                    continue
                arr = (
                    np.frombuffer(payload[: h * w], dtype=np.uint8)
                    .reshape(h, w)[: h2 * 2]
                    .astype(np.int64)
                )
                pooled = (
                    arr[0::2, 0::2] + arr[0::2, 1::2]
                    + arr[1::2, 0::2] + arr[1::2, 1::2]
                ) // 4
                out["doc_id"].append(doc_id)
                out["out_h"].append(h2)
                out["out_w"].append(w // 2)
                out["pooled_sum"].append(int(pooled.sum()))
                out["pooled_min"].append(int(pooled.min()))
                out["pooled_max"].append(int(pooled.max()))
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(
            pool,
            "doc_id long, out_h long, out_w long, "
            "pooled_sum long, pooled_min long, pooled_max long",
        )
        .orderBy("doc_id")
        .limit(1000)
    )
