"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction / frame-sampling as Arrow-batched pandas
UDFs over mapInPandas.

Part of the LLM-data-pipeline surface. `mm_decode_features` runs a REAL
container codec: a pure-numpy RIFF/WAVE writer builds genuine WAV files
(PCM, 8- and 16-bit variants, extra chunks, word-aligned) into a binary
column, and an independent chunk-walking parser decodes them back —
no audio library needed, and the decode step is load-bearing (corrupt a
header byte and the query fails). The frame-sample / RMS / resize-pool
queries treat payload bytes as raw samples (headerless PCM / raster)
since their point is the 1-row→N-rows and pooling shapes, not parsing.

Scale notes: binary payloads ride in ordinary parquet BINARY columns —
vectorized scan, no driver materialization; mapInPandas streams Arrow
batches through Python with zero-copy into numpy, so per-batch overhead
is amortized (the pattern that makes Python feature extraction viable on
a 1000-executor cluster).
"""

from __future__ import annotations

import struct
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


_WAV_RATE = 8000


def _encode_wav(doc_id: int, pcm_source: bytes) -> bytes:
    """Pure-python RIFF/WAVE writer: a REAL, spec-conformant container.

    Samples come from the source bytes (pure-ASCII driver documents, so
    each byte is a known code the oracle can reproduce).  Even doc_ids
    get 8-bit unsigned PCM (samples = the bytes); odd doc_ids get 16-bit
    signed little-endian PCM (sample = code*256 - 32768).  Every third
    file also carries an unknown odd-sized chunk before `data` (with the
    RIFF word-alignment pad byte) so the decoder's chunk walk is
    genuinely exercised, not a fixed-offset read."""
    bits = 8 if doc_id % 2 == 0 else 16
    if bits == 8:
        data = pcm_source
    else:
        codes = np.frombuffer(pcm_source, dtype=np.uint8).astype(np.int32)
        data = (codes * 256 - 32768).astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, _WAV_RATE, _WAV_RATE * (bits // 8), bits // 8, bits
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if doc_id % 3 == 0:
        # odd-sized unknown chunk + required pad byte (RIFF word alignment)
        chunks.append(b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00")
    chunks.append(
        b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Pure-numpy WAV parser: validates RIFF/WAVE magic, walks chunks
    (honoring word alignment, skipping unknown ids) to find `fmt ` and
    `data`, and materializes PCM samples per the declared sample width.
    Returns (sample_rate, n_channels, bits_per_sample, samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    pos, end = 12, 8 + riff_len
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"not PCM: format {audio_format}")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    else:
        raise ValueError(f"unsupported sample width {bits}")
    return rate, n_channels, bits, samples


@register(
    "mm_decode_features",
    # the driver-generated documents are pure ASCII (verified at every SF),
    # so the PCM samples the real WAV codec round-trips are arithmetic in
    # the character codes — DuckDB recomputes header fields + sample stats
    # exactly: a FULL oracle over a genuine encode→parse→features chain.
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes,
             CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS bits
      FROM documents)
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(bits AS BIGINT) AS bits_per_sample,
           CAST(n AS BIGINT) AS n_samples,
           CAST(COALESCE(CASE WHEN bits = 8 THEN list_sum(codes)
                              ELSE 256 * list_sum(codes) - 32768 * n END, 0)
                AS BIGINT) AS sample_sum,
           CAST(CASE WHEN n = 0 THEN NULL
                     WHEN bits = 8 THEN list_max(codes)
                     ELSE 256 * list_max(codes) - 32768 END AS BIGINT) AS max_sample,
           CAST(CASE WHEN n = 0 THEN NULL
                     WHEN bits = 8 THEN codes[1]
                     ELSE 256 * codes[1] - 32768 END AS BIGINT) AS first_sample
    FROM b
    """,
    tags=("multimodal", "pandas-udf", "wav", "llm-pipeline"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec decode: stage 1 writes genuine WAV containers into a
    binary column (mapInPandas, Arrow-batched); stage 2 — a separate
    Arrow pass over only (doc_id, payload) — parses them back with the
    chunk-walking decoder and emits header fields + PCM sample stats.
    Cites reference multimedia-free surface: the engine itself never
    interprets binaries (datasource/src/source.rs treats bytes opaquely);
    this query proves the Spark-side plumbing AND a load-bearing parser."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("pcm")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _encode_wav(int(d), bytes(p))
                        for d, p in zip(pdf["doc_id"], pdf["pcm"])
                    ],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_channels": [],
                "bits_per_sample": [], "n_samples": [], "sample_sum": [],
                "max_sample": [], "first_sample": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n_ch, bits, samples = _decode_wav(bytes(payload))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(len(samples))
                out["sample_sum"].append(int(samples.sum()))
                out["max_sample"].append(int(samples.max()) if len(samples) else None)
                out["first_sample"].append(int(samples[0]) if len(samples) else None)
            yield pd.DataFrame(
                {
                    k: (pd.array(v, dtype="Int64")
                        if k in ("max_sample", "first_sample") else v)
                    for k, v in out.items()
                }
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return encoded.mapInPandas(
        decode,
        schema="doc_id long, sample_rate long, n_channels long, "
        "bits_per_sample long, n_samples long, sample_sum long, "
        "max_sample long, first_sample long",
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
