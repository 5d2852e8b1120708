"""Structured Streaming support.

The reference's streaming surface is pull-based incremental execution of
unbounded sources with bounded state (StreamingTableExec,
physical-plan/src/streaming.rs:63; SymmetricHashJoinExec,
joins/symmetric_hash_join.rs:173; BoundedWindowAggExec) — it has NO
event-time/watermark semantics (SURVEY.md §2.11).  Spark Structured
Streaming is a capability superset: event-time windows, watermarks,
stateful operators.  This package provides the plumbing to run a
streaming plan over the driver's bounded parquet tables and land the
result in a queryable (and oracle-checkable) batch table.
"""

from datafusion_umami_spark.streaming.runner import read_events_stream, stream_to_memory

__all__ = ["read_events_stream", "stream_to_memory"]
