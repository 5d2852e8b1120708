"""Adaptive state-partition coalescing for streaming drains (r15).

Stateful streaming pins its state partition count to
spark.sql.shuffle.partitions at query start — AQE coalescing never
applies — so small inputs pay per-partition store commits that dwarf
compute.  streaming/runner derives
    n = min(shuffle.partitions, ceil(source_bytes / advisory))
(AQE's own rule, applied manually) around the drain, restoring the conf
afterwards.  Provably a no-op at scale: source_bytes/advisory exceeds
any shuffle.partitions long before 100 TB.
"""

from __future__ import annotations

import os

import pytest

from datafusion_umami_spark.streaming import runner


def test_parse_bytes_units():
    assert runner._parse_bytes("64MB") == 64 * 1024**2
    assert runner._parse_bytes("256m") == 256 * 1024**2
    assert runner._parse_bytes("1048576") == 1048576
    assert runner._parse_bytes("2g") == 2 * 1024**3
    assert runner._parse_bytes("1k") == 1024
    # unparseable falls back to the Spark default (64 MB), never raises
    assert runner._parse_bytes("banana") == 64 * 1024**2


def _with_source_bytes(spark, size):
    runner._SOURCE_BYTES[id(spark)] = size


def test_coalesce_rule_shrinks_only_below_current(spark):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        )
        _with_source_bytes(spark, 10 * 1024**2)  # 10 MB -> 1 partition
        assert runner._coalesced_state_partitions(spark) == 1
        _with_source_bytes(spark, 200 * 1024**2)  # 200 MB -> ceil = 4
        assert runner._coalesced_state_partitions(spark) == 4
        # at/above the configured parallelism the rule must be a NO-OP —
        # this is the 100 TB case (bytes/advisory >> partitions)
        _with_source_bytes(spark, 600 * 1024**2)
        assert runner._coalesced_state_partitions(spark) is None
        # unknown source size -> no-op
        runner._SOURCE_BYTES.pop(id(spark), None)
        assert runner._coalesced_state_partitions(spark) is None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
        )


def test_opt_out_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_COALESCE", "off")
    _with_source_bytes(spark, 1)
    assert runner._coalesced_state_partitions(spark) is None
    runner._SOURCE_BYTES.pop(id(spark), None)


@pytest.mark.parametrize("mode", ["on", "off"])
def test_cascade_results_identical_and_conf_restored(
    spark, sf_dir, mode, monkeypatch
):
    """The drain's RESULTS are partition-count independent (also pinned
    by the hostile-config parity gate at 3 partitions) and the
    shuffle.partitions conf is restored after stream_to_memory."""
    from datafusion_umami_spark.registry import all_queries

    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_COALESCE", mode)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    pdf = (
        all_queries()["stream_multires_cascade"](spark, sf_dir)
        .toPandas()
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    key = f"_cascade_{os.path.basename(sf_dir)}"
    cache = getattr(test_cascade_results_identical_and_conf_restored, "c", {})
    if key in cache:
        assert cache[key].equals(pdf), "coalesce on/off results diverged"
    cache[key] = pdf
    test_cascade_results_identical_and_conf_restored.c = cache
