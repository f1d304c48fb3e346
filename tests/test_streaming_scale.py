"""RocksDB state-store provider validation (round 7).

A 100 TB streaming deployment runs the RocksDB provider (off-heap,
on-disk, incremental snapshots) — not the default HDFS-backed in-memory
map the rest of the suite exercises.  These tests re-drain a stateful
job slice at sf0.01 with the provider swapped in and require the SAME
oracle hashes: provider choice must be invisible to results.

The sized run (sf1, ~1 M events; drain times + state sizes recorded in
BASELINE.md) lives in scripts/stream_scale_run.py — too slow for the
per-round suite.
"""

from __future__ import annotations

import pytest

from data_pipeline_cursor_spark.registry import get_oracles, get_queries
from data_pipeline_cursor_spark.session import (
    ROCKSDB_STATE_PROVIDER as ROCKSDB,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

# one per state shape: windowed agg, applyInPandasWithState resequencing,
# transformWithState-family order-exact funnel, plus the round-8
# bounded-register window sketches and the conditional-counter DQ gate
# (their per-window state rows must survive the provider swap too)
ROCKSDB_SLICE = [
    "s_tumble",
    "s_ewma_state",
    "s_funnel",
    "s_hll_window",
    "s_quality_gate",
]


@pytest.mark.parametrize("name", ROCKSDB_SLICE)
def test_rocksdb_provider_matches_oracle(spark, name):
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    try:
        compare_query(
            spark, name, get_queries()[name], get_oracles()[name], SF_ORACLE
        )
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)
