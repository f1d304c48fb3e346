"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_pipeline_cursor_spark``; this module is a
thin re-export of its registry (SURVEY.md §7.1).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_cursor_spark.registry import (  # noqa: E402
    get_foils,
    get_oracles,
    get_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-key tumbling-window AVG+COUNT — the batch twin of the reference's
    Flink job (/root/reference/flink/sql/weather-aggregation.sql:38-49).
    """
    from data_pipeline_cursor_spark.operators.time_windows import tumble_avg

    return tumble_avg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()


def foil_queries() -> set[str]:
    """Names in ``queries()`` registered as deliberate scale-calibration
    foils (measured-to-die-at-sf10 contrast plans, kept as recorded
    evidence): correctness-checked like everything else at sf0.01, but
    wholesale sized-run consumers should exclude them — see
    registry.register(foil=...)."""
    return get_foils()
