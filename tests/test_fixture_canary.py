"""Fixture-shape canary — fails LOUDLY when the driver regenerates testdata.

Round-3 post-mortem: the driver silently re-encoded ``events.ts`` from parquet
TIMESTAMP(NANOS) (read as int64 under the legacy conf) to TIMESTAMP(MICROS)
(read as timestamp_ntz), and the loader's hard-coded nanos branch took down
72 tests, 25/50 driver oracle checks and the whole bench with one identical
AnalysisException.  This module is the early-warning system: one readable
failure naming the fixture format, instead of a wall of stack traces.

The loader itself (sources/tables.py) now branches on the observed dtype —
schema-on-read, the same semantic the reference lakehouse relies on
(/root/reference/trino/sql/init-tables.sql:3-4 stores varchar + casts at
query time; the Iceberg sink runs evolve-schema, /root/reference/run.sh:97).
"""

from __future__ import annotations

import datetime

import pytest

from data_pipeline_cursor_spark.sources.tables import TABLE_NAMES, load_table

from .conftest import SF_ORACLE, SF_SMOKE


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_all_fixture_tables_load(spark, sf_dir):
    """Every fixture table must be loadable and non-empty at both SFs."""
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() == 1, (
            f"fixture table {name!r} at {sf_dir} loaded but is empty — "
            "did the driver regenerate testdata with a different layout?"
        )


def test_events_ts_lands_as_timestamp(spark):
    """events.ts must surface as TimestampType regardless of storage format.

    The fixture has been observed in two physical encodings (int64 nanos,
    TIMESTAMP(MICROS) ntz); the loader normalizes both.  If this fails, the
    driver regenerated the fixture with a THIRD encoding — fix
    sources/tables.py:load_table, not the 100 downstream queries.
    """
    ev = load_table(spark, SF_ORACLE, "events")
    dtypes = dict(ev.dtypes)
    assert dtypes["ts"] == "timestamp", (
        f"events.ts loaded as {dtypes['ts']!r}, expected 'timestamp'. "
        "The testdata fixture format changed — update the dtype branch in "
        "data_pipeline_cursor_spark/sources/tables.py:load_table."
    )


def test_events_ts_wall_clock_bounds(spark):
    """Loaded ts values must land in a plausible wall-clock era.

    Catches silent unit errors that a dtype check alone would miss: ns
    read as µs lands in year ~1971, µs read as ns in year ~56000, ms-vs-µs
    is off by 1000×.  The bounds are deliberately WIDE (2000..2100) so a
    legitimately re-dated fixture regeneration does not false-fail — only
    unit-scale mistakes do (current fixtures span 2024-01, TESTDATA.md).
    """
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_ORACLE, "events")
    row = ev.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo_ok = datetime.datetime(2000, 1, 1) <= row["lo"]
    hi_ok = row["hi"] <= datetime.datetime(2100, 1, 1)
    assert lo_ok and hi_ok, (
        f"events.ts range [{row['lo']} .. {row['hi']}] is outside any "
        "plausible fixture era — a timestamp-unit mix-up in "
        "sources/tables.py:load_table (ns vs µs vs ms)."
    )


def test_events_ids_unique(spark):
    """s_dedup_stream's oracle (COUNT DISTINCT == COUNT(*)) and several
    keyed operators assume event_id is unique in the fixture.  With
    replayed ids the streaming dedup's keeper becomes arrival-order
    dependent and those oracles must be demoted to rows-only — this canary
    makes that precondition explicit instead of a silent hash mismatch."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_ORACLE, "events")
    dup = (
        ev.groupBy("event_id").count().filter(F.col("count") > 1).limit(1)
    ).count()
    assert dup == 0, (
        "events.event_id has duplicates — demote s_dedup_stream's oracle "
        "to rows-only (see its oracle comment) and audit keyed operators"
    )


def test_loader_rejects_unknown_ts_encoding(spark, tmp_path):
    """A THIRD events.ts encoding must fail with the loader's readable
    TypeError naming the dtype — not 72 identical AnalysisExceptions
    downstream (the round-3 failure mode this module exists to prevent)."""
    import shutil

    import pytest

    from data_pipeline_cursor_spark.sources.tables import (
        TABLE_NAMES,
        load_table,
    )

    fake_sf = tmp_path / "sfx"
    fake_sf.mkdir()
    # string-typed ts = an encoding the loader has never seen
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(fake_sf / "_ev"))
    part = next((fake_sf / "_ev").glob("part-*.parquet"))
    shutil.copy(part, fake_sf / "events.parquet")

    with pytest.raises(TypeError, match="unexpected dtype"):
        load_table(spark, str(fake_sf), "events")
