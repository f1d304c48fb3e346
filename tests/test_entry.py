"""Driver-contract smoke: entry() runs and returns rows on sf0.001."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "window_start",
        "window_end",
        "event_type",
        "avg_value",
        "n_events",
    }


def test_contract_shapes(spark):
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs), "every oracle key must have a query"
    assert callable(next(iter(qs.values())))
