"""Tier-2 mirror: every registered (query, oracle) pair must hash-match.

Parametrizes over the registry so newly-registered operators are covered
automatically.  Queries registered without an oracle get a rows-only smoke
run (same as the driver's weaker check).
"""

from __future__ import annotations

import pytest

from data_pipeline_cursor_spark.registry import get_oracles, get_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query

QUERIES = get_queries()
ORACLES = get_oracles()

WITH_ORACLE = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, name):
    compare_query(spark, name, QUERIES[name], ORACLES[name], SF_ORACLE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    # every registered query produces rows at sf0.01 — an empty result is
    # a silent regression (broken filter/join key), not a pass
    assert df.count() > 0
    assert len(df.columns) > 0
