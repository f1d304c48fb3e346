from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from data_pipeline_cursor_spark.session import get_spark

    spark = get_spark("tests")
    # Local test shape: small data → fewer shuffle partitions keeps latency low.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
