"""Capability gates — one place for the JVM-classpath probe that backs
every optional-integration gate (Kafka connector, Iceberg runtime, JDBC
driver).  Each gate keeps its own named wrapper (call sites read
`kafka_available(spark)`, not a class string), but the probe mechanics —
exception breadth, py4j quirks — live here once."""

from __future__ import annotations

from pyspark.sql import SparkSession


def jvm_class_available(spark: SparkSession, class_name: str) -> bool:
    """True iff `class_name` is loadable on the session JVM's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(class_name)
        return True
    except Exception:
        return False
