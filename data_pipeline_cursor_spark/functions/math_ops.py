"""Math functions (SURVEY.md §2.D D28) — Catalyst built-ins, codegen'd."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_math_funcs",
    oracle="""
    SELECT event_id,
           ROUND(value, 1)                          AS v_round,
           ROUND(abs(value - 100), 4)               AS v_absdiff,
           CAST(ceil(value) AS BIGINT)              AS v_ceil,
           CAST(floor(value) AS BIGINT)             AS v_floor,
           ROUND(sqrt(value), 4)                    AS v_sqrt,
           ROUND(pow(value, 2), 4)                  AS v_sq,
           ROUND(ln(value + 1), 4)                  AS v_ln,
           ((event_id % 7) + 7) % 7                 AS v_pmod,
           CAST(sign(value - 100) AS INTEGER)       AS v_sign
    FROM events
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/pow/ln/pmod/sign (D28)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round("value", 1).alias("v_round"),
        F.round(F.abs(F.col("value") - 100), 4).alias("v_absdiff"),
        F.ceil("value").alias("v_ceil"),
        F.floor("value").alias("v_floor"),
        F.round(F.sqrt("value"), 4).alias("v_sqrt"),
        F.round(F.pow("value", F.lit(2)), 4).alias("v_sq"),
        F.round(F.log(F.col("value") + 1), 4).alias("v_ln"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("v_pmod"),
        F.signum(F.col("value") - 100).cast("int").alias("v_sign"),
    )


def stable_round4(c):
    """Cross-engine-stable 4-decimal rounding for aggregate results.

    Quantizes the double at 10 decimals (absorbing summation-order ulps)
    BEFORE the HALF_UP round at 4.  Why: the fixture's values are 2-decimal
    quantized, so small-group averages land EXACTLY on .00005-family
    boundaries (e.g. 8 rows → .00125 steps); each engine's float sum then
    sits an ulp above or below the boundary and plain ROUND(x, 4) flips the
    last digit between Spark and DuckDB (observed on s_lakehouse_append's
    hourly averages: 30.721249999999994 vs 30.721250000000002 → 30.7212 vs
    30.7213).  The 10-decimal quantization snaps both to the same decimal
    before the visible round; the DuckDB oracle twin is
    ``CAST(ROUND(CAST(avg AS DECIMAL(28,10)), 4) AS DOUBLE)``.

    Repo determinism rule (registry.py): round floats where engines may
    disagree — this is that rule's aggregate-strength form.
    """
    return F.round(c.cast("decimal(28,10)"), 4).cast("double")


def cents_half_away(values):
    """Render nonnegative float dollars as exact integer cents with
    HALF-AWAY-FROM-ZERO rounding — ``floor(v*100 + 0.5)`` — matching both
    DuckDB's ``round(v*100, 0)`` and Spark's ``F.round`` (HALF_UP).

    Exists because pandas ``Series.round(0)`` is banker's half-to-even: a
    value landing exactly on a half cent (0.125 → 12.5) renders 12 there
    but 13 everywhere else, silently desyncing any pandas-side integer
    fold from its SQL oracle (round-5 ADVICE item).  Used by the q_ewma /
    s_ewma_state exact-cents recurrences.

    Accepts any array-like of nonnegative floats; returns int64 ndarray.
    """
    import numpy as np

    v = np.asarray(values, dtype="float64")
    # floor(v+0.5) is half-UP, which equals half-away ONLY for v >= 0 —
    # enforce the precondition instead of silently desyncing on a future
    # negative-valued caller (DuckDB/Spark round negatives AWAY from zero).
    if v.size and np.nanmin(v) < 0:
        raise ValueError("cents_half_away requires nonnegative values")
    return np.floor(v * 100 + 0.5).astype("int64")


@register(
    "q_try_arith",
    oracle="""
    SELECT event_id,
           ROUND(value / NULLIF(CAST(event_id % 5 AS DOUBLE), 0), 4) AS safe_div,
           TRY_CAST(props AS DOUBLE)                                 AS props_num,
           TRY_CAST(substr(event_type, 1, 4) AS INTEGER)             AS type_num
    FROM events
    """,
)
def try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_-family error-safe arithmetic (D30's expression-level form):
    try_divide → NULL on zero denominator, try_cast → NULL on malformed
    input instead of a task-killing exception.  The 100 TB argument: one
    bad row must never fail a 10k-task stage; NULL-and-filter beats
    rerun-the-stage."""
    ev = load_table(spark, sf_dir, "events")

    def _guarded_try_cast(col: Column, dtype: str) -> Column:
        # Under ANSI mode (Spark 4 default) try_cast catches a per-row
        # NumberFormatException for every non-numeric input — measured
        # 12 µs/row, 1.24 s for 100k all-alpha strings at sf0.1.  A
        # string that contains no digit AND no inf/nan token can never
        # cast to int or double (string→double additionally accepts
        # Infinity/inf/NaN spellings — verified empirically), so
        # short-circuit those rows to NULL with one cheap regex and keep
        # the exact try_cast semantics (including overflow → NULL and
        # the Infinity/NaN spellings) for anything that might be
        # numeric.  Over-inclusion is safe: a matching row merely pays
        # the original try_cast path.
        maybe_numeric = col.rlike("[0-9]") | col.rlike("(?i)inf|nan")
        return F.when(maybe_numeric, col.try_cast(dtype)).otherwise(
            F.lit(None).cast(dtype)
        )

    return ev.select(
        "event_id",
        F.round(
            F.try_divide(F.col("value"), (F.col("event_id") % 5).cast("double")), 4
        ).alias("safe_div"),
        _guarded_try_cast(F.col("props"), "double").alias("props_num"),
        _guarded_try_cast(F.substring("event_type", 1, 4), "int").alias(
            "type_num"
        ),
    )
