"""Physical-plan introspection — the repo's "is this the plan I'd want at
100 TB?" toolkit (PLANS.md is the narrative; this is the code).

Every scale claim in PLANS.md reduces to a predicate over the executed
plan string: filters reached the scan (``PushedFilters``), the scan reads
only the projected columns (``ReadSchema``), dims broadcast instead of
shuffling, the hot path stays inside WholeStageCodegen, and the shuffle
count is the family minimum.  These helpers extract those facts so tests
(`tests/test_plans.py`) and interactive debugging assert on structure,
not on substring-split one-liners repeated per call site.

AQE caveat baked into `executed_plan(finalize=True)`: with adaptive
execution the chosen join strategy / shuffle elision is only real after
the query runs — inspecting an unexecuted DataFrame shows the initial
plan, which can claim a sort-merge join that AQE later converts to
broadcast.  Finalizing executes THIS DataFrame's QueryExecution (a noop
write would spawn a fresh one and leave `df`'s plan un-finalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """The executed (physical) plan as a string.

    finalize=True runs the query first so AQE's final plan — not the
    initial guess — is what's inspected.
    """
    if finalize:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(plan: str) -> str:
    """The ``PushedFilters: [...]`` payload of the (first) file scan —
    empty string when nothing was pushed.  Filters that appear here are
    evaluated against parquet row-group min/max stats; filters that only
    live in a post-scan Filter node re-read every row at 100 TB."""
    if "PushedFilters: [" not in plan:
        return ""
    return plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def read_schema(plan: str) -> str:
    """The ``ReadSchema:`` line of the (first) file scan — the columns
    the scan actually decodes.  A wide column appearing here for a
    narrow projection means column pruning failed."""
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:", 1)[1].splitlines()[0]


def exchange_count(plan: str) -> int:
    """Total Exchange operators (shuffles + broadcasts) in the plan."""
    return plan.count("Exchange")


def hash_exchange_count(plan: str) -> int:
    """Hash-partitioned shuffles only — the expensive kind; broadcast
    exchanges are excluded.  PLANS.md's shuffle inventory counts these."""
    return plan.count("Exchange hashpartitioning")


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def codegen_span_count(plan: str) -> int:
    """Number of WholeStageCodegen spans.  Fewer spans over the same
    operators = wider fused pipelines; zero means the hot path fell out
    of codegen entirely (e.g. an interpreted Python UDF crept in)."""
    return plan.count("WholeStageCodegen")


def plan_posture(df: DataFrame, finalize: bool = False) -> dict:
    """One-call summary of the scale-relevant plan facts — the dict a
    human (or a test) reads instead of eyeballing `.explain()` output."""
    plan = executed_plan(df, finalize=finalize)
    return {
        "pushed_filters": pushed_filters(plan),
        "read_schema": read_schema(plan),
        "exchanges": exchange_count(plan),
        "hash_exchanges": hash_exchange_count(plan),
        "broadcast_join": has_broadcast_join(plan),
        "sort_merge_join": has_sort_merge_join(plan),
        "codegen_spans": codegen_span_count(plan),
    }
