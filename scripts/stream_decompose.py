"""Decompose one streaming drain's wall-clock into its fixed-cost parts
(round-14 VERDICT item 2): query start, per-batch trigger components
(from StreamingQueryProgress.durationMs), query stop, and the memory-sink
readback — so the optimization targets the component that actually
dominates instead of the folklore "~1.5 s of start/stop".

Usage: python scripts/stream_decompose.py s_tumble [s_funnel ...]

Prints, per query: total wall, fixture time, start() time, drain time,
per-batch durationMs breakdown (addBatch / walCommit / commitOffsets /
queryPlanning / getBatch / latestOffset / triggerExecution), and the
post-drain batch-readback time.  Instrumentation-only — no engine code
is touched; the query callables run exactly as registered, except that
the probe wraps run_to_completion/StreamingQuery methods with timers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["s_tumble"]

    from data_pipeline_cursor_spark.registry import get_queries
    from data_pipeline_cursor_spark.session import get_spark
    from data_pipeline_cursor_spark.streaming import sources as ss

    spark = get_spark("stream-decompose")
    queries = get_queries()

    # warm like bench.py
    from data_pipeline_cursor_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # monkeypatch run_to_completion to time start/drain and capture progress
    orig_rtc = ss.run_to_completion
    probe: dict = {}

    def timed_rtc(stream_df, checkpoint, out_mode="append", state_parts=None):
        import uuid

        sp = stream_df.sparkSession
        name = "m" + uuid.uuid4().hex[:12]
        with ss.stream_state_partitions(sp, state_parts or 8):
            t0 = time.perf_counter()
            q = (
                stream_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(out_mode)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            t_start = time.perf_counter() - t0
            q.awaitTermination()
            t_drain = time.perf_counter() - t0 - t_start
            ss.record_state_progress(q)
            batches = []
            for p in q.recentProgress:
                d = p if isinstance(p, dict) else json.loads(p.json)
                batches.append(
                    {
                        "batchId": d.get("batchId"),
                        "numInputRows": d.get("numInputRows"),
                        "durationMs": d.get("durationMs", {}),
                    }
                )
        probe.setdefault("drains", []).append(
            {"start_s": round(t_start, 3), "drain_s": round(t_drain, 3), "batches": batches}
        )
        return sp.table(name)

    ss.run_to_completion = timed_rtc
    # jobs.py imported run_to_completion by name — patch there too
    from data_pipeline_cursor_spark.streaming import jobs as sj

    orig_jobs_rtc = getattr(sj, "run_to_completion", None)
    if orig_jobs_rtc is not None:
        sj.run_to_completion = timed_rtc

    try:
        for name in names:
            fn = queries[name]
            # repeat twice: first call may build the landing fixture
            for rep in range(2):
                probe.clear()
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t_build = time.perf_counter() - t0
                df.write.format("noop").mode("overwrite").save()
                t_total = time.perf_counter() - t0
                out = {
                    "query": name,
                    "rep": rep,
                    "total_s": round(t_total, 3),
                    "build_s": round(t_build, 3),
                    "readback_s": round(t_total - t_build, 3),
                    "drains": probe.get("drains", []),
                }
                print(json.dumps(out))
    finally:
        ss.run_to_completion = orig_rtc
        if orig_jobs_rtc is not None:
            sj.run_to_completion = orig_jobs_rtc


if __name__ == "__main__":
    main()
