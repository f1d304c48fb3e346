"""Streaming-at-scale evidence (round-7 item 5): drain the stateful
streaming jobs over the sf1 events fixture (~1 M events, 10x the bench
fixture) with the ROCKSDB state store provider, and record per-job wall
drain time, output rows, and on-disk checkpoint/state size.

RocksDB matters because it is the provider a 100 TB deployment runs:
state lives off-heap/on-disk with incremental snapshots, so per-key
state growth (s_ewma_state's resequencing buffers, s_funnel's per-user
progress) hits the provider architecture that will actually carry it,
not the HDFS-backed in-memory map the sf0.01 tests default to.

Usage: python scripts/stream_scale_run.py [sf_dir] [job,job,...]
Prints one JSON line at the end; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = ["s_tumble", "s_upsert_foreachbatch", "s_ewma_state", "s_funnel"]


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    jobs = sys.argv[2].split(",") if len(sys.argv) > 2 else JOBS

    from data_pipeline_cursor_spark.registry import get_queries
    from data_pipeline_cursor_spark.session import (
        ROCKSDB_STATE_PROVIDER,
        get_spark,
    )
    from data_pipeline_cursor_spark.streaming.jobs import _work

    spark = get_spark("stream-scale")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        ROCKSDB_STATE_PROVIDER,
    )
    from data_pipeline_cursor_spark.streaming.sources import (
        LAST_STATE_PROGRESS,
    )

    qs = get_queries()
    ckpt_root = _work("ckpt")
    out: dict[str, dict] = {}
    for name in jobs:
        before = (
            set(os.listdir(ckpt_root)) if os.path.isdir(ckpt_root) else set()
        )
        LAST_STATE_PROGRESS.clear()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = round(time.perf_counter() - t0, 1)
        new = (
            sorted(set(os.listdir(ckpt_root)) - before)
            if os.path.isdir(ckpt_root)
            else []
        )
        size = sum(du(os.path.join(ckpt_root, d)) for d in new)
        out[name] = {
            "drain_sec": dt,
            "out_rows": n,
            # LIVE state at peak, from StreamingQueryProgress
            # stateOperators[].memoryUsedBytes — the honest bounded-state
            # number (r10 VERDICT item 3); 0 for stateless/foreachBatch-
            # folded jobs whose state lives outside the state store
            "live_state_bytes_peak": LAST_STATE_PROGRESS.get(
                "state_bytes_peak", 0
            ),
            "live_state_rows_peak": LAST_STATE_PROGRESS.get(
                "state_rows_peak", 0
            ),
            "n_batches": LAST_STATE_PROGRESS.get("n_batches", 0),
            # True would mean recentProgress rolled over its (10k)
            # window and the peak MAY be understated (ADVICE r11) —
            # always False at fixture batch counts, recorded so a
            # silent truncation can never masquerade as a real peak
            "progress_window_saturated": LAST_STATE_PROGRESS.get(
                "progress_window_saturated", False
            ),
            # cumulative on-disk checkpoint retention across the drain's
            # micro-batches — RETENTION, not live state; kept for the
            # storage-footprint story only
            "ckpt_retained_bytes": size,
        }
        print(f"# {name}: {out[name]}", flush=True)
    print(json.dumps({"sf": sf_dir, "provider": "rocksdb", "jobs": out}))


if __name__ == "__main__":
    main()
