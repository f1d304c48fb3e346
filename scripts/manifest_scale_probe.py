"""Sized probe of the manifest-list layout's commit-path metadata cost
(round-13; VERDICT r12 item 3's "done" row).

Builds a table with many small commits — the reference's own cadence
(run.sh:99 commits every 10 s) at an inflated file count — and measures
per-commit METADATA bytes written under the manifest-list layout vs
what the pre-r13 cumulative layout would have written (every live file
record rewritten per commit).  Prints ONE JSON line:

  {"n_commits": N, "n_files": F,
   "delta_bytes_first": .., "delta_bytes_last": ..,   # O(new files): flat
   "snapshot_bytes_last": ..,                         # O(commits)
   "metadata_bytes_total": ..,                        # sum actually written
   "cumulative_bytes_est": ..,                        # old layout, modeled
   "ratio": cumulative/actual}

Run: python scripts/manifest_scale_probe.py [n_commits]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_pipeline_cursor_spark.catalog import (
        _snapshot_file,
        snapshot_commit,
        snapshot_versions,
    )

    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tdir = os.path.join(tempfile.mkdtemp(prefix="mprobe-"), "t")

    delta_sizes = []
    snap_sizes = []
    t0 = time.monotonic()
    for c in range(1, n_commits + 1):
        snapshot_commit(
            spark,
            tdir,
            spark.range(c * 10, c * 10 + 10)
            .select(
                F.col("id").alias("event_id"),
                F.lit(f"t{c % 3}").alias("event_type"),
            )
            .coalesce(2),
        )
        snap = _snapshot_file(tdir, c)
        delta_rel = snap["manifest_list"][-1]
        delta_sizes.append(os.path.getsize(os.path.join(tdir, delta_rel)))
        snap_sizes.append(
            os.path.getsize(os.path.join(tdir, f"manifest-{c}.json"))
        )
    wall = time.monotonic() - t0

    versions = snapshot_versions(tdir)
    assert versions == list(range(1, n_commits + 1))
    n_files = 2 * n_commits

    # what the cumulative layout would have written: commit k rewrites
    # every live record — model each file record at the size the delta
    # entries actually pay per file (bytes/2 files at commit 1)
    per_file = delta_sizes[0] / 2
    cumulative_est = int(sum(per_file * 2 * k for k in range(1, n_commits + 1)))
    actual = sum(delta_sizes) + sum(snap_sizes)
    print(
        json.dumps(
            {
                "n_commits": n_commits,
                "n_files": n_files,
                "delta_bytes_first": delta_sizes[0],
                "delta_bytes_last": delta_sizes[-1],
                "snapshot_bytes_last": snap_sizes[-1],
                "metadata_bytes_total": actual,
                "cumulative_bytes_est": cumulative_est,
                "ratio": round(cumulative_est / actual, 2),
                "wall_s": round(wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
