"""Round-13 measurement harness (guide §1): per-query wall time with the
noop sink, job/stage counts, and .explain("formatted") capture.

Usage:
    python scripts/measure.py [--plans DIR] [--runs N] [--queries a,b,c]

Times each headline query (or the given list) with BOTH the bench's
count() action (comparability with BENCH_r12) and the noop sink
(guide §1.4 — computes every column, no pruning). Also records how many
Spark jobs each query submits (driver-latency proxy: at sf0.1 each job
costs ~0.2 s of scheduler latency) and writes the formatted plan to
--plans/<name>_before.txt when --plans is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bench import HEADLINE
    from modevetl_spark.queries import all_queries
    from modevetl_spark.session import get_spark, quiet_bounded_window_warnings

    spark = get_spark(app_name="modevetl-measure")
    quiet_bounded_window_warnings(spark)
    sc = spark.sparkContext
    queries = all_queries()
    names = args.queries.split(",") if args.queries else [n for n in HEADLINE if n in queries]

    spark.range(1000).count()
    tracker = sc.statusTracker()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        sc.setJobDescription(name)
        best_count = best_noop = None
        jobs = 0
        for i in range(args.runs):
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.count()
            e1 = time.perf_counter() - t0
            j1 = set(tracker.getJobIdsForGroup(None) or [])
            jobs = max(jobs, len(j1 - j0))
            best_count = e1 if best_count is None else min(best_count, e1)
            t0 = time.perf_counter()
            df2 = fn(spark, args.sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            e2 = time.perf_counter() - t0
            best_noop = e2 if best_noop is None else min(best_noop, e2)
        out[name] = {
            "count_s": round(best_count, 3),
            "noop_s": round(best_noop, 3),
            "jobs": jobs,
        }
        print(f"# {name}: count={best_count:.3f}s noop={best_noop:.3f}s jobs~{jobs}", file=sys.stderr)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            import contextlib
            import io

            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        sc.setJobDescription(None)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
