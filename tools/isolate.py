"""Isolate one or more registered queries: fresh bench-identical session,
cold noop-sink timing, optional formatted-plan capture.

Usage:
    python tools/isolate.py q300_ams_join_size [more...] [--plan OUTDIR]
        [--repeat N]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Methodology matches bench.py (guide section 1.4): the timed action is
``df.write.format("noop")``, run after the same four warm queries the
bench uses, so numbers are comparable to BENCH_DETAIL.json entries.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plan", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf k=v (A/B testing a setting)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from metadata_ingestion_poc_spark.queries import QUERIES
    from metadata_ingestion_poc_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("isolate", extra_conf=extra or None)

    if not args.no_warm:
        for warm in (
            "q01_pricing_summary",
            "q60_token_stats",
            "q55_cosine_topk",
            "q70_tumbling_window",
        ):
            if warm in QUERIES:
                QUERIES[warm](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    for name in args.names:
        fn = QUERIES[name]
        for i in range(args.repeat):
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
            group = f"{name}-run{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            tracker = spark.sparkContext.statusTracker()
            jobs = tracker.getJobIdsForGroup(group)
            n_stages = sum(
                len(tracker.getJobInfo(j).stageIds)
                for j in jobs
                if tracker.getJobInfo(j) is not None
            )
            print(
                f"{name} run{i}: {el:.3f}s"
                f"  jobs={len(jobs)} stages={n_stages}",
                flush=True,
            )
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(args.plan, f"{name}{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(txt)
            print(f"plan -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
