#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

NOT the driver bench — bench.py is frozen for measurement. This file
isolates each bench query with the noop sink, times it (best-of-N), and
captures .explain("formatted") into plans/r06/. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--reps 3] [--plans-suffix before] [--queries a,b,c]

Prints one JSON line with per-query best-of-N seconds.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "gate_decisions", "count_by_status", "pct_of_total", "top50_avg",
    "union_sort_limit", "orphan_anti_join", "status_since_filter",
    "histogram", "json_pluck", "token_stats", "stopword_ratio",
    "snippet", "scrub",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-suffix", default=None,
                    help="write plans/r06/<q>_<suffix>.txt explains")
    ap.add_argument("--queries", default=None,
                    help="comma list; default = bench set (+pipeline)")
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    from langid_mr_spark import pipeline
    import __spark_entry__ as entrymod
    import bench as benchmod

    sf = benchmod.sf_of(SF_DIR)
    spark = pipeline.session(
        app="langid_mr_spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        max_partition_bytes="8m",
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = (args.queries.split(",") if args.queries else
             (([] if args.skip_pipeline else ["pipeline"]) + BENCH_QUERIES))

    plans_dir = Path("plans/r06")
    if args.plans_suffix:
        plans_dir.mkdir(parents=True, exist_ok=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    corpus_path = None
    timings: dict[str, float] = {}
    for name in names:
        if name == "pipeline":
            corpus_path = benchmod.ensure_corpus(spark, sf)
            src = spark.read.parquet(corpus_path)
            build = lambda: pipeline.run_pipeline(src)  # noqa: E731
        else:
            build = lambda n=name: qs[n](spark, SF_DIR)  # noqa: E731
        # warm code paths once on the query itself (JIT/codegen/py workers)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(build())
        spark.catalog.clearCache()
        if args.plans_suffix:
            buf = io.StringIO()
            with redirect_stdout(buf):
                build().explain("formatted")
            (plans_dir / f"{name}_{args.plans_suffix}.txt").write_text(
                buf.getvalue())
        vals = []
        for i in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}:rep{i}")
            t0 = time.perf_counter()
            noop(build())
            vals.append(time.perf_counter() - t0)
        timings[name] = round(min(vals), 3)
        print(f"# {name}: {timings[name]}s  (all: {[round(v,3) for v in vals]})",
              file=sys.stderr)

    print(json.dumps({"sf": sf, "cpus": CPUS, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
