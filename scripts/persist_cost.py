"""Measure the staged-cascade DISK_ONLY persist cost: probe vs full carry.

Round-5 verdict ask #6: `carry_text="full"` (what curate() uses for
whole-document near-dup) grows the cascade persist from probe-bounded to
~corpus-text-sized. This script runs `run_pipeline` at the bench corpus
twice — carry_text=True (probe-bounded) and carry_text="full" — and reads
the persisted RDD's disk bytes from the block manager
(`sc.getRDDStorageInfo`), so the 100× extrapolation in BENCH notes is a
measured number instead of a sentence.

Usage: python scripts/persist_cost.py [sf_dir]   (default sf0.1 corpus
derived the same way bench.py derives it — documents.text wrapped as
web_pages html)."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from langid_mr_spark import pipeline  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def corpus(spark):
    """The same deterministic synthetic web_pages corpus bench.py times
    (shared .bench_cache parquet, built once)."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "benchmod", Path(__file__).resolve().parents[1] / "bench.py")
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    path = bench.ensure_corpus(spark, bench.sf_of(SF_DIR))
    return spark.read.parquet(path)


def measure(carry_text) -> dict:
    spark = pipeline.session(master=f"local[{CPUS}]",
                             shuffle_partitions=CPUS)
    try:
        out = pipeline.run_pipeline(corpus(spark), carry_text=carry_text)
        n = out.count()  # forces the full cascade + persist
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        persisted = [
            {"id": i.id(), "disk_mb": round(i.diskSize() / 2**20, 1),
             "mem_mb": round(i.memSize() / 2**20, 1),
             "partitions": i.numCachedPartitions()}
            for i in infos if i.isCached()
        ]
        return {"carry_text": str(carry_text), "rows": n,
                "persisted_rdds": persisted,
                "disk_mb_total": round(
                    sum(p["disk_mb"] for p in persisted), 1)}
    finally:
        spark.stop()


def main() -> None:
    res = [measure(True), measure("full")]
    print(json.dumps({"sf_dir": SF_DIR, "runs": res}, indent=2))


if __name__ == "__main__":
    main()
