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
web_pages html).

``--long-docs`` (round-5 verdict ask #5): the synthetic bench corpus
carries only ~250 B/doc of extra full text, 2-3 orders of magnitude below
a real web page — this mode instead measures on a deterministic
long-document fixture (4,000 docs whose extracted text is tiled to a
~50 KB median), so the 10⁹-doc extrapolation uses realistic bytes/doc."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from langid_mr_spark import pipeline  # noqa: E402

LONG_DOCS = "--long-docs" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _args[0] if _args else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_LONG_N = 4000
_LONG_TILE = 150  # ~330-char base texts × 150 ≈ 50 KB median


def corpus(spark):
    """The same deterministic synthetic web_pages corpus bench.py times
    (shared .bench_cache parquet, built once); with --long-docs, a
    deterministic ~50 KB-median variant of the same fixture generator."""
    import importlib.util as ilu

    if LONG_DOCS:
        from langid_mr_spark import fixtures, textnorm
        pdf = fixtures.make_corpus(_LONG_N, long_doc_every=0)
        pdf = pdf[pdf["text"].str.len() > 0].copy()
        pdf["text"] = pdf["text"].map(lambda t: " ".join([t] * _LONG_TILE))
        pdf["html"] = [textnorm.wrap_html(t, title="long")
                       for t in pdf["text"]]
        return spark.createDataFrame(
            pdf, schema=fixtures.INPUT_SCHEMA).repartition(64)

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
    print(json.dumps({"sf_dir": SF_DIR, "long_docs": LONG_DOCS,
                      "runs": res}, indent=2))


if __name__ == "__main__":
    main()
