#!/usr/bin/env python
"""Result-identity snapshot for optimization rounds.

Collects every declared query's full result at one or more SF dirs and
writes a JSON of {sf: {query: {"rows": n, "md5": hex}}}. Run BEFORE an
optimization to freeze the contract, and AFTER to prove the restructured
query computes byte-identical results (the driver's oracle re-check is the
final word; this is the fast local guard).

Hashing: rows are rendered with repr() per cell (exact for ints/strings;
float repr is shortest-roundtrip, so any FP difference shows), sorted
lexicographically when the query has no total order, then md5'd.

    python scripts/result_snapshot.py out.json [sf_dir ...] [--queries a,b]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def snapshot(spark, sf_dir: str, names=None) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.perf_counter()
        try:
            rows = fn(spark, sf_dir).collect()
            rendered = ["\x1f".join(repr(c) for c in row) for row in rows]
            h = hashlib.md5(
                "\x1e".join(sorted(rendered)).encode()).hexdigest()
            h_ord = hashlib.md5("\x1e".join(rendered).encode()).hexdigest()
            out[name] = {"rows": len(rows), "md5": h, "md5_inorder": h_ord,
                         "s": round(time.perf_counter() - t0, 2)}
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# {sf_dir} {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = None
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            names = set(a.split("=", 1)[1].split(","))
    out_path = args[0]
    sf_dirs = args[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from langid_mr_spark import pipeline
    spark = pipeline.session(
        app="result-snapshot", master="local[32]", shuffle_partitions=32,
        max_partition_bytes="8m",
    )
    spark.sparkContext.setLogLevel("ERROR")
    result = {d: snapshot(spark, d, names) for d in sf_dirs}
    Path(out_path).write_text(json.dumps(result, indent=1, sort_keys=True))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
