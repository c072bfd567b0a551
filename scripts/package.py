#!/usr/bin/env python
"""Build dist/langid_mr_spark.zip for spark-submit --py-files.

The north rule ships the pipeline as a spark-submit package; this produces
a deterministic zip of the library (no timestamps beyond zip's own, no
compiled artifacts, sorted entries).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "langid_mr_spark.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = REPO / "langid_mr_spark"
    files = sorted(p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            z.write(f, f.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(path)
