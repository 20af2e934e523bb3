"""Capture .explain("formatted") for headline bench entries into
plans/<tag>/<entry>_<suffix>.txt (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters, Python-eval nodes —
before and after every optimization).

Usage: python tools/capture_plans.py <outdir> <suffix> [entry ...]
       (no entries -> every bench HEADLINE entry)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from mlvectordb_spark.queries import QUERIES
    from mlvectordb_spark.session import get_spark

    if not names:
        names = list(HEADLINE)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(outdir, f"{name}_{suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            print(f"ok  {name}")
        except Exception as e:  # noqa: BLE001 — keep capturing the rest
            print(f"ERR {name}: {e}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
