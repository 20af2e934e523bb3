"""Isolated per-entry timing harness for code-version A/Bs (the
store_batch_probe / dedup_keep_best watch discipline, SCALING.md r10/r11):
one fresh session, a cheap warm-up entry, then each named entry runs N
times with the noop sink; per-entry min is the comparison number.

Usage:
    python tools/entry_ab_probe.py <tree_root> <entry> [<entry> ...]
Env:
    AB_RUNS (default 5), SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

<tree_root> is the repo checkout to import `mlvectordb_spark` from — a
scratch `git worktree` of an old tip makes the A side, the live tree the
B side. Run the two sides SEQUENTIALLY on a quiet host; the in-bench
number (JVM warmed by ~80 entries) reads ~1.5-1.9x lower than this
harness — only compare like with like.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    names = sys.argv[2:] or ["dedup_keep_best", "curation_pipeline"]
    sys.path.insert(0, root)
    # Executor Python workers resolve imports from cwd + PYTHONPATH, not
    # the driver's sys.path — and the worker's `-m pyspark.daemon` launch
    # puts its CWD entry AHEAD of PYTHONPATH, so setting PYTHONPATH alone
    # still resolves the LIVE tree when the probe is launched from it.
    # chdir into the probed tree so both resolution channels agree;
    # without this, an entry with executor-side Python kernels
    # (mapInPandas/pandas_udf) would run one tree's kernels under the
    # other tree's driver plans, silently mixing code versions.
    # (Pure-JVM entries like dedup_keep_best are unaffected either way.)
    os.environ["PYTHONPATH"] = root + os.pathsep + os.environ.get(
        "PYTHONPATH", ""
    )
    os.chdir(root)
    from mlvectordb_spark.queries import QUERIES
    from mlvectordb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_RUNS", "5"))
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    force("ns_stats")  # pay session/codegen init outside the clock
    print(f"TREE {root}")
    for name in names:
        ts = [force(name) for _ in range(n)]
        print(f"AB {name} min {min(ts)} runs {ts}")


if __name__ == "__main__":
    main()
