"""Shuffle-volume probe: plain groupBy vs CMS-certified pruned heavy hitters.

Wall-clock on local[*] hides the quantity that dominates at 100 TB — the
shuffle is in-memory here, network+disk there — so this probe measures
SHUFFLE WRITE BYTES directly (Spark status REST API on an
explicitly-UI-enabled session) for the same heavy-hitter answer computed
two ways over a long-tail token stream (10% of occurrences from 100 hot
values, the rest one-off distinct).

Usage: python tools/shuffle_probe.py [n_tokens]   (default 4,000,000)
Prints one JSON line with bytes and wall-clock for both paths.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4090")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app, ui = sc.applicationId, sc.uiWebUrl

    def total_shuffle() -> int:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages"
        ) as r:
            return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))

    toks = (
        spark.range(n)
        .select(
            F.when(
                F.pmod("id", F.lit(10)) == 0,
                F.concat(
                    F.lit("hot"),
                    F.pmod(F.xxhash64("id"), F.lit(100)).cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
            .alias("token")
        )
        .localCheckpoint(eager=True)
    )
    min_count = n // 10 // 100 // 2

    out: dict = {"n_tokens": n, "min_count": min_count}
    base = total_shuffle()
    t0 = time.time()
    out["plain_rows"] = (
        toks.groupBy("token").count().filter(F.col("count") >= min_count).count()
    )
    out["plain_sec"] = round(time.time() - t0, 2)
    p = total_shuffle()
    out["plain_shuffle_mb"] = round((p - base) / 1e6, 2)

    from mlvectordb_spark.operators.sketches import heavy_hitters

    t0 = time.time()
    out["cms_rows"] = heavy_hitters(
        toks, "token", min_count, width=4096, depth=3
    ).count()
    out["cms_sec"] = round(time.time() - t0, 2)
    c = total_shuffle()
    out["cms_shuffle_mb"] = round((c - p) / 1e6, 2)
    assert out["cms_rows"] == out["plain_rows"], "answers must be identical"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
