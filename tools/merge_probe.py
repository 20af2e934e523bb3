"""MERGE INTO shuffle-volume probe: broadcast vs shuffle strategy.

The broadcast strategy's whole claim is that the target never shuffles —
at 100 TB that's the difference between source-scale and lake-scale
network traffic. Wall-clock on local[*] can't see that (shuffles are
in-memory), so this probe measures SHUFFLE WRITE BYTES via the Spark
status REST API for the same merge computed both ways over a file-backed
target.

Usage: python tools/merge_probe.py [n_target] [n_source]
       (defaults 5,000,000 / 50,000)
Prints one JSON line: bytes + wall for both strategies + result parity.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_t = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.merge import merge_into

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4091")
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

    base = tempfile.mkdtemp(prefix="merge_probe_")
    (
        spark.range(n_t)
        .select(
            F.col("id"),
            F.concat(F.lit("tag"), F.pmod("id", F.lit(1000)).cast("string")).alias(
                "tag"
            ),
            (F.col("id") % 997).cast("double").alias("val"),
        )
        .write.mode("overwrite")
        .parquet(f"{base}/target")
    )
    target = spark.read.parquet(f"{base}/target")
    # CDC feed: half updates (every other key in a stride), 10% cancels,
    # plus inserts above the key range
    source = (
        spark.range(n_s)
        .select(
            (F.col("id") * (n_t // max(n_s, 1))).alias("id"),
            F.lit(-1.0).alias("val"),
            (F.col("id") % 10 == 0).alias("cancel"),
        )
        .union(
            spark.range(n_s // 10).select(
                (F.col("id") + n_t).alias("id"),
                F.lit(7.0).alias("val"),
                F.lit(False).alias("cancel"),
            )
        )
        .localCheckpoint(eager=True)
    )

    out = {"n_target": n_t, "n_source": n_s}
    counts = {}
    for strat in ("broadcast", "shuffle"):
        b0, t0 = total_shuffle(), time.time()
        merged = merge_into(
            target,
            source,
            on="id",
            update_set={"val": F.col("s.val")},
            delete_condition=F.col("s.cancel"),
            strategy=strat,
        )
        agg = merged.agg(
            F.count("*").alias("n"), F.sum("val").alias("s")
        ).collect()[0]
        counts[strat] = (agg["n"], round(float(agg["s"]), 2))
        out[f"{strat}_wall_sec"] = round(time.time() - t0, 2)
        out[f"{strat}_shuffle_bytes"] = total_shuffle() - b0
    out["results_match"] = counts["broadcast"] == counts["shuffle"]
    out["merged_rows"] = counts["broadcast"][0]
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
