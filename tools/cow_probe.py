"""Bucketed copy-on-write merge probe: bytes rewritten vs linked forward.

The bucketed MergedTable's claim is file-level CoW: a merge batch rewrites
only the bucket directories its keys hash into and hard-links every other
bucket forward, so per-batch write cost is O(min(|batch|, B) × table/B),
not O(table). Wall-clock on a shared host is noisy; BYTES are
deterministic, so this probe walks the version directories and classifies
every file by inode: linked forward (shared with the base version) vs
physically rewritten.

Two regimes, both honest:
- point batch (|batch| << B): touches a handful of buckets — CoW wins by
  ~B/|batch|; this is the streaming-CDC-micro-batch case the sink exists
  for.
- bulk batch (|batch| >> B): hashing spreads the keys over every bucket,
  nothing links, and the cost correctly degrades to the unbucketed full
  rewrite — bucketing never does extra work, it only skips work.

Also times the pruned `table_changes` diff (reads only diverged buckets)
and asserts bucketed/unbucketed final-state parity.

Usage: python tools/cow_probe.py [n_rows] [n_buckets] [bulk_batch]
       (defaults 5,000,000 / 256 / 50,000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _file_stats(vdir: str) -> dict[int, int]:
    """inode -> size for every data file under a version dir."""
    out: dict[int, int] = {}
    for root, _, files in os.walk(vdir):
        for f in files:
            st = os.stat(os.path.join(root, f))
            out[st.st_ino] = st.st_size
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    bulk = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
        table_changes,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def base_df():
        return spark.range(n).select(
            F.col("id"),
            (F.col("id") * 1.5).alias("val"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit(1).cast("bigint").alias("seq"),
            F.lit(False).alias("deleted"),
        )

    def batch_df(ids, seq):
        return (
            spark.createDataFrame([(int(i),) for i in ids], "id bigint")
            .select(
                "id",
                F.lit(-1.0).alias("val"),
                F.lit("updated").alias("payload"),
                F.lit(seq).cast("bigint").alias("seq"),
                F.lit(False).alias("deleted"),
            )
        )

    point_ids = [i * (n // 8) + 3 for i in range(8)]
    bulk_ids = range(0, bulk)

    report: dict = {
        "n_rows": n,
        "n_buckets": n_buckets,
        "point_batch": len(point_ids),
        "bulk_batch": bulk,
    }
    finals = {}
    for label, B in (("bucketed", n_buckets), ("unbucketed", 0)):
        root = tempfile.mkdtemp(prefix=f"cow_{label}_")
        table = MergedTable(spark, root, n_buckets=B)
        t0 = time.time()
        apply_merge_batch(table, base_df(), 0, "id", "seq", "deleted")
        boot = time.time() - t0
        v0 = _file_stats(table._vdir(0))

        t0 = time.time()
        apply_merge_batch(table, batch_df(point_ids, 2), 1, "id", "seq", "deleted")
        point_wall = time.time() - t0
        v1 = _file_stats(table._vdir(1))
        point_linked = sum(s for i, s in v1.items() if i in v0)
        point_written = sum(s for i, s in v1.items() if i not in v0)

        t0 = time.time()
        apply_merge_batch(table, batch_df(bulk_ids, 3), 2, "id", "seq", "deleted")
        bulk_wall = time.time() - t0
        v2 = _file_stats(table._vdir(2))
        bulk_linked = sum(s for i, s in v2.items() if i in v1)
        bulk_written = sum(s for i, s in v2.items() if i not in v1)

        t0 = time.time()
        n_point_changes = table_changes(table, 0, 1, on="id").count()
        point_diff_wall = time.time() - t0
        t0 = time.time()
        n_changes = table_changes(table, 1, 2, on="id").count()
        diff_wall = time.time() - t0

        finals[label] = table.df().agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("id", "val", "payload", "seq")).alias("h"),
        ).collect()[0]
        report[label] = {
            "table_bytes": sum(v0.values()),
            "bootstrap_sec": round(boot, 2),
            "point_merge_sec": round(point_wall, 2),
            "point_bytes_written": point_written,
            "point_bytes_linked": point_linked,
            "bulk_merge_sec": round(bulk_wall, 2),
            "bulk_bytes_written": bulk_written,
            "bulk_bytes_linked": bulk_linked,
            "point_diff_rows": n_point_changes,
            "point_diff_sec": round(point_diff_wall, 2),
            "bulk_diff_rows": n_changes,
            "bulk_diff_sec": round(diff_wall, 2),
        }
        shutil.rmtree(root)

    assert finals["bucketed"]["n"] == finals["unbucketed"]["n"]
    # full-row xor-of-hashes: any column of any row differing between the
    # two paths flips the checksum
    assert finals["bucketed"]["h"] == finals["unbucketed"]["h"]
    report["parity"] = True
    report["point_write_ratio"] = round(
        report["bucketed"]["point_bytes_written"]
        / max(1, report["unbucketed"]["point_bytes_written"]),
        4,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
