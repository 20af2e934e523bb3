"""Z-order / optimize() scale probe: row-group skip ratios at 5M rows.

The z-ordered MergedTable's claim is that a 2-D box predicate skips most
row groups via footer min/max on BOTH columns — and that merge churn
whose key distribution DRIFTS outside the frozen cuts slowly erodes the
skip ratio, which `optimize()` restores by re-deriving the cuts from the
full snapshot and re-packing every bucket (the cuts-refresh cadence the
append_layout contract anticipates).

Measured here with production-shape files: `parquet.block.size` is
forced down so every bucket file carries MANY row groups (the r7 join_mv
probe showed single-row-group local files hide skipping entirely —
skipping happens at row-group grain, and a one-group file is all-or-
nothing). Stages:

  v0      bootstrap 5M rows, fresh frozen cuts      -> skip ratio (box A)
  churn   N merge batches drawn from a SHIFTED
          (x,y) domain the cuts never saw           -> skip ratio (A, B)
  optimize re-pack + cuts refresh                   -> skip ratio (A, B)

Box A sits in the original domain, box B in the drifted region. The
numbers to watch: churn degrades B (drifted rows land in whatever files
their stale Morton key hits); optimize restores both to the fresh-layout
class. `pruning_stats` reads footers only (driver-side, file-count-
bounded) — the ratio IS the fraction a Spark scan reads.

Usage: python tools/zorder_probe.py [n_rows] [n_buckets] [n_churn]
       (defaults 5,000,000 / 16 / 6)
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_churn = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.layout import pruning_stats
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("zorder-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # production-shape files: many row groups per bucket file so skipping
    # is measurable at row-group grain (default 128 MB block = one group
    # per local-scale file = all-or-nothing)
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", 512 * 1024
    )

    def rows(lo_id: int, count: int, dom_shift: float, seq: int):
        # x,y uniform over [shift, shift+1000) via modular mixing
        return spark.range(lo_id, lo_id + count).select(
            F.col("id"),
            (F.lit(dom_shift) + (F.col("id") * 7919 % 100_000) / 100.0)
            .alias("x"),
            (F.lit(dom_shift) + (F.col("id") * 104_729 % 100_000) / 100.0)
            .alias("y"),
            F.lit(seq).cast("long").alias("seq"),
        )

    base = tempfile.mkdtemp(prefix="zorder_probe_")
    out: dict = {"n_rows": n, "n_buckets": n_buckets, "n_churn": n_churn}
    try:
        t = MergedTable(
            spark, f"{base}/t", n_buckets=n_buckets, zorder_cols=["x", "y"]
        )
        t0 = time.time()
        apply_merge_batch(t, rows(0, n, 0.0, 1), 0, "id", "seq")
        out["bootstrap_sec"] = round(time.time() - t0, 2)

        # box A: 10% x 10% window inside the original domain (x,y in
        # [0,1000)); box B: same-size window in the drifted region
        box_a = {"x": (300.0, 400.0), "y": (300.0, 400.0)}
        box_b = {"x": (1400.0, 1500.0), "y": (1400.0, 1500.0)}

        def stats(tag: str) -> None:
            vdir = t._vdir(t.current_version())
            for bname, box in (("a", box_a), ("b", box_b)):
                s = pruning_stats(vdir, box)
                out[f"{tag}_box{bname}_read_frac"] = round(
                    s["read_fraction"], 4
                )
                out[f"{tag}_row_groups"] = s["row_groups"]

        stats("v0")

        # churn: batches from a domain shifted BY half the original span
        # past its edge — the frozen cuts saturate, drifted rows hash
        # into top-bin Morton cells everywhere
        churn = max(1, n // 100)  # 1% of the table per batch
        t0 = time.time()
        for i in range(n_churn):
            apply_merge_batch(
                t,
                rows(n + i * churn, churn, 1000.0, 2 + i),
                1 + i,
                "id",
                "seq",
            )
        out["churn_sec"] = round(time.time() - t0, 2)
        stats("churned")

        t0 = time.time()
        t.optimize()
        out["optimize_sec"] = round(time.time() - t0, 2)
        stats("optimized")

        # result invariance: the box answers must not move across the
        # re-pack (count only; full parity is pytest's job)
        df = t.df()
        out["boxb_rows"] = (
            df.filter(F.col("x").between(*box_b["x"]))
            .filter(F.col("y").between(*box_b["y"]))
            .count()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
