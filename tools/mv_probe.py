"""Incremental-MV-refresh probe: bytes read and wall vs a full rebuild.

The claim under test (operators/mv.py): refreshing a grouped SUM/COUNT
view from the preimage CDF of a POINT batch costs O(changed buckets) +
O(view), while a full rebuild rescans the whole table. Wall-clock on this
shared host is noisy, so the probe also records INPUT BYTES per phase
from the Spark status REST API — the scan volume is the number that
survives a 100× scale-up.

Usage: python tools/mv_probe.py [n_rows] [n_buckets] [n_groups]
       (defaults 5,000,000 / 256 / 1,000)
Prints one JSON line.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.mv import build_mv, incremental_refresh
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
        table_changes,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4092")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app, ui = sc.applicationId, sc.uiWebUrl

    def input_bytes() -> int:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return sum(s.get("inputBytes", 0) for s in json.load(r))

    root = tempfile.mkdtemp(prefix="mv_probe_")
    table = MergedTable(spark, root, n_buckets=n_buckets)
    base = spark.range(n).select(
        F.col("id"),
        F.pmod("id", F.lit(n_groups)).alias("g"),
        (F.col("id") % 997 * 0.25).alias("val"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.lit(1).cast("bigint").alias("seq"),
        F.lit(False).alias("deleted"),
    )
    apply_merge_batch(table, base, 0, "id", "seq", "deleted")
    mv0 = build_mv(table.df_at(0), ["g"], ["val"]).localCheckpoint(eager=True)

    def make_batch(ids, val, seq):
        return spark.createDataFrame(
            [(int(i),) for i in ids], "id bigint"
        ).select(
            "id",
            F.pmod("id", F.lit(n_groups)).alias("g"),
            F.lit(val).alias("val"),
            F.lit("upd").alias("payload"),
            F.lit(seq).cast("bigint").alias("seq"),
            F.lit(False).alias("deleted"),
        )

    point = make_batch([i * (n // 8) + 3 for i in range(8)], 10000.25, 2)
    apply_merge_batch(
        table, point, 1, "id", "seq", "deleted", record_changes=True
    )

    b0 = input_bytes()
    t0 = time.time()
    full = {
        r["g"]: (r["cnt"], round(r["sum_val"], 6))
        for r in build_mv(table.df_at(1), ["g"], ["val"]).collect()
    }
    rebuild_wall = time.time() - t0
    rebuild_bytes = input_bytes() - b0

    # diff-based feed: force the snapshot diff by bypassing the recording
    rec_dir = table._cdir(1)
    shutil.move(rec_dir, rec_dir + ".aside")
    b0 = input_bytes()
    t0 = time.time()
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    inc = {
        r["g"]: (r["cnt"], round(r["sum_val"], 6))
        for r in incremental_refresh(mv0, feed, ["g"], ["val"]).collect()
    }
    inc_wall = time.time() - t0
    inc_bytes = input_bytes() - b0

    # recorded feed (written DURING the merge): zero table bytes
    shutil.move(rec_dir + ".aside", rec_dir)
    b0 = input_bytes()
    t0 = time.time()
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    rec = {
        r["g"]: (r["cnt"], round(r["sum_val"], 6))
        for r in incremental_refresh(mv0, feed, ["g"], ["val"]).collect()
    }
    rec_wall = time.time() - t0
    rec_bytes = input_bytes() - b0

    assert inc == full, "diff-feed refresh diverged from full rebuild"
    assert rec == full, "recorded-feed refresh diverged from full rebuild"

    # multi-version catch-up: seven more recorded point batches, then ONE
    # refresh from the composed (v1 → v8) feed — the checkpointed-consumer
    # scenario _compose_recorded exists for
    mv1 = build_mv(table.df_at(1), ["g"], ["val"]).localCheckpoint(eager=True)
    for b in range(2, 9):
        batch = make_batch(
            [i * (n // 8) + 100 + b for i in range(8)], 1000.25 * b, b
        )
        apply_merge_batch(
            table, batch, b, "id", "seq", "deleted", record_changes=True
        )
    b0 = input_bytes()
    t0 = time.time()
    feed8 = table_changes(table, 1, 8, on="id", preimage=True)
    catchup = {
        r["g"]: (r["cnt"], round(r["sum_val"], 6))
        for r in incremental_refresh(mv1, feed8, ["g"], ["val"]).collect()
    }
    catchup_wall = time.time() - t0
    catchup_bytes = input_bytes() - b0
    b0 = input_bytes()
    t0 = time.time()
    full8 = {
        r["g"]: (r["cnt"], round(r["sum_val"], 6))
        for r in build_mv(table.df_at(8), ["g"], ["val"]).collect()
    }
    rebuild8_wall = time.time() - t0
    rebuild8_bytes = input_bytes() - b0
    assert catchup == full8, "composed catch-up diverged from full rebuild"
    shutil.rmtree(root)
    print(
        json.dumps(
            {
                "n_rows": n,
                "n_buckets": n_buckets,
                "n_groups": n_groups,
                "point_batch": 8,
                "rebuild_sec": round(rebuild_wall, 2),
                "rebuild_input_bytes": rebuild_bytes,
                "diff_feed_sec": round(inc_wall, 2),
                "diff_feed_input_bytes": inc_bytes,
                "recorded_feed_sec": round(rec_wall, 2),
                "recorded_feed_input_bytes": rec_bytes,
                "catchup_7steps_sec": round(catchup_wall, 2),
                "catchup_7steps_input_bytes": catchup_bytes,
                "rebuild_at_v8_sec": round(rebuild8_wall, 2),
                "rebuild_at_v8_input_bytes": rebuild8_bytes,
                "parity": True,
            }
        )
    )


if __name__ == "__main__":
    main()
