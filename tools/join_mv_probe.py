"""Join-view IVM probe: bytes read and wall vs rebuilding the join.

The claim under test (operators/mv.py incremental_refresh_join): a
grouped view over fact ⋈ dim refreshes from the two recorded CDF feeds
at O(|feeds| × matched rows) — the fact leg reads only the dim rows the
fact-feed keys touch, the dim leg reads only the fact rows the dim-feed
keys touch (isin pushdown → parquet row-group skipping on a
key-clustered layout) — while a rebuild re-joins and regroups the whole
fact table. Input bytes come from the Spark status REST API (wall-clock
on this shared host is noisy; scan volume is what survives a 100×
scale-up).

Usage: python tools/join_mv_probe.py [n_fact] [n_dim] [n_buckets]
       (defaults 5,000,000 / 100,000 / 256)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.mv import (
        build_mv,
        incremental_refresh_join,
    )
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
        table_changes,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4093")
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

    froot = tempfile.mkdtemp(prefix="jmv_fact_")
    droot = tempfile.mkdtemp(prefix="jmv_dim_")
    # fact files clustered by join key so the dim-leg isin prunes row groups
    fact = MergedTable(spark, froot, n_buckets=n_buckets, sort_cols=["k"])
    dim = MergedTable(spark, droot, n_buckets=16)
    f0 = spark.range(n).select(
        F.col("id"),
        F.pmod("id", F.lit(n_dim)).alias("k"),
        (F.col("id") % 997 * 0.25).alias("amt"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.lit(1).cast("bigint").alias("seq"),
    )
    d0 = spark.range(n_dim).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg"), F.pmod("id", F.lit(50))).alias("seg"),
        F.lit(1).cast("bigint").alias("seq"),
    )
    apply_merge_batch(fact, f0, 0, "id", "seq")
    apply_merge_batch(dim, d0, 0, "k", "seq")

    def view(fv: int, dv: int):
        return build_mv(
            fact.df_at(fv)
            .select("id", "k", "amt")
            .join(dim.df_at(dv).select("k", "seg"), "k"),
            ["seg"],
            ["amt"],
        )

    mv0 = view(0, 0).localCheckpoint(eager=True)

    def grab(df):
        return {
            r["seg"]: (r["cnt"], round(r["sum_amt"], 6))
            for r in df.collect()
        }

    # --- step 1: FACT-ONLY churn (the common case — dim static) --------
    fbatch = spark.createDataFrame(
        [(int(i * (n // 8) + 3),) for i in range(8)], "id bigint"
    ).select(
        "id",
        F.pmod("id", F.lit(n_dim)).alias("k"),
        F.lit(10000.25).alias("amt"),
        F.lit("upd").alias("payload"),
        F.lit(2).cast("bigint").alias("seq"),
    )
    apply_merge_batch(fact, fbatch, 1, "id", "seq", record_changes=True)

    b0 = input_bytes()
    t0 = time.time()
    full1 = grab(view(1, 0))
    rebuild1_wall, rebuild1_bytes = time.time() - t0, input_bytes() - b0

    b0 = input_bytes()
    t0 = time.time()
    ffeed = table_changes(fact, 0, 1, on="id", preimage=True).drop(
        "payload", "seq"
    )
    inc1 = grab(
        incremental_refresh_join(
            mv0,
            ffeed,
            None,
            dim.df_at(0).select("k", "seg"),
            fact.df_at(1).select("id", "k", "amt"),
            "k",
            ["seg"],
            ["amt"],
        )
    )
    inc1_wall, inc1_bytes = time.time() - t0, input_bytes() - b0
    assert inc1 == full1, "fact-only refresh diverged from rebuild"

    # --- step 2: BOTH sides churn (2 dim segment moves + 8 fact rows) --
    mv1 = view(1, 0).localCheckpoint(eager=True)
    fbatch2 = spark.createDataFrame(
        [(int(i * (n // 8) + 101),) for i in range(8)], "id bigint"
    ).select(
        "id",
        F.pmod("id", F.lit(n_dim)).alias("k"),
        F.lit(20000.25).alias("amt"),
        F.lit("upd").alias("payload"),
        F.lit(3).cast("bigint").alias("seq"),
    )
    dbatch = spark.createDataFrame(
        [(7, "segX", 2), (13, "segX", 2)], "k long, seg string, seq long"
    )
    apply_merge_batch(fact, fbatch2, 2, "id", "seq", record_changes=True)
    apply_merge_batch(dim, dbatch, 1, "k", "seq", record_changes=True)

    b0 = input_bytes()
    t0 = time.time()
    full2 = grab(view(2, 1))
    rebuild2_wall, rebuild2_bytes = time.time() - t0, input_bytes() - b0

    b0 = input_bytes()
    t0 = time.time()
    ffeed2 = table_changes(fact, 1, 2, on="id", preimage=True).drop(
        "payload", "seq"
    )
    dfeed = table_changes(dim, 0, 1, on="k", preimage=True).drop("seq")
    inc2 = grab(
        incremental_refresh_join(
            mv1,
            ffeed2,
            dfeed,
            dim.df_at(0).select("k", "seg"),
            fact.df_at(2).select("id", "k", "amt"),
            "k",
            ["seg"],
            ["amt"],
        )
    )
    inc2_wall, inc2_bytes = time.time() - t0, input_bytes() - b0
    assert inc2 == full2, "both-sides refresh diverged from rebuild"

    import shutil

    shutil.rmtree(froot)
    shutil.rmtree(droot)
    print(
        json.dumps(
            {
                "n_fact": n,
                "n_dim": n_dim,
                "n_buckets": n_buckets,
                "fact_only": {
                    "rebuild_sec": round(rebuild1_wall, 2),
                    "rebuild_input_bytes": rebuild1_bytes,
                    "incremental_sec": round(inc1_wall, 2),
                    "incremental_input_bytes": inc1_bytes,
                },
                "both_sides": {
                    "rebuild_sec": round(rebuild2_wall, 2),
                    "rebuild_input_bytes": rebuild2_bytes,
                    "incremental_sec": round(inc2_wall, 2),
                    "incremental_input_bytes": inc2_bytes,
                },
                "parity": True,
            }
        )
    )


if __name__ == "__main__":
    main()
