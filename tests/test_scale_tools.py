"""Scale tooling: salted aggregation/join equivalence, bucketed
shuffle-free joins, stateful streaming operator."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.skew import (
    bucketed_join_plan,
    bucketed_write,
    salted_count_sum,
    salted_join,
)
from mlvectordb_spark.sources.testdata import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.sum_l_quantity, 2))
        for r in salted_count_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey").count()
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    try:
        bucketed_write(orders, "b_orders", "o_custkey", 8)
        bucketed_write(cust, "b_cust", "o_custkey", 8)
        joined, plan = bucketed_join_plan(spark, "b_orders", "b_cust", "o_custkey")
        # disable broadcast so the join must be sort-merge, then assert the
        # bucket layout removed the shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        _, plan2 = bucketed_join_plan(spark, "b_orders", "b_cust", "o_custkey")
        assert "Exchange hashpartitioning" not in plan2, plan2
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: running per-user stats accumulate across
    micro-batches (two files → two batches with maxFilesPerTrigger=1)."""
    from mlvectordb_spark.streaming.events import read_event_stream
    from mlvectordb_spark.streaming.stateful import user_running_stats

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "b1.parquet")
    stream = read_event_stream(spark, str(d))
    q = (
        user_running_stats(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.table("t_stateful").collect()
    }
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected
    # EWMA is bounded by min/max of values per user
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in batch.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in spark.table("t_stateful").collect():
        lo, hi = bounds[r.user_id]
        assert lo <= r.ewma_value <= hi


def test_stateful_timeout_evicts_idle_keys():
    """Round-2 verdict: state must be bounded. The handler's timeout branch
    removes the key's state and emits nothing; the live branch arms an
    event-time timeout (watermark + TTL) so idle keys eventually take that
    branch as the watermark advances."""
    from mlvectordb_spark.streaming import stateful as S

    class FakeState:
        def __init__(self, timed_out):
            self.hasTimedOut = timed_out
            self.exists = False
            self.removed = False
            self.timeout_armed = None

        def remove(self):
            self.removed = True

        def update(self, v):
            self.exists = True
            self.value = v

        def getCurrentWatermarkMs(self):
            return 1_000_000

        def setTimeoutTimestamp(self, ms):
            self.timeout_armed = ms

    # timed-out key: evicted, no output rows
    st = FakeState(timed_out=True)
    out = list(S._update_user_stats((7,), iter([]), st))
    assert st.removed and out == []
    # live key: state updated AND the timeout re-armed
    import pandas as pd

    st2 = FakeState(timed_out=False)
    pdf = pd.DataFrame(
        {"ts": [1, 2], "event_id": [1, 2], "value": [1.0, 3.0]}
    )
    out2 = list(S._update_user_stats((7,), iter([pdf]), st2))
    assert len(out2) == 1
    assert st2.timeout_armed == 1_000_000 + S.STATE_TTL_MS
    assert st2.value[0] == 2 and st2.value[1] == 4.0


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """The streaming funnel's final per-user stage timestamps equal the
    batch window-chain's t1/t2/t3 when events arrive in order (single
    ordered source file here; intra-batch disorder is re-sorted by the
    handler)."""
    from pyspark.sql import Window

    from mlvectordb_spark.streaming.events import read_event_stream
    from mlvectordb_spark.streaming.stateful import user_funnel_stream

    d = tmp_path / "fev"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "b1.parquet")
    stream = read_event_stream(spark, str(d))
    q = (
        user_funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("t_funnel_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (round(r.t1, 3), round(r.t2, 3), round(r.t3, 3))
        for r in spark.table("t_funnel_state").collect()
    }

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    df = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    df = df.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(w)
    df = df.withColumn("t3", t3)
    to_s = lambda c: F.coalesce(F.col(c).cast("double"), F.lit(-1.0))  # noqa: E731
    expected = {
        r.user_id: (round(r.s1, 3), round(r.s2, 3), round(r.s3, 3))
        for r in df.groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
        )
        .select(
            "user_id", to_s("t1").alias("s1"), to_s("t2").alias("s2"), to_s("t3").alias("s3")
        )
        .collect()
    }
    assert got == expected


def test_stateful_funnel_cross_batch_disorder_is_greedy(spark, tmp_path):
    """Locks the DOCUMENTED approximation: a view arriving in a LATER
    micro-batch than a click it time-precedes cannot rewrite funnel
    history — the click was not counted (no view yet), and only a click
    AFTER the late view's arrival-batch can advance the funnel. Within a
    batch, disorder is re-sorted and harmless."""
    import json

    from mlvectordb_spark.streaming.stateful import (
        FUNNEL_OUTPUT_SCHEMA,
        user_funnel_stream,
    )

    d = tmp_path / "oo"
    d.mkdir()
    # batch1: click at t=2000 (no view seen yet -> ignored)
    # batch2: view at t=1000 (time-precedes the click, arrives later)
    #         and a purchase at t=3000 (t2 never set -> ignored)
    b1 = [{"event_id": 1, "user_id": 7, "event_type": "click", "ts": 2000}]
    b2 = [
        {"event_id": 2, "user_id": 7, "event_type": "view", "ts": 1000},
        {"event_id": 3, "user_id": 7, "event_type": "purchase", "ts": 3000},
    ]
    for name, rows in [("b1.json", b1), ("b2.json", b2)]:
        (d / name).write_text("\n".join(json.dumps(r) for r in rows))
    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_seconds("ts").alias("ts"),
        )
    )
    q = (
        user_funnel_stream(raw)
        .writeStream.format("memory")
        .queryName("t_funnel_oo")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "oockpt"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select * from t_funnel_oo order by t1 desc"
    ).collect()
    final = rows[0]
    assert final.t1 == 1000.0   # the late view does set stage 1...
    assert final.t2 == -1.0     # ...but the earlier click was never counted
    assert final.t3 == -1.0    # and the purchase can't skip stage 2
