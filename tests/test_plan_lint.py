"""Plan linter: the hand-run per-round plan audit, mechanized.

Positive cases prove each detector fires on a knowingly-bad plan;
negative cases prove the flagship query plans are clean — including the
two entries whose earlier revisions HAD the global-window defect
(tpch_q11 / tpch_q15, round-6 verdict #1-2): the linter now locks the
fix in place.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mlvectordb_spark.plans.lint import assert_scale_clean, lint_plan
from mlvectordb_spark.queries import QUERIES
from mlvectordb_spark.sources import load_table


def _rules(findings):
    return {f["rule"] for f in findings}


def test_detects_global_window(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bad = li.withColumn(
        "tot", F.sum("l_quantity").over(Window.partitionBy())
    )
    assert "global-window" in _rules(lint_plan(bad))
    with pytest.raises(AssertionError, match="scale lint"):
        assert_scale_clean(bad)


def test_partitioned_window_is_clean(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ok = li.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        ),
    )
    assert "global-window" not in _rules(lint_plan(ok))


def test_detects_cartesian_product(spark, sf_dir):
    na = load_table(spark, sf_dir, "nation")
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        bad = na.crossJoin(na.select(F.col("n_nationkey").alias("k2"))).filter(
            F.col("n_nationkey") < F.col("k2")
        )
        # force a non-broadcast cartesian by disabling auto-broadcast
        pb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            rules = _rules(lint_plan(bad))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", pb)
        assert "cartesian-product" in rules or "bnlj-cross" in rules
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)


def test_detects_row_python_udf(spark, sf_dir):
    from pyspark.sql.functions import udf

    docs = load_table(spark, sf_dir, "documents")
    slow = udf(lambda s: len(s or ""), "int")
    bad = docs.select(slow("text").alias("n"))
    assert "python-eval" in _rules(lint_plan(bad))


def test_flagship_plans_are_scale_clean(spark, sf_dir):
    """The entries whose earlier revisions had the global-window defect,
    plus the flagships, must stay clean forever."""
    for name in (
        "tpch_q11",
        "tpch_q15",
        "knn_l2",
        "hybrid_knn",
        "tpch_q1",
        "merge_orders",
    ):
        assert_scale_clean(QUERIES[name](spark, sf_dir)), name


def test_pca_moment_plan_is_scale_clean(spark, sf_dir):
    """emb_pca_cov's registry entry materializes the covariance eagerly, so
    linting ITS DataFrame would only see a 36-row LocalTableScan — lint the
    distributed moment pass directly instead."""
    from mlvectordb_spark.operators.pca import moment_partials

    emb = load_table(spark, sf_dir, "embeddings")
    plan = moment_partials(emb, "embedding")
    assert_scale_clean(plan)
    # and it must be shuffle-free: one narrow pass
    assert "Exchange" not in plan._jdf.queryExecution().executedPlan().toString()


def test_allow_suppresses(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bad = li.withColumn("tot", F.sum("l_quantity").over(Window.partitionBy()))
    assert lint_plan(bad, allow={"global-window", "single-partition-exchange"}) == []
