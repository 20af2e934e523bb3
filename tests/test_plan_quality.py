"""Physical-plan assertions: the 100 TB posture, checked mechanically.

Correctness says the result is right; these tests say the PLAN is right —
top-k compiles to TakeOrderedAndProject (no global sort), dimension joins
broadcast (no big-side shuffle), predicates reach the parquet scan, and the
namespace partition column prunes partitions."""

from __future__ import annotations

import pytest

from mlvectordb_spark.operators.store import VectorStore
from mlvectordb_spark.plans.explain import explain_query
from mlvectordb_spark.queries import QUERIES


def _ops(plan) -> str:
    return " | ".join(s["operator"] for s in plan["execution_plan"]["steps"])


def test_knn_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = explain_query(QUERIES["knn_l2"](spark, sf_dir))
    ops = _ops(plan)
    assert "TakeOrderedAndProject" in ops
    assert "Exchange rangepartitioning" not in plan["raw"]  # no global sort


def test_tpch_q3_broadcasts_dimensions(spark, sf_dir):
    plan = explain_query(QUERIES["tpch_q3"](spark, sf_dir))
    assert plan["uses_broadcast"], "customer/orders side should broadcast"


def test_tpch_q1_predicate_pushdown(spark, sf_dir):
    plan = explain_query(QUERIES["tpch_q1"](spark, sf_dir))
    assert any(
        "l_shipdate" in f for f in plan["pushed_filters"]
    ), f"shipdate filter must reach the scan: {plan['pushed_filters']}"
    # NB: codegen ids only materialize after AQE executes stages, so the
    # pre-execution plan can't be asserted on codegen stage count here.


def test_hybrid_label_filter_pushed_to_scan(spark, sf_dir):
    plan = explain_query(QUERIES["hybrid_knn"](spark, sf_dir))
    assert any("label" in f for f in plan["pushed_filters"])


def test_column_pruning_on_counts(spark, sf_dir):
    """A count-style aggregate must not read the 64-float embedding column."""
    plan = explain_query(
        QUERIES["ns_stats"](spark, sf_dir).select("label", "n_vectors")
    )
    # ReadSchema should mention label; embedding may appear only because
    # avg_sq_norm needs it — project the two scalar cols first and the scan
    # of a pure-count query must be narrow:
    from mlvectordb_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    narrow = load_table(spark, sf_dir, "embeddings").groupBy("label").count()
    nplan = explain_query(narrow)
    assert all("embedding" not in rs for rs in nplan["read_schemas"]), nplan[
        "read_schemas"
    ]


def test_store_namespace_partition_pruning(spark, tmp_path):
    store = VectorStore(spark, str(tmp_path / "s"))
    store.upsert_many([{"values": [1.0]}], namespace="a")
    store.upsert_many([{"values": [2.0]}], namespace="b")
    from pyspark.sql import functions as F

    pruned = store.df().filter(F.col("namespace") == "a")
    plan = explain_query(pruned)
    assert "PartitionFilters" in plan["raw"]
    assert "namespace" in plan["raw"].split("PartitionFilters", 1)[1].split("\n")[0]


def test_minhash_enrichment_has_no_forced_broadcast(spark, sf_dir):
    """Round-2 verdict: the per-doc shingle table grows linearly with the
    corpus, so it must never be FORCED into a broadcast. No broadcast hint
    anywhere in the minhash plan — AQE picks the strategy from runtime
    sizes (broadcasting the small side at sf0.01 is fine; forcing it at
    100 TB is an OOM)."""
    df = QUERIES["dedup_minhash"](spark, sf_dir)
    analyzed = str(df._jdf.queryExecution().analyzed())
    assert "ResolvedHint" not in analyzed, "forced join-strategy hint found"


def test_knn_join_broadcasts_query_side(spark, sf_dir):
    plan = explain_query(QUERIES["knn_batch"](spark, sf_dir))
    assert plan["uses_broadcast"], "bounded query set must broadcast"


def test_decontaminate_broadcasts_eval_shingles(spark, sf_dir):
    """The eval set is small by construction; its shingles must broadcast
    so the corpus side is one scan with no self-shuffle."""
    plan = explain_query(QUERIES["decontaminate"](spark, sf_dir))
    assert plan["uses_broadcast"], "eval shingle set must broadcast"


def test_knn_sq8_take_ordered_no_global_sort(spark, sf_dir):
    """Both quantized-KNN stages are top-k: TakeOrderedAndProject, never a
    range-partitioned global sort of the corpus."""
    plan = explain_query(QUERIES["knn_sq8"](spark, sf_dir))
    assert "TakeOrderedAndProject" in _ops(plan)
    assert "Exchange rangepartitioning" not in plan["raw"]


def test_stratified_sample_is_scan_filter_agg(spark, sf_dir):
    """Deterministic sampling is a per-row predicate: exactly one shuffle
    (the final per-stratum aggregation), no join, no window."""
    plan = explain_query(QUERIES["stratified_sample"](spark, sf_dir))
    raw = plan["raw"]
    assert "Join" not in raw and "Window" not in raw
    assert raw.count("Exchange") <= 2  # partial->final agg exchange only
