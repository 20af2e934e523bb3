"""Z-order layout optimizer: pruning evidence, result invariance, plan.

The layout rewrite is only worth its shuffle if (a) it never changes
query results and (b) it measurably narrows per-granule min/max on EVERY
z-order column — checked here against parquet footer statistics, which is
the same information the Spark scan's row-group skipping uses.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators import layout as L
from mlvectordb_spark.sources import load_table


@pytest.fixture(scope="module")
def layouts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    zp = tempfile.mkdtemp(prefix="t_zorder_")
    lp = tempfile.mkdtemp(prefix="t_linear_")
    cuts = L.optimize_layout(li, ["l_partkey", "l_suppkey"], zp, n_files=32, bits=5)
    L.write_linear(li, "l_partkey", lp, n_files=32)
    return li, zp, lp, cuts


def _frac_box(df, col, lo_frac, hi_frac):
    """Data-relative range so the tests hold at every SF's key domain."""
    mn, mx = df.agg(F.min(col), F.max(col)).collect()[0]
    span = mx - mn
    return (int(mn + lo_frac * span), int(mn + hi_frac * span))


def test_zorder_preserves_results(spark, layouts):
    li, zp, _, _ = layouts
    box = {
        "l_partkey": _frac_box(li, "l_partkey", 0.2, 0.7),
        "l_suppkey": _frac_box(li, "l_suppkey", 0.1, 0.6),
    }
    got = (
        L.read_box(spark, zp, box)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    want = (
        li.filter(F.col("l_partkey").between(*box["l_partkey"]))
        .filter(F.col("l_suppkey").between(*box["l_suppkey"]))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    assert got.n == want.n and got.qty == want.qty and got.n > 0


def test_zorder_prunes_on_secondary_column(layouts):
    """The claim that buys the shuffle: the linear layout prunes NOTHING
    on a non-sort-column predicate; z-order keeps its range narrow in
    every file and must skip a majority of row groups."""
    li, zp, lp, _ = layouts
    box = {"l_suppkey": _frac_box(li, "l_suppkey", 0.1, 0.3)}  # ~20% slab
    sz = L.pruning_stats(zp, box)
    sl = L.pruning_stats(lp, box)
    assert sl["read_fraction"] == 1.0, "linear layout can't skip on suppkey"
    assert sz["read_fraction"] <= 0.7, f"z-order should skip most: {sz}"
    assert sz["row_groups"] == sl["row_groups"] >= 16


def test_zorder_prunes_2d_box(layouts):
    li, zp, _, _ = layouts
    box = {
        "l_partkey": _frac_box(li, "l_partkey", 0.1, 0.2),
        "l_suppkey": _frac_box(li, "l_suppkey", 0.1, 0.3),
    }
    sz = L.pruning_stats(zp, box)
    # ~10% x ~20% box: the z layout must read well under half the table
    assert sz["read_fraction"] <= 0.5, sz


def test_box_predicates_push_down(spark, layouts):
    li, zp, _, _ = layouts
    pk = _frac_box(li, "l_partkey", 0.1, 0.2)
    sk = _frac_box(li, "l_suppkey", 0.1, 0.3)
    box = {"l_partkey": pk, "l_suppkey": sk}
    from mlvectordb_spark.plans.explain import explain_query

    plan = explain_query(L.read_box(spark, zp, box))
    pushed = " ".join(plan["pushed_filters"])
    assert f"GreaterThanOrEqual(l_partkey,{pk[0]})" in pushed, pushed
    assert f"LessThanOrEqual(l_suppkey,{sk[1]})" in pushed, pushed


def test_zorder_key_is_codegen_only(spark, layouts):
    """The z key must stay JVM-side: no BatchEvalPython / ArrowEval in the
    rewrite plan — bins and bit interleave are Column arithmetic."""
    li, _, _, cuts = layouts
    z = L.zorder_key(li, ["l_partkey", "l_suppkey"], cuts, bits=5)
    plan = (
        li.withColumn("__z", z)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cuts_are_bounded_and_monotone(layouts):
    _, _, _, cuts = layouts
    for col, cs in cuts.items():
        assert len(cs) == 31  # 2^5 - 1
        assert cs == sorted(cs)


def test_rejects_string_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="z-order column"):
        L.column_cuts(docs, ["lang"], bits=4)


def test_timestamp_zorder_pushdown_and_results(spark, sf_dir):
    """Z-order over (timestamp, numeric): the timestamp BETWEEN must reach
    PushedFilters as a typed literal (a column-side cast would kill
    skipping), and results must match the raw table."""
    li = load_table(spark, sf_dir, "lineitem")
    zp = tempfile.mkdtemp(prefix="t_zts_")
    L.optimize_layout(li, ["l_shipdate", "l_partkey"], zp, n_files=16, bits=5)
    mn, mx = (
        li.agg(
            F.min(F.col("l_shipdate").cast("timestamp").cast("double")),
            F.max(F.col("l_shipdate").cast("timestamp").cast("double")),
        ).collect()[0]
    )
    ts_box = (mn + 0.2 * (mx - mn), mn + 0.5 * (mx - mn))
    pk = _frac_box(li, "l_partkey", 0.1, 0.6)
    box = {"l_shipdate": ts_box, "l_partkey": pk}
    from mlvectordb_spark.plans.explain import explain_query

    reader = L.read_box(spark, zp, box)
    pushed = " ".join(explain_query(reader)["pushed_filters"])
    assert "l_shipdate" in pushed and "GreaterThanOrEqual" in pushed, pushed
    got = reader.count()
    want = (
        li.filter(
            F.col("l_shipdate")
            .cast("timestamp")
            .between(
                F.timestamp_seconds(F.lit(ts_box[0])),
                F.timestamp_seconds(F.lit(ts_box[1])),
            )
        )
        .filter(F.col("l_partkey").between(*pk))
        .count()
    )
    assert got == want and got > 0


def test_file_pruned_read_matches_and_shrinks(spark, layouts):
    li, zp, _, _ = layouts
    box = {
        "l_partkey": _frac_box(li, "l_partkey", 0.1, 0.2),
        "l_suppkey": _frac_box(li, "l_suppkey", 0.1, 0.3),
    }
    import os

    n_total = sum(1 for f in os.listdir(zp) if f.endswith(".parquet"))
    files = L.overlapping_files(zp, box)
    assert 0 < len(files) < n_total, (len(files), n_total)
    a = L.read_box_pruned(spark, zp, box).count()
    b = L.read_box(spark, zp, box).count()
    assert a == b > 0


def test_file_pruned_read_empty_box(spark, layouts):
    li, zp, _, _ = layouts
    mx = li.agg(F.max("l_partkey")).collect()[0][0]
    box = {"l_partkey": (mx + 10_000, mx + 20_000)}
    assert L.overlapping_files(zp, box) == []
    assert L.read_box_pruned(spark, zp, box).count() == 0


def test_append_layout_keeps_pruning_and_results(spark, layouts):
    """Continuous ingest: a batch appended under SAVED cuts lands
    z-clustered — pruning stays engaged across generations and the box
    result reflects both generations."""
    li, zp, _, cuts = layouts
    import shutil

    zp2 = tempfile.mkdtemp(prefix="t_zappend_")
    shutil.rmtree(zp2)
    shutil.copytree(zp, zp2)
    batch = li.filter(F.col("l_orderkey") % 7 == 0)
    n_batch_rows = batch.count()
    L.append_layout(batch, ["l_partkey", "l_suppkey"], zp2, cuts, n_files=4, bits=5)
    box = {
        "l_partkey": _frac_box(li, "l_partkey", 0.1, 0.3),
        "l_suppkey": _frac_box(li, "l_suppkey", 0.2, 0.5),
    }
    base = L.read_box(spark, zp, box).count()
    extra = (
        batch.filter(F.col("l_partkey").between(*box["l_partkey"]))
        .filter(F.col("l_suppkey").between(*box["l_suppkey"]))
        .count()
    )
    got = L.read_box(spark, zp2, box).count()
    assert got == base + extra and n_batch_rows > 0
    # the appended generation must still skip: a secondary-column slab
    # reads well under the whole (now larger) table
    slab = {"l_suppkey": _frac_box(li, "l_suppkey", 0.1, 0.3)}
    sz = L.pruning_stats(zp2, slab)
    assert sz["read_fraction"] <= 0.75, sz
