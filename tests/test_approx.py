"""Sketch-based approximations bounded against exact answers (they have no
SQL oracle by design — sketches differ across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlvectordb_spark.queries import QUERIES
from mlvectordb_spark.sources.testdata import load_table


def test_approx_stats_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.nd, r.med)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.median("l_extendedprice").alias("med"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_median_price, r.approx_p99_price)
        for r in QUERIES["approx_stats"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, (nd, med) in exact.items():
        a_nd, a_med, a_p99 = approx[flag]
        assert abs(a_nd - nd) / nd < 0.1  # HLL relative error well under 10%
        assert abs(a_med - med) / med < 0.1
        assert a_p99 >= a_med
