"""Distance-kernel correctness against a numpy oracle (the reference's own
test idiom: ranking matches independent exact math,
tests/test_query_processor.py:65-67)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.functions import vector as V

np.random.seed(42)
DIM = 16
N = 50


@pytest.fixture(scope="module")
def vec_df(spark):
    data = np.random.rand(N, DIM).astype(np.float32)
    rows = [(i, data[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    return df, data


def test_l2_sq_matches_numpy(spark, vec_df):
    df, data = vec_df
    q = data[0]
    out = {
        r.id: r.s
        for r in df.withColumn(
            "s", V.l2_sq("v", F.array(*[F.lit(float(x)) for x in q]))
        ).collect()
    }
    for i in range(N):
        expected = float(np.sum((data[i].astype(np.float64) - q.astype(np.float64)) ** 2))
        assert out[i] == pytest.approx(expected, rel=1e-9)


def test_cosine_matches_numpy(spark, vec_df):
    df, data = vec_df
    q = data[0].astype(np.float64)
    out = {
        r.id: r.s
        for r in df.withColumn(
            "s", V.cosine_sim("v", F.array(*[F.lit(float(x)) for x in data[0]]))
        ).collect()
    }
    for i in range(N):
        a = data[i].astype(np.float64)
        expected = float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q)))
        assert out[i] == pytest.approx(expected, rel=1e-9)


def test_ip_and_norm(spark, vec_df):
    df, data = vec_df
    q = data[1]
    out = df.withColumn(
        "d", V.dot("v", F.array(*[F.lit(float(x)) for x in q]))
    ).withColumn("n", V.norm2("v"))
    for r in out.collect():
        a = data[r.id].astype(np.float64)
        assert r.d == pytest.approx(float(a @ q.astype(np.float64)), rel=1e-9)
        assert r.n == pytest.approx(float(np.linalg.norm(a)), rel=1e-9)


def test_normalize_unit_norm(spark, vec_df):
    df, _ = vec_df
    out = df.select(V.normalize("v").alias("u")).collect()
    for r in out:
        assert float(np.linalg.norm(r.u)) == pytest.approx(1.0, rel=1e-9)


def test_metric_expr_rejects_unknown():
    with pytest.raises(ValueError):
        V.metric_expr(F.col("a"), F.col("b"), "manhattan")
    with pytest.raises(ValueError):
        V.metric_ascending("manhattan")
