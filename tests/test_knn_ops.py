"""KNN operator semantics, mirroring the reference suite's properties:
ranking vs exact oracle, k-clamp, deleted/filtered exclusion
(tests/test_query_processor.py, tests/test_index.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.knn import knn, knn_join, range_query, threshold_query

np.random.seed(42)
DIM = 10
N = 100


@pytest.fixture(scope="module")
def emb_df(spark):
    data = np.random.rand(N, DIM).astype(np.float32)
    rows = [(i, data[i].tolist(), i % 3) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")
    return df, data


def test_knn_ranking_matches_numpy(spark, emb_df):
    df, data = emb_df
    q = data[0].astype(np.float64)
    got = [r.vec_id for r in knn(df, data[0].tolist(), 5, metric="cosine").collect()]
    sims = (data.astype(np.float64) @ q) / (
        np.linalg.norm(data.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    expected = list(np.argsort(-np.round(sims, 4), kind="stable")[:5])
    assert got == [int(x) for x in expected]


def test_knn_clamps_to_available(spark, emb_df):
    df, _ = emb_df
    small = df.filter(F.col("vec_id") < 2)
    out = knn(small, [0.5] * DIM, 5, metric="l2").collect()
    assert len(out) == 2  # ref: asking 5 of 2 returns 2 (test_query_processor.py:122-131)


def test_knn_prefilter_restricts(spark, emb_df):
    df, _ = emb_df
    out = knn(df, [0.5] * DIM, 10, metric="l2", pre_filter=F.col("label") == 1)
    assert all(r.label == 1 for r in out.collect())


def test_range_query_bound(spark, emb_df):
    df, data = emb_df
    out = range_query(df, data[0].tolist(), 1.0, metric="l2").collect()
    assert all(r.score <= 1.0 for r in out)
    # query point itself is at distance 0
    assert 0 in {r.vec_id for r in out}


def test_threshold_query_bound(spark, emb_df):
    df, data = emb_df
    out = threshold_query(df, data[0].tolist(), 0.9, metric="cosine").collect()
    assert all(r.score >= 0.9 for r in out)
    assert 0 in {r.vec_id for r in out}


def test_threshold_rejects_distance_metric(spark, emb_df):
    df, _ = emb_df
    with pytest.raises(ValueError):
        threshold_query(df, [0.0] * DIM, 0.5, metric="l2")


def test_knn_join_topk_per_query(spark, emb_df):
    df, data = emb_df
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_join(df, queries, 4, metric="l2").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        assert len(rows) == 4
        # nearest neighbour of a point is itself at distance 0
        assert rows[0].vec_id == qid or any(x.vec_id == qid for x in rows)


def test_hard_negatives_planted_geometry(spark):
    """The nearest same-label item is never returned; the nearest
    different-label items come back in distance order."""
    from mlvectordb_spark.operators.knn import hard_negatives

    rows = [
        (0, [0.0, 0.0], 0),   # anchor
        (1, [0.1, 0.0], 0),   # same label, closest overall -> excluded
        (2, [0.2, 0.0], 1),   # nearest negative
        (3, [0.3, 0.0], 2),   # second negative
        (4, [5.0, 0.0], 1),   # far negative
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.filter("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding", "label"
    )
    out = hard_negatives(emb, q, 2).orderBy("score").collect()
    assert [r.vec_id for r in out] == [2, 3]
    assert all(r.neg_label != 0 for r in out)


def test_contrastive_triplets_structure(spark):
    """Positive = nearest same-label (not self); every negative differs in
    label; margin = neg_score - pos_score."""
    from mlvectordb_spark.operators.knn import contrastive_triplets

    rows = [
        (0, [0.0, 0.0], 0),
        (1, [1.0, 0.0], 0),    # positive (nearest same-label)
        (2, [0.5, 0.0], 1),    # hard negative (closer than positive)
        (3, [2.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.filter("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding", "label"
    )
    out = contrastive_triplets(emb, q, 2).orderBy("neg_rank").collect()
    assert all(r.pos_id == 1 for r in out)
    assert [r.neg_id for r in out] == [2, 3]
    # the rank-1 negative is HARDER than the positive: negative margin
    assert out[0].margin == round(out[0].neg_score - out[0].pos_score, 4)
    assert out[0].margin < 0 < out[1].margin
