"""BM25 + RRF semantics on a hand-computable corpus (operators/retrieval.py).

The oracle gate (bm25_topk / hybrid_rrf) proves engine parity at sf scale;
these tests pin the FORMULA against by-hand math so a same-bug-both-engines
slip can't hide behind parity.
"""

from __future__ import annotations

import math

import pytest

from mlvectordb_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scored,
    bm25_topk,
    rrf_fuse,
    with_rank,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),       # dl 3, tf(cat)=2
            (2, "cat fish"),          # dl 2, tf(cat)=1
            (3, "dog dog dog dog"),   # dl 4, no cat
            (4, "bird"),              # dl 1, no match at all
        ],
        "doc_id long, text string",
    )


def _bm25_by_hand(tf: float, dl: float, n: float, df: float, avgdl: float) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))


def test_bm25_matches_hand_math(docs):
    rows = {r.doc_id: r.score for r in bm25_scored(docs, ["cat"]).collect()}
    # N=4, avgdl=(3+2+4+1)/4=2.5, df(cat)=2
    assert rows.keys() == {1, 2}
    assert rows[1] == pytest.approx(_bm25_by_hand(2, 3, 4, 2, 2.5))
    assert rows[2] == pytest.approx(_bm25_by_hand(1, 2, 4, 2, 2.5))


def test_bm25_topk_orders_and_clamps(docs):
    got = bm25_topk(docs, ["cat", "dog"], k=10).collect()
    assert [r.doc_id for r in got][:1] == [3] or len(got) == 3
    # doc 4 matches nothing -> excluded even with k beyond matches
    assert {r.doc_id for r in got} == {1, 2, 3}
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fusion_hand_math(spark):
    a = spark.createDataFrame([(1, 0.9), (2, 0.8)], "doc_id long, s double")
    b = spark.createDataFrame([(2, 0.1), (3, 0.2)], "doc_id long, s double")
    ra = with_rank(a, "s", "doc_id", ascending=False)   # 1->r1, 2->r2
    rb = with_rank(b, "s", "doc_id", ascending=True)    # 2->r1, 3->r2
    got = {r.doc_id: r for r in rrf_fuse(ra, rb, "doc_id", k=3, k_rrf=60).collect()}
    assert got[2].rrf == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert got[1].rrf == pytest.approx(round(1 / 61, 6))
    assert got[3].rrf == pytest.approx(round(1 / 62, 6))
    assert got[1].rank_b is None and got[3].rank_a is None
    # doc 2 (in both lists) outranks the single-list docs
    order = sorted(got.values(), key=lambda r: (-r.rrf, r.doc_id))
    assert order[0].doc_id == 2
