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


def test_fused_minhash_kernel_matches_catalyst(spark):
    """signature_shingle_table (one Arrow pass) must be value-identical to
    shingle_table + signature_table (the Catalyst kernels the DuckDB
    oracle mirrors): same surviving docs, same first-occurrence-ordered
    distinct shingles, same 8 signature components — including edge docs
    (too short to shingle, repeated shingles, multi-space runs, NULL)."""
    from mlvectordb_spark.operators.minhash import (
        NUM_MINHASHES,
        shingle_table,
        signature_shingle_table,
        signature_table,
    )
    from mlvectordb_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (100001, "one two"),                      # too short: dropped
            (100002, "a b c a b c a b c"),            # repeated shingles
            (100003, "  spaced   out   tokens here"),  # multi-space runs
            (100004, None),                            # null text
            (100005, "x y z"),                         # exactly one shingle
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    sh = shingle_table(docs)
    want = {
        r.doc_id: (list(r.sh), [r[f"m{i}"] for i in range(NUM_MINHASHES)])
        for r in sh.join(signature_table(sh), "doc_id").collect()
    }
    got = {
        r.doc_id: (list(r.sh), [r[f"m{i}"] for i in range(NUM_MINHASHES)])
        for r in signature_shingle_table(docs).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did] == want[did], f"doc {did} diverged"


def test_fused_shingle_prefix_matches_catalyst(spark):
    """shingle_prefix_table (one Arrow pass) must be value-identical to
    the Catalyst blocking form the jaccard query used — same prefix
    (concat_ws over the first two tokens, "" for empty/NULL text), same
    first-occurrence-ordered distinct shingles, EVERY doc kept (shingle-
    less docs carry an empty array)."""
    from mlvectordb_spark.functions import text as TX
    from mlvectordb_spark.operators.curation import shingle_prefix_table
    from mlvectordb_spark.operators.minhash import SHINGLE_K
    from mlvectordb_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (100001, "one two"),                       # too short: kept, sh=[]
            (100002, "a b c a b c a b c"),             # repeated shingles
            (100003, "  spaced   out   tokens here"),  # multi-space runs
            (100004, None),                            # null text
            (100005, "x y z"),                         # exactly one shingle
            (100006, ""),                              # empty text
            (100007, "solo"),                          # one token
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    toks = TX.tokens("text")
    want = {
        r.doc_id: (r.prefix, list(r.sh))
        for r in docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(toks, 1, 2)).alias("prefix"),
            F.array_distinct(TX.word_shingles(toks, SHINGLE_K)).alias("sh"),
        ).collect()
    }
    got = {
        r.doc_id: (r.prefix, list(r.sh))
        for r in shingle_prefix_table(docs, k=SHINGLE_K).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did] == want[did], f"doc {did} diverged"
