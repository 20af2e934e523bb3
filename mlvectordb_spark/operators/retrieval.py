"""Lexical retrieval (BM25) and hybrid rank fusion (RRF).

The reference is a vector store; a production retrieval stack pairs the
embedding index with a lexical scorer and fuses the two rankings —
"hybrid search" in the modern sense (the reference's declared hybrid query,
README.md:288, is metadata-filter + vector; this module adds the
lexical+vector fusion the same README positions the store for). Both
operators here are exact and SQL-expressible, so both carry DuckDB oracles.

Scale design (the part that matters at 100 TB):

- **BM25 is ONE corpus scan with ZERO data shuffles.** The classic
  formulation explodes tokens and shuffles (doc, term) pairs; for a
  bounded query (|Q| terms, the serving shape) that is pure waste. Instead
  each document row computes, in a single projection, its length `dl` and
  one `tf_i` per query term via `F.size(F.filter(tokens, t == term_i))` —
  per-row array ops in whole-stage codegen. Corpus statistics (N, avgdl,
  df per term) are ONE 1-row aggregate over that projection (|Q|
  conditional sums — map-side partials, a single row crosses the wire),
  cross-joined back as a broadcast. Scoring is then row-local and the
  top-k compiles to TakeOrderedAndProject (per-partition heaps, k·P rows
  to the driver, no global sort). Two passes over a narrow projection of
  the corpus, nothing else.

- **RRF fusion joins two BOUNDED rank lists** (top-N each, N ~ 50), a
  driver-scale full-outer join — the corpus is touched only by the two
  upstream rankers.

Reference analog: none in code (hnswlib only); this extends the declared
search surface the way Elasticsearch/Vespa/pgvector deployments do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.functions import text as TX

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(tokens_col: Column, term: str) -> Column:
    return F.size(F.filter(tokens_col, lambda t: t == F.lit(term)))


def bm25_scored(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(id, score) for every document matching ≥1 query term, scored with
    BM25 (idf = ln(1 + (N − df + ½)/(df + ½)), the Robertson/Lucene form).
    See module docstring for the one-scan/zero-shuffle plan shape."""
    toks = TX.tokens(text_col)
    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    parts = []
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        parts.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return (
        scored.withColumn("score", total)
        .filter(F.col("score") > 0.0)
        .select(id_col, "score")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k by BM25, deterministic ties (score desc, id asc); score
    rounded to 4 for oracle-stable output. TakeOrderedAndProject — no
    corpus shuffle."""
    scored = bm25_scored(docs, query_terms, text_col, id_col, k1, b)
    return (
        scored.withColumn("score", F.round("score", 4))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def with_rank(df: DataFrame, score_col: str, id_col: str, ascending: bool) -> DataFrame:
    """Attach a deterministic dense 1-based `rank` (score, then id asc) to
    a BOUNDED result (a top-N list — the window runs over ≤N rows)."""
    from pyspark.sql import Window

    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    w = Window.orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two bounded (id, rank) lists:
    score = Σ 1/(k_rrf + rank), absent list contributes 0 (the standard
    Cormack/Clarke formulation). Returns top-k by fused score desc, id
    asc, with both source ranks exposed (NULL where unranked)."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = a.join(b, id_col, "full")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b"))
    ).otherwise(F.lit(0.0))
    return (
        fused.withColumn("rrf", F.round(contrib_a + contrib_b, 6))
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "rank_a", "rank_b", "rrf")
    )
