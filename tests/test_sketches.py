"""CMS-prefiltered exact heavy hitters: certification + exactness.

The operator's contract is that sketch parameters change COST only: the
answer must equal the plain groupBy-HAVING at any width/depth, because
CMS estimates are one-sided (never below the true count) so the prune
keeps a superset and the final exact filter removes the leakage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.functions import text as TX
from mlvectordb_spark.operators import sketches as SK
from mlvectordb_spark.sources import load_table


@pytest.fixture(scope="module")
def bigrams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(TX.word_shingles(TX.tokens("text"), 2)).alias("bigram")
    ).cache()


def test_estimates_never_below_truth(bigrams):
    """The one-sided property certification rests on, checked for EVERY
    distinct value at a deliberately tiny width (max collisions)."""
    mat = SK.cms_matrix(bigrams, "bigram", width=128, depth=3)
    est = SK.with_cms_estimate(bigrams.distinct(), "bigram", mat)
    true = bigrams.groupBy("bigram").agg(F.count("*").alias("n"))
    bad = est.join(true, "bigram").filter(F.col("__cms_est") < F.col("n"))
    assert bad.count() == 0


@pytest.mark.parametrize("width,depth", [(128, 2), (2048, 3)])
def test_heavy_hitters_exact_at_any_sketch_size(bigrams, width, depth):
    got = {
        (r.bigram, r.cnt)
        for r in SK.heavy_hitters(
            bigrams, "bigram", 25, width=width, depth=depth
        ).collect()
    }
    want = {
        (r.bigram, r.n)
        for r in bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 25)
        .collect()
    }
    assert got == want and len(want) > 0


def test_prune_actually_drops_tail(bigrams):
    """With a threshold above most counts, the certified prune must pass
    fewer occurrences into the exact pass than the corpus holds."""
    total = bigrams.count()
    mat = SK.cms_matrix(bigrams, "bigram", width=2048, depth=3)
    surviving = (
        SK.with_cms_estimate(bigrams, "bigram", mat)
        .filter(F.col("__cms_est") >= 40)
        .count()
    )
    assert surviving < total


def test_sketch_paths_stay_jvm_side(bigrams):
    mat = SK.cms_matrix(bigrams, "bigram", width=256, depth=2)
    plan = (
        SK.with_cms_estimate(bigrams, "bigram", mat)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row matrix rides broadcast


def test_min_count_validation(bigrams):
    with pytest.raises(ValueError, match="min_count"):
        SK.heavy_hitters(bigrams, "bigram", 0)
