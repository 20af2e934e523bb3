"""Data-quality expectations (operators/expectations.py): one-scan
summary, quarantine routing, uniqueness, and fail-fast enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from mlvectordb_spark.operators.expectations import (
    Expectations,
    expect,
    in_range,
    in_set,
    matches,
    not_null,
)

ROWS = [
    (1, "a", 10.0, "en"),
    (2, "b", -5.0, "en"),      # in_range violation
    (3, None, 20.0, "fr"),     # not_null violation
    (4, "d", 30.0, "xx"),      # in_set violation
    (4, "e", 40.0, "en"),      # duplicate id (with row above)
    (5, "9f", 50.0, "en"),     # matches violation (starts with a digit)
]
SCHEMA = "id bigint, name string, score double, lang string"


def _exp():
    return Expectations(
        [
            not_null("name"),
            in_range("score", 0.0, 100.0),
            in_set("lang", ["en", "fr", "de"]),
            matches("name", "^[a-z]"),
        ],
        unique_on=["id"],
    )


def test_summary_counts_each_rule(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["rule"]: (r["violations"], r["total"]) for r in _exp().summary(df).collect()}
    assert got == {
        "not_null_name": (1, 6),
        "in_range_score": (1, 6),
        "in_set_lang": (1, 6),
        "matches_name": (1, 6),
        "unique_id": (2, 6),
    }


def test_summary_is_one_scan_for_row_rules(spark, tmp_path):
    import re

    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "t"))
    pq = spark.read.parquet(str(tmp_path / "t"))
    exp = Expectations(
        [not_null("name"), in_range("score", 0.0, 100.0)]
    )
    plan = exp.summary(pq)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1, plan


def test_split_routes_and_annotates(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    clean, bad = _exp().split(df)
    assert clean.columns == df.columns
    assert {r["id"] for r in clean.collect()} == {1}
    failed = {
        (r["id"], r["name"]): set(r["_failed_rules"]) for r in bad.collect()
    }
    assert failed[(2, "b")] == {"in_range_score"}
    assert failed[(3, None)] == {"not_null_name"}
    assert failed[(4, "d")] == {"in_set_lang", "unique_id"}
    assert failed[(4, "e")] == {"unique_id"}
    assert failed[(5, "9f")] == {"matches_name"}


def test_null_semantics_follow_sql_check(spark):
    # NULL passes range/set/regex rules (SQL CHECK convention); only
    # not_null rejects it
    df = spark.createDataFrame([(1, None, None, None)], SCHEMA)
    exp = Expectations(
        [in_range("score", 0.0, 1.0), in_set("lang", ["en"]), matches("name", "x")]
    )
    clean, bad = exp.split(df)
    assert clean.count() == 1 and bad.count() == 0


def test_null_keys_count_as_duplicates(spark):
    df = spark.createDataFrame(
        [(None, "a", 1.0, "en"), (None, "b", 2.0, "en")], SCHEMA
    )
    exp = Expectations([], unique_on=["id"])
    got = exp.summary(df).collect()[0]
    assert (got["rule"], got["violations"]) == ("unique_id", 2)
    _clean, bad = exp.split(df)
    assert bad.count() == 2


def test_custom_expectation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    exp = Expectations([expect("score_gt_id", F.col("score") > F.col("id"))])
    got = exp.summary(df).collect()[0]
    assert got["violations"] == 1  # id=2, score=-5


def test_enforce_passes_clean_and_raises_on_violation(spark):
    clean = spark.createDataFrame([(1, "a", 1.0, "en")], SCHEMA)
    exp = Expectations([not_null("name")])
    assert exp.enforce(clean).count() == 1
    dirty = spark.createDataFrame([(1, None, 1.0, "en")], SCHEMA)
    with pytest.raises(Exception) as ei:
        exp.enforce(dirty).count()
    assert "expectation violated" in str(ei.value)


def test_duplicate_rule_names_rejected(spark):
    with pytest.raises(ValueError):
        Expectations([not_null("a"), not_null("a")])
    with pytest.raises(ValueError):
        Expectations([])


def test_null_custom_predicate_consistent_across_surfaces(spark):
    # a custom predicate that evaluates to NULL is a PASS everywhere
    # (SQL CHECK): summary counts 0, split routes clean, enforce returns
    df = spark.createDataFrame([(1, "a", None, "en")], SCHEMA)
    exp = Expectations([expect("score_gt_id", F.col("score") > F.col("id"))])
    assert exp.summary(df).collect()[0]["violations"] == 0
    clean, bad = exp.split(df)
    assert clean.count() == 1 and bad.count() == 0
    assert exp.enforce(df).count() == 1


def test_enforce_raises_on_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(4, "d", 1.0, "en"), (4, "e", 2.0, "en")], SCHEMA
    )
    exp = Expectations([not_null("name")], unique_on=["id"])
    with pytest.raises(Exception) as ei:
        exp.enforce(df).count()
    assert "expectation violated" in str(ei.value)
    # and enforce returns the original schema on clean data
    ok = spark.createDataFrame([(1, "a", 1.0, "en")], SCHEMA)
    out = exp.enforce(ok)
    assert out.columns == ok.columns and out.count() == 1


def test_summary_of_empty_frame_reports_zero(spark):
    df = spark.createDataFrame([], SCHEMA)
    got = {
        r["rule"]: (r["violations"], r["total"])
        for r in _exp().summary(df).collect()
    }
    assert all(v == (0, 0) for v in got.values()), got


def test_dotted_rule_names_resolve(spark):
    df = spark.createDataFrame(
        [((None,),), (("en",),)], "meta struct<lang: string>"
    )
    exp = Expectations([not_null("meta.lang")])
    got = exp.summary(df).collect()[0]
    assert (got["rule"], got["violations"]) == ("not_null_meta.lang", 1)


def test_foreign_key_constraint(spark):
    from mlvectordb_spark.operators.expectations import ForeignKey

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "id bigint, ck bigint",
    )
    dim = spark.createDataFrame([(10,), (20,), (20,)], "k bigint")
    exp = Expectations(
        [not_null("id")], foreign_keys=[ForeignKey("ck", dim, "k")]
    )
    got = {r["rule"]: (r["violations"], r["total"]) for r in exp.summary(facts).collect()}
    # NULL ck passes (SQL FK convention); duplicate dim keys do NOT
    # multiply fact rows; 99 is the single orphan
    assert got == {"not_null_id": (0, 4), "fk_ck": (1, 4)}
    clean, bad = exp.split(facts)
    assert {r["id"] for r in clean.collect()} == {1, 2, 4}
    assert [(r["id"], set(r["_failed_rules"])) for r in bad.collect()] == [
        (3, {"fk_ck"})
    ]
    with pytest.raises(Exception):
        exp.enforce(facts).count()


def test_foreign_key_composes_with_unique(spark):
    from mlvectordb_spark.operators.expectations import ForeignKey

    facts = spark.createDataFrame(
        [(1, 10), (1, 99)], "id bigint, ck bigint"
    )
    dim = spark.createDataFrame([(10,)], "k bigint")
    exp = Expectations(
        [], unique_on=["id"], foreign_keys=[ForeignKey("ck", dim, "k")]
    )
    got = {r["rule"]: r["violations"] for r in exp.summary(facts).collect()}
    assert got == {"fk_ck": 1, "unique_id": 2}
    _clean, bad = exp.split(facts)
    failed = {(r["id"], r["ck"]): set(r["_failed_rules"]) for r in bad.collect()}
    assert failed == {
        (1, 10): {"unique_id"},
        (1, 99): {"unique_id", "fk_ck"},
    }


def test_foreign_key_on_nested_column(spark):
    from mlvectordb_spark.operators.expectations import ForeignKey

    facts = spark.createDataFrame(
        [((10,),), ((99,),), ((None,),)],
        "meta struct<ck: bigint>",
    )
    dim = spark.createDataFrame([(10,)], "k bigint")
    exp = Expectations([], foreign_keys=[ForeignKey("meta.ck", dim, "k")])
    got = exp.summary(facts).collect()[0]
    assert (got["rule"], got["violations"], got["total"]) == (
        "fk_meta.ck", 1, 3
    )


def test_unique_rule_name_collision_rejected(spark):
    with pytest.raises(ValueError, match="duplicate rule names"):
        Expectations(
            [expect("unique_id", F.col("id") > 0)], unique_on=["id"]
        )


def test_summary_from_annotated_matches_summary(spark):
    from mlvectordb_spark.operators.expectations import ForeignKey

    df = spark.createDataFrame(ROWS, SCHEMA)
    dim = spark.createDataFrame([("en",), ("fr",)], "l string")
    exp = Expectations(
        [not_null("name"), in_range("score", 0.0, 100.0)],
        unique_on=["id"],
        foreign_keys=[ForeignKey("lang", dim, "l")],
    )
    a = {
        (r["rule"]): (r["violations"], r["total"])
        for r in exp.summary(df).collect()
    }
    b = {
        (r["rule"]): (r["violations"], r["total"])
        for r in exp.summary_from_annotated(exp.annotate(df)).collect()
    }
    assert a == b
    assert a["fk_lang"] == (1, 6)  # only 'xx' (no NULL langs in ROWS)
