"""Parity of the Arrow-path local DataFrame helper (guide §4: the
pickled-row `createDataFrame(list)` launches one Python worker per
default partition on EVERY downstream action; `local_rows_df` routes
the same rows through pandas/Arrow). The helper replaced every
driver-local createDataFrame in the serving paths, so value AND schema
parity with the classic path is load-bearing for the driver's
type-sensitive oracle hash."""

import math

import pytest

from mlvectordb_spark.functions.localdf import local_rows_df


@pytest.fixture(scope="module")
def spark():
    from mlvectordb_spark.session import get_spark

    return get_spark("test-localdf", master="local[2]")


CASES = [
    ("id string, score double", [("a", 0.1), ("b", 2.0 / 3.0)]),
    ("__qid long, __qvec array<float>", [(1, [0.1, 0.2]), (2, [1e-8, 3.3])]),
    ("q long, v array<double>", [(1, [0.1, 0.2, -7.25])]),
    ("id string, m map<string,string>", [("a", {"k": "v"}), ("b", {})]),
    ("item string, val double", []),
    ("a int, b string", [(None, None), (3, "x")]),
    ("i int, payload binary", [(1, b"\x00\xffPNG"), (2, b"")]),
    ("nprobe int, recall double", [(1, 0.1), (4, 0.7)]),
]


@pytest.mark.parametrize("schema,rows", CASES, ids=[c[0] for c in CASES])
def test_value_and_schema_parity(spark, schema, rows):
    base = spark.createDataFrame(rows, schema)
    fast = local_rows_df(spark, rows, schema)
    assert fast.schema == base.schema
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe sort
    assert sorted(map(tuple, fast.collect()), key=key) == sorted(
        map(tuple, base.collect()), key=key
    )


def test_struct_type_schema_and_row_objects(spark):
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    st = StructType(
        [
            StructField("id", StringType()),
            StructField("values", ArrayType(FloatType())),
            StructField("metadata", MapType(StringType(), StringType())),
        ]
    )
    rows = [Row(id="v1", values=[1.5, -2.25], metadata={"a": "1"})]
    base = spark.createDataFrame(rows, st)
    fast = local_rows_df(spark, rows, st)
    assert fast.schema == base.schema
    assert fast.collect() == base.collect()


def test_float32_truncation_matches(spark):
    # 0.1 is not exactly representable in float32: both paths must
    # truncate identically (the driver hash reads the float value).
    rows = [(1, [0.1, 1.0 / 3.0])]
    schema = "i long, v array<float>"
    b = spark.createDataFrame(rows, schema).collect()[0].v
    f = local_rows_df(spark, rows, schema).collect()[0].v
    assert all(
        math.isclose(x, y, rel_tol=0.0, abs_tol=0.0) for x, y in zip(b, f)
    )


def test_no_python_workers_at_action_time(spark):
    # the whole point: the Arrow path must not plan a pickled-row RDD
    # scan (ExistingRDD / SerializeFromObject of ObjectHashAggregate);
    # LocalTableScan / parallelized Arrow batches are both acceptable,
    # but the plan must not contain a Python serializer scan.
    df = local_rows_df(spark, [(1, "x")], "a long, b string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SerializeFromObject" not in plan
