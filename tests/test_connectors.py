"""Connector round-trips (scans/sources/sinks) + Python UDTF surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.sources.connectors import read_table, write_table
from mlvectordb_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, nation, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_table(nation, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_partitioned_write_prunes(spark, nation, tmp_path):
    path = str(tmp_path / "part")
    write_table(nation, path, fmt="parquet", partition_by=["n_regionkey"])
    back = read_table(spark, path, fmt="parquet")
    one = back.filter(F.col("n_regionkey") == 1)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert one.count() == nation.filter(F.col("n_regionkey") == 1).count()


def test_unknown_format_rejected(spark, nation, tmp_path):
    with pytest.raises(ValueError):
        write_table(nation, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), fmt="avro")


def test_python_udtf_surface(spark):
    """UDTF (table function) surface — one row in, N rows out."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                if w:
                    yield w, i

    out = SplitWords(lit("alpha beta gamma")).collect()
    assert [(r.word, r.pos) for r in out] == [
        ("alpha", 0),
        ("beta", 1),
        ("gamma", 2),
    ]
