"""Canary tests for the type-aware local correctness gate.

Round-11 escape class: `shard_assignments` shipped with an uncast DuckDB
`sum(BIGINT)` (HUGEINT / decimal128(38,0) output), passed the then
string-canonicalizing local gate 174/174, and failed the driver's
type-sensitive value hash. These tests pin that tools/verify_local.py now
catches exactly that drift locally: the committed (cast) oracle must pass
and the reverted (uncast) oracle must FAIL on output types.
"""

from __future__ import annotations

import sys

import pytest

import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from verify_local import (  # noqa: E402
    compare_entry,
    make_duckdb,
    norm_duck_type,
    norm_spark_type,
)

from mlvectordb_spark.queries import ORACLE_SQL  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = make_duckdb(sf_dir)
    yield con
    con.close()


def test_shard_assignments_oracle_green(spark, duck, sf_dir):
    status, detail = compare_entry(spark, duck, "shard_assignments", sf_dir)
    assert status == "OK", detail


def test_uncast_hugeint_oracle_fails_locally(spark, duck, sf_dir):
    """The r11 driver-only failure must now be a local failure too."""
    cast_form = "sum(c_custkey)::BIGINT"
    sql = ORACLE_SQL["shard_assignments"]
    assert cast_form in sql, "committed oracle lost the BIGINT cast"
    bad = sql.replace(cast_form, "sum(c_custkey)")
    status, detail = compare_entry(
        spark, duck, "shard_assignments", sf_dir, sql=bad
    )
    assert status == "FAIL"
    assert "types diverge" in detail and "decimal(38,0)" in detail, detail


def test_type_token_normalization():
    from pyspark.sql import types as T

    # HUGEINT stays distinct from the int token — the point of the gate.
    assert norm_duck_type("HUGEINT") == "decimal(38,0)"
    assert norm_spark_type(T.LongType()) == "int"
    assert norm_duck_type("BIGINT") == "int"
    # Int widths collapse (driver-proven equivalent: rank()/year() rows).
    assert norm_spark_type(T.IntegerType()) == norm_duck_type("INTEGER")
    # Equivalences the driver has proven across green rounds.
    assert norm_duck_type("VARCHAR") == norm_spark_type(T.StringType())
    assert norm_duck_type("TIMESTAMP") == norm_spark_type(
        T.TimestampType()
    )
    assert norm_duck_type("DOUBLE[]") == norm_spark_type(
        T.ArrayType(T.DoubleType())
    )
    assert norm_duck_type("DECIMAL(12,2)") == "decimal(12,2)"
