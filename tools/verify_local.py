"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, then compares row count, column names, an order-insensitive
value hash (rows sorted, columns sorted by name, values canonicalized), AND
a normalized per-column output TYPE signature (Spark schema vs
`DESCRIBE <oracle>` — DuckDB types the result without executing it, so
the oracle still runs exactly once).

The type check exists because the driver's value hash is type-sensitive
while string-canonicalized values are not: in round 11 `shard_assignments`
shipped with an uncast DuckDB `sum(BIGINT)` (→ HUGEINT / decimal128(38,0)),
passed the 174/174 string-value gate here, and failed the driver hash.
Normalized type tokens make that class of drift fail locally.

Usage: python tools/verify_local.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from mlvectordb_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from mlvectordb_spark.schema import TESTDATA_TABLES  # noqa: E402
from mlvectordb_spark.session import get_spark  # noqa: E402


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_sig(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    return (len(rows), tuple(sorted(cols)), hash(tuple(canon_rows)), canon_rows)


def norm_spark_type(dt) -> str:
    """Normalize a pyspark.sql.types.DataType to a comparable token."""
    from pyspark.sql import types as T

    simple = {
        T.BooleanType: "bool",
        # Signed int widths share one token: the driver gate is proven
        # (ten green rows across r8-r11: rank()/year() columns are int32
        # on Spark, int64 on DuckDB) to hash int widths as equivalent,
        # while HUGEINT/decimal128(38,0) — NOT an int token — broke it.
        T.ByteType: "int",
        T.ShortType: "int",
        T.IntegerType: "int",
        T.LongType: "int",
        T.FloatType: "float32",
        T.DoubleType: "float64",
        T.StringType: "string",
        T.BinaryType: "binary",
        T.DateType: "date",
        # tz-aware vs NTZ timestamps canonicalize to the same wall-clock
        # values on both engines at the gate's UTC session — one token.
        T.TimestampType: "timestamp",
        T.NullType: "null",
    }
    for cls, token in simple.items():
        if isinstance(dt, cls):
            return token
    if type(dt).__name__ == "TimestampNTZType":
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"array<{norm_spark_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (
            f"map<{norm_spark_type(dt.keyType)},"
            f"{norm_spark_type(dt.valueType)}>"
        )
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{norm_spark_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"other:{dt.simpleString()}"


def norm_duck_type(t: str) -> str:
    """Normalize a DuckDB type STRING (from `DESCRIBE <query>` — which
    types the result without executing it) to the same tokens as
    norm_spark_type. HUGEINT maps to decimal(38,0), NOT the int token —
    the r11 drift this gate exists to catch. Current oracle universe is
    seven scalar types; the recursive cases cover list/decimal growth."""
    t = t.strip()
    u = t.upper()
    if u.endswith("[]"):
        return f"array<{norm_duck_type(t[:-2])}>"
    if u.startswith("DECIMAL"):
        return "decimal" + u[len("DECIMAL"):].replace(" ", "")
    simple = {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
        "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
        "UINTEGER": "int", "UBIGINT": "uint64",
        "HUGEINT": "decimal(38,0)",
        "FLOAT": "float32", "REAL": "float32", "DOUBLE": "float64",
        "VARCHAR": "string", "BLOB": "binary", "BOOLEAN": "bool",
        "DATE": "date", '"NULL"': "null", "NULL": "null",
    }
    if u in simple:
        return simple[u]
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    return f"other:{t}"


def type_mismatches(sdf, duck_types: dict[str, str]) -> list[str]:
    """Per-column normalized-type diffs between a Spark DF and the
    DuckDB DESCRIBE column types; empty list when compatible. A `null`
    token on either side (an all-NULL literal column) matches
    anything."""
    s_types = {f.name: norm_spark_type(f.dataType) for f in sdf.schema.fields}
    o_types = {name: norm_duck_type(t) for name, t in duck_types.items()}
    diffs = []
    for name in sorted(set(s_types) & set(o_types)):
        st, ot = s_types[name], o_types[name]
        if st != ot and "null" not in (st, ot):
            diffs.append(f"{name}: spark={st} duckdb={ot}")
    return diffs


def compare_entry(spark, con, name: str, sf_dir: str, sql: str | None = None):
    """Run one registry entry vs its oracle; returns (status, detail).

    status: "OK" | "SKIP" (no oracle) | "FAIL". `sql` overrides the
    registered oracle (used by the canary test in
    tests/test_verify_gate.py to prove type drift fails locally).
    """
    fn = QUERIES[name]
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        return "FAIL", f"spark error: {e}"
    t1 = time.time()
    sql = sql if sql is not None else ORACLE_SQL.get(name)
    if sql is None:
        return "SKIP", f"no oracle ({len(srows)} rows, {t1 - t0:.1f}s)"
    try:
        # DESCRIBE types the result WITHOUT executing it, so the oracle
        # runs once (a second .arrow() execution doubled the DuckDB half
        # of a full sweep — r12 review finding)
        duck_types = {
            r[0]: r[1] for r in con.execute("DESCRIBE " + sql).fetchall()
        }
        cur = con.execute(sql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as e:  # noqa: BLE001
        return "FAIL", f"duckdb error: {e}"
    s_sig = table_sig(scols, srows)
    o_sig = table_sig(ocols, orows)
    if s_sig[0] != o_sig[0]:
        return "FAIL", f"rows spark={s_sig[0]} duckdb={o_sig[0]}"
    if s_sig[1] != o_sig[1]:
        return "FAIL", f"cols spark={s_sig[1]} duckdb={o_sig[1]}"
    tdiffs = type_mismatches(sdf, duck_types)
    if tdiffs:
        return "FAIL", f"output types diverge: {'; '.join(tdiffs)}"
    if s_sig[2] != o_sig[2]:
        diff = [(a, b) for a, b in zip(s_sig[3], o_sig[3]) if a != b][:3]
        return "FAIL", f"value hash mismatch; first diffs: {diff}"
    return "OK", f"{s_sig[0]} rows, spark {t1 - t0:.1f}s"


def make_duckdb(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("verify-local")
    con = make_duckdb(sf_dir)
    failures = []
    for name in names:
        status, detail = compare_entry(spark, con, name, sf_dir)
        print(f"{status:4s} {name}: {detail}" if status != "OK"
              else f"OK   {name} ({detail})")
        if status == "FAIL":
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
