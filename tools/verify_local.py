"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, then compares row count, column names, and an order-insensitive
value hash (rows sorted, columns sorted by name, values canonicalized).

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in ORACLE_SQL:
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {t1 - t0:.1f}s)")
            continue
        try:
            cur = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        s_sig = table_sig(scols, srows)
        o_sig = table_sig(ocols, orows)
        if s_sig[0] != o_sig[0]:
            print(f"FAIL {name}: rows spark={s_sig[0]} duckdb={o_sig[0]}")
            failures.append(name)
        elif s_sig[1] != o_sig[1]:
            print(f"FAIL {name}: cols spark={s_sig[1]} duckdb={o_sig[1]}")
            failures.append(name)
        elif s_sig[2] != o_sig[2]:
            diff = [
                (a, b)
                for a, b in zip(s_sig[3], o_sig[3])
                if a != b
            ][:3]
            print(f"FAIL {name}: value hash mismatch; first diffs: {diff}")
            failures.append(name)
        else:
            print(f"OK   {name} ({s_sig[0]} rows, spark {t1 - t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
