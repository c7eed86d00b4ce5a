"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query's Spark plan and its ANSI-SQL oracle over the same
parquet, then compares row count, column-name set, and order-insensitive
values (floats via isclose — the registered queries already round at the
presentation edge, so surviving differences indicate a real bug).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from yelpdatawarehouse_spark.sources.tables import TABLES

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def _canon_value(v):
    if v is None:
        return ("~none",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int,)):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("str", v.isoformat())
    if isinstance(v, bytes):
        return ("str", v.hex())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon_value(x) for x in v))
    return ("str", str(v))


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for _, c in sorted(zip(range(len(cols)), [cols[i] for i in order]))], out


def _values_close(a, b) -> bool:
    if a[0] != b[0]:
        return False
    if a[0] == "num":
        return math.isclose(a[1], b[1], rel_tol=1e-8, abs_tol=1e-8)
    if a[0] == "list":
        return len(a[1]) == len(b[1]) and all(_values_close(x, y) for x, y in zip(a[1], b[1]))
    return a == b


def oracle_canon(oracle_sql: str, sf_dir: str) -> tuple[list[str], list]:
    """Run the DuckDB oracle and return (column names, canonical rows).

    The canonical form is pure tuples of (tag, value) primitives — it
    round-trips exactly through repr()/ast.literal_eval, which is what
    tools/oracle_cache.py relies on to cache expensive sf0.1 oracles
    (two recursive-CTE graph oracles cost ~450 s each in DuckDB).
    """
    con = duck_con(sf_dir)
    orows = con.execute(oracle_sql).fetchall()
    ocols = [d[0] for d in con.description]
    _, o_canon = _canon_rows(ocols, orows)
    return ocols, o_canon


def compare_with_canon(spark_df, ocols: list[str], o_canon: list) -> list[str]:
    """Spark-side half of compare(): diff a DataFrame against a
    pre-canonicalized oracle result (possibly loaded from cache)."""
    problems: list[str] = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns

    if sorted(scols) != sorted(ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(o_canon):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(o_canon)}")

    _, s_canon = _canon_rows(scols, srows)
    limit = 5
    for i, (sr, orow) in enumerate(zip(s_canon, o_canon)):
        if sr == orow:
            continue
        if len(sr) == len(orow) and all(_values_close(x, y) for x, y in zip(sr, orow)):
            continue
        problems.append(f"row {i} differs:\n  spark : {sr}\n  oracle: {orow}")
        if len(problems) >= limit:
            problems.append("... (truncated)")
            break
    return problems


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    ocols, o_canon = oracle_canon(oracle_sql, sf_dir)
    return compare_with_canon(spark_df, ocols, o_canon)
