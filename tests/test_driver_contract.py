"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() twin via DuckDB —
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in idx]


SQL_QUERIES = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))

# Canonical type classes. The driver hashes typed values: a DuckDB HUGEINT
# (int128, what sum(<int>) returns) vs a Spark BIGINT is a hash mismatch
# even when stringified values agree (VERDICT r1 "What's wrong" #1), while
# int32 vs int64 (e.g. Spark row_number vs DuckDB row_number) hashes
# identically — so machine-int widths share one class and only the types
# that change the value representation stay distinct.
_SPARK_CANON = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float", "string": "str", "date": "date",
    "boolean": "bool",
}
_DUCK_CANON = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "HUGEINT": "int128", "UBIGINT": "uint64",
    "DOUBLE": "float", "FLOAT": "float", "VARCHAR": "str", "DATE": "date",
    "BOOLEAN": "bool",
}


def _spark_types(sdf):
    return {name: _SPARK_CANON.get(dt, None) for name, dt in sdf.dtypes}


def _duck_types(rel):
    return {c: _DUCK_CANON.get(str(t), None)
            for c, t in zip(rel.columns, rel.types)}


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = ddb.execute(entrymod.oracle_sql()[name])
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    stypes = _spark_types(sdf)
    otypes = _duck_types(ddb.sql(entrymod.oracle_sql()[name]))
    for col in scols:
        st, ot = stypes.get(col), otypes.get(col)
        if st is not None and ot is not None:
            assert st == ot, (
                f"{name}.{col}: type class differs spark={st} oracle={ot} "
                f"(driver hashes typed values — cast the oracle SQL)")
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}")
    s_canon, _ = _canon(srows, scols)
    o_canon, _ = _canon(orows, ocols)
    assert s_canon == o_canon, f"{name}: values differ\n{s_canon[:3]}\nvs\n{o_canon[:3]}"


def test_no_rows_only_queries():
    # every queries() entry carries an oracle_sql() twin — the driver's
    # weaker rows-only check should never be exercised; if a genuinely
    # non-SQL-expressible query ever lands here, restore the per-name
    # run-it smoke test this replaced
    assert ROWS_ONLY == []


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "doc_id" in df.columns and "score" in df.columns
