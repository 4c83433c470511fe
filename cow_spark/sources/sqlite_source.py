"""SQLite database source (stdlib-only).

Operational metadata — crawl manifests, labeling-tool exports,
experiment registries — ships as SQLite files at least as often as
CSV; this reads a table or arbitrary query into a DataFrame with the
same no-extra-deps discipline as the rest of the repo (``sqlite3`` is
Python stdlib; no JDBC jar, no pip). The reference has no database
sources at all (CSV only, csvw.py) — corpus-prep surface, same family
as the fixed-width and .npy readers.

Scale contract (explicit, not fine print): SQLite is a SINGLE-FILE
engine — there is no server to partition against, so ingestion is
driver-side, streamed in bounded row chunks through
``spark.createDataFrame``. That is the right shape for DIMENSION
tables (the broadcast side of joins: blocklists, label maps, source
registries — the things that actually live in SQLite), and the wrong
shape for facts: ``max_rows`` hard-caps the read and RAISES when the
cap is hit rather than silently truncating — a fact table that trips
it should be exported to parquet upstream, not smuggled through the
driver.

Type mapping: SQLite's dynamic types land as the four storage
classes — INTEGER→long, REAL→double, TEXT→string, BLOB→binary; NULLs
pass through. A column whose observed storage classes conflict
(SQLite allows per-row types) fails loudly with the offending column
named — silent str() coercion would corrupt a downstream join key.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CHUNK = 10_000

_PY2SPARK = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
}


def read_sqlite(
    spark: SparkSession,
    path: str,
    query: str,
    max_rows: int = 5_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run ``query`` against the SQLite file at ``path`` and return a
    DataFrame.

    The schema is inferred from the first non-NULL value observed per
    column (scanning as far as needed); an all-NULL column is typed
    string. Rows stream through in ``_CHUNK``-sized batches so the
    driver never holds more than one chunk plus the accumulating
    Arrow batches. ``num_partitions`` repartitions the result (a
    driver-ingested frame is otherwise one partition — repartition
    before fanning out into joins, the `_load_spread` lesson).
    """
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.execute(query)
        names = [d[0] for d in cur.description]
        rows: list[tuple] = []
        while True:
            chunk = cur.fetchmany(_CHUNK)
            if not chunk:
                break
            rows.extend(chunk)
            if len(rows) > max_rows:
                raise ValueError(
                    f"read_sqlite: result exceeds max_rows={max_rows} "
                    f"— export this table to parquet upstream instead "
                    f"of driver-side ingestion")
    finally:
        con.close()

    kinds: list[type | None] = [None] * len(names)
    for r in rows:
        for i, v in enumerate(r):
            if v is None:
                continue
            k = type(v)
            if kinds[i] is None:
                kinds[i] = k
            elif kinds[i] is not k:
                raise ValueError(
                    f"read_sqlite: column {names[i]!r} mixes storage "
                    f"classes {kinds[i].__name__} and {k.__name__} — "
                    f"SQLite allows per-row types; clean the column "
                    f"(CAST in the query) before ingesting")
    schema = T.StructType([
        T.StructField(n, _PY2SPARK.get(k, T.StringType()), True)
        for n, k in zip(names, kinds)])
    df = spark.createDataFrame(rows, schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def write_sqlite_fixture(path: str, ddl: str, rows_sql: str) -> None:
    """Create a small SQLite fixture file (tests / driver entries):
    executes ``ddl`` then ``rows_sql`` (an INSERT ... SELECT or
    multi-VALUES statement) in one transaction, overwriting any
    existing content by dropping into a fresh database file."""
    import os

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        with con:
            con.execute(ddl)
            con.execute(rows_sql)
    finally:
        con.close()
