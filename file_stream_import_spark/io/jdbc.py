"""JDBC Postgres source/sink with ON CONFLICT upsert — true parity with
the reference's batch writer (internal/db/db.go:43-80).

The reference builds one multi-row ``INSERT ... VALUES ...,... ON
CONFLICT (locid) DO UPDATE SET col = EXCLUDED.col`` per 12,000-row chunk
(writer.go:19) executed by 10 concurrent workers (writer.go:20) over a
pgx pool (db.go:27-34). Spark equivalents:

  * plain append/overwrite → ``df.write.jdbc`` with
    ``batchsize=12000`` / ``numPartitions=10`` mirroring those constants;
  * upsert → ``foreachPartition`` issuing the same ON CONFLICT SQL via a
    Python Postgres driver (import-gated: not installed in this
    container, so the call raises a clear error at use time, never at
    import time).

Scale: each of N partitions holds its own connection and streams chunked
multi-row statements — identical topology to the reference's worker pool
but horizontally scalable: numPartitions is the worker count.

Real-database coverage: the generic source/sink path (write_jdbc /
read_jdbc, including partitioned reads and WHERE-clause pushdown) is
exercised end-to-end against embedded Apache Derby in
tests/test_layout.py::TestJdbcDerbyRoundTrip — an actual SQL engine on
Spark's own classpath. Only the ON CONFLICT statement itself remains
Postgres-dialect (asserted on an injected fake connection; no Postgres
server exists in this container).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

REFERENCE_BATCH_SIZE = 12_000  # writer.go:19
REFERENCE_NUM_WRITERS = 10  # writer.go:20

_PLAIN_IDENT = re.compile(r"[a-z_][a-z0-9_]*$")


def _ident(name: str) -> str:
    """SQL-safe identifier: plain lowercase names pass through bare
    (byte-identical to the reference's emitted statements); anything else
    is double-quoted with embedded quotes escaped, closing the injection
    hole for user-derived table/column names."""
    if _PLAIN_IDENT.match(name):
        return name
    return '"' + name.replace('"', '""') + '"'


def _table_ident(table: str) -> str:
    """Like _ident but allows one schema qualifier (schema.table)."""
    return ".".join(_ident(p) for p in table.split(".", 1))


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = REFERENCE_BATCH_SIZE,
    num_partitions: int = REFERENCE_NUM_WRITERS,
    **options: str,
) -> None:
    """Plain JDBC sink mirroring the reference's operating point."""
    (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )


def _pg_connect(dsn: str):
    """Return a DB-API connection (cursor()/commit()) for ``dsn``.

    psycopg2 only: the pg8000.native API has no cursor() and a different
    paramstyle, so a half-adapted fallback would fail with a confusing
    TypeError deep inside write_partition — better one clear error here.
    """
    try:
        import psycopg2  # type: ignore
    except ImportError:
        raise RuntimeError(
            "No Python Postgres driver available (psycopg2); "
            "upsert_postgres needs one on the executors. Use "
            "operators.upsert.merge_upsert for the pure-DataFrame path."
        )
    return psycopg2.connect(dsn)


def build_upsert_sql(table: str, key: str, cols: list[str], n_rows: int) -> str:
    """The exact ON CONFLICT statement the reference emits per chunk
    (internal/db/db.go:63-72): multi-row positional VALUES, ``ON CONFLICT
    (key) DO UPDATE SET c = EXCLUDED.c`` per payload column. Split out so
    tests can assert the statement text without a live Postgres.
    """
    payload = [c for c in cols if c != key]
    set_clause = ", ".join(
        f"{_ident(c)} = EXCLUDED.{_ident(c)}" for c in payload
    )
    placeholders = ", ".join(
        "(" + ", ".join(["%s"] * len(cols)) + ")" for _ in range(n_rows)
    )
    col_list = ", ".join(_ident(c) for c in cols)
    return (
        f"INSERT INTO {_table_ident(table)} ({col_list}) VALUES {placeholders} "
        f"ON CONFLICT ({_ident(key)}) DO UPDATE SET {set_clause}"
    )


def build_merge_sql(table: str, key: str, cols: list[str], n_rows: int) -> str:
    """Dialect-portable twin of :func:`build_upsert_sql`: the same
    multi-row last-writer-wins upsert as standard SQL:2003 MERGE (the
    form Derby/Oracle/SQL Server/DB2 accept; Postgres ≥15 too). Same
    chunk shape as the reference's statement (internal/db/db.go:63-72):
    one statement per chunk, positional ``?`` markers, every payload
    column updated on match and inserted on miss.

    Like ON CONFLICT, MERGE forbids two source rows hitting the same
    target row — callers dedup per key within the chunk first (the same
    rule upsert_postgres applies).
    """
    payload = [c for c in cols if c != key]
    rows_values = ", ".join(
        "(" + ", ".join(["?"] * len(cols)) + ")" for _ in range(n_rows)
    )
    col_list = ", ".join(_ident(c) for c in cols)
    set_clause = ", ".join(f"{_ident(c)} = v.{_ident(c)}" for c in payload)
    insert_vals = ", ".join(f"v.{_ident(c)}" for c in cols)
    return (
        f"MERGE INTO {_table_ident(table)} t "
        f"USING (VALUES {rows_values}) AS v ({col_list}) "
        f"ON t.{_ident(key)} = v.{_ident(key)} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({insert_vals})"
    )


def build_merge_from_table_sql(table: str, staging: str, key: str, cols: list[str]) -> str:
    """Staging-table MERGE (SURVEY §7 upsert option (c)): chunk rows are
    bulk-inserted into a staging table, then one ``MERGE INTO target
    USING staging`` applies them — the form every MERGE dialect accepts
    (Derby rejects a VALUES derived table as MERGE source) and the
    standard warehouse upsert when chunks are too large to inline into
    one statement. Caller dedups staging per key first (MERGE errors on
    two source rows hitting one target row, like ON CONFLICT).
    """
    payload = [c for c in cols if c != key]
    col_list = ", ".join(_ident(c) for c in cols)
    set_clause = ", ".join(f"{_ident(c)} = v.{_ident(c)}" for c in payload)
    insert_vals = ", ".join(f"v.{_ident(c)}" for c in cols)
    return (
        f"MERGE INTO {_table_ident(table)} t "
        f"USING {_table_ident(staging)} v "
        f"ON t.{_ident(key)} = v.{_ident(key)} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({insert_vals})"
    )


def upsert_postgres(
    df: DataFrame,
    dsn: str,
    table: str,
    key: str,
    payload_cols: list[str],
    chunk_size: int = REFERENCE_BATCH_SIZE,
    num_partitions: int = REFERENCE_NUM_WRITERS,
    connect=None,
) -> None:
    """Executor-side ON CONFLICT upsert (reference db.go:43-80).

    Builds the same statement shape as the reference: multi-row VALUES
    with positional params, ``ON CONFLICT (key) DO UPDATE SET c =
    EXCLUDED.c`` for every payload column. Rows are deduped per key
    within each chunk first (the reference would error on intra-chunk
    duplicates — SURVEY.md §2.1).

    ``connect``: injectable ``dsn -> DB-API connection`` factory so tests
    can assert the emitted SQL/chunking on a fake connection; defaults to
    the real psycopg2 path.
    """
    cols = [key, *payload_cols]
    connect_fn = connect or _pg_connect

    def write_partition(rows) -> None:
        conn = connect_fn(dsn)
        cur = conn.cursor()
        buf: list[tuple] = []

        def flush() -> None:
            if not buf:
                return
            # intra-chunk dedup, last wins (reference gets this only by
            # accident of unique generated ids)
            seen: dict[object, tuple] = {}
            for r in buf:
                seen[r[0]] = r
            vals = list(seen.values())
            sql = build_upsert_sql(table, key, cols, len(vals))
            cur.execute(sql, [v for row in vals for v in row])
            conn.commit()
            buf.clear()

        for row in rows:
            buf.append(tuple(row[c] for c in cols))
            if len(buf) >= chunk_size:
                flush()
        flush()
        cur.close()
        conn.close()

    df.select(*cols).repartition(num_partitions).foreachPartition(write_partition)


def read_jdbc(
    spark,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = REFERENCE_NUM_WRITERS,
    **options: str,
):
    """JDBC source (parity for the reference's paginated Postgres reads,
    db.go:111-137 — but range-partitioned instead of LIMIT/OFFSET).

    LIMIT/OFFSET pagination is O(offset) per page server-side; a
    partitioned JDBC read splits the key range into ``num_partitions``
    slices fetched concurrently, which is both faster and deterministic.
    Filters on the returned DataFrame push down to the database as WHERE
    clauses (Catalyst JDBC pushdown), mirroring index use in Postgres.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**options)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
