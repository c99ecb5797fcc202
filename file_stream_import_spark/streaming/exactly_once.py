"""Exactly-once streaming JDBC sink: idempotent foreachBatch via a
staging table, a transactional promote, and a batch-commit ledger.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a failure the same (epoch) batch_id is re-delivered with the same
data. A plain ``batch_df.write.jdbc(append)`` therefore duplicates rows
on replay — the reference's ingest has the same hazard (each 12k-row
chunk commits independently, internal/db/db.go:74, so a retried upload
re-applies chunks; its upsert hides this only because rows are keyed).
This sink makes ANY append stream exactly-once on the database side:

  1. ledger check — ``(query_name, batch_id)`` already present means a
     replay of a committed batch: skip (after dropping any orphan
     staging table from a crashed earlier attempt).
  2. executors write the batch into a per-batch STAGING table
     (overwrite — safe to redo any number of times).
  3. the DRIVER promotes staging → target and records the ledger row in
     ONE database transaction, then drops staging.

Crash points: before (3) — no ledger row, retry redoes (2)+(3), target
never saw partial data; after (3)'s commit — ledger row exists, retry
skips; inside (3) — the transaction aborts atomically. The target table
only ever receives each batch exactly once.

The driver-side connection goes through the JVM's DriverManager (py4j),
so any JDBC driver on the Spark classpath works — tests run embedded
Apache Derby, the same engine the generic JDBC plumbing is verified
against (tests/test_layout.py::TestJdbcDerbyRoundTrip).

Scale: the executor write in (2) is the ordinary parallel JDBC path
(numPartitions × batchsize); the driver transaction in (3) is two
statements regardless of batch size — ``INSERT INTO t SELECT * FROM
staging`` runs inside the database, no data moves through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..io.jdbc import _table_ident


def _qcol(name: str) -> str:
    """Column identifiers are ALWAYS double-quoted here: Spark's JDBC
    writer quotes the columns it creates (case-sensitive lowercase on
    Derby), so a bare name in the promote statement would fold to
    uppercase and miss them."""
    return '"' + name.replace('"', '""') + '"'


LEDGER_DDL = (
    "CREATE TABLE {ledger} (query_name VARCHAR(120) NOT NULL, "
    "batch_id BIGINT NOT NULL, n_rows BIGINT, "
    "PRIMARY KEY (query_name, batch_id))"
)


def _connect(spark, url: str):
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def _table_exists(conn, table: str) -> bool:
    """Metadata existence check that honors schema qualification and
    escapes JDBC LIKE metacharacters: getTables' arguments are
    PATTERNS, so a bare '_' in a table name is a single-char wildcard
    and a dotted 'schema.table' would be matched as one (never-found)
    name."""
    md = conn.getMetaData()
    esc = md.getSearchStringEscape()

    def pat(s: str) -> str:
        s = s.replace(esc, esc + esc)
        return s.upper().replace("_", esc + "_").replace("%", esc + "%")

    schema, _, name = table.rpartition(".")
    rs = md.getTables(None, pat(schema) if schema else None, pat(name), None)
    try:
        return rs.next()
    finally:
        rs.close()


def _exec(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def ensure_ledger(conn, ledger: str = "stream_commits") -> None:
    if not _table_exists(conn, ledger):
        _exec(conn, LEDGER_DDL.format(ledger=_table_ident(ledger)))


def batch_committed(
    conn, query_name: str, batch_id: int, ledger: str = "stream_commits"
) -> bool:
    ps = conn.prepareStatement(
        f"SELECT 1 FROM {_table_ident(ledger)} "
        "WHERE query_name = ? AND batch_id = ?"
    )
    try:
        ps.setString(1, query_name)
        ps.setLong(2, int(batch_id))
        rs = ps.executeQuery()
        try:
            return rs.next()
        finally:
            rs.close()
    finally:
        ps.close()


def make_idempotent_jdbc_writer(
    url: str,
    table: str,
    query_name: str,
    ledger: str = "stream_commits",
    num_partitions: int = 4,
    batchsize: int = 12_000,
):
    """Returns a ``foreachBatch``-compatible ``f(batch_df, batch_id)``
    implementing the staged exactly-once protocol above. JDBC batch
    parameters default to the reference's operating point
    (writer.go:19-20)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = f"{table}_stg_{int(batch_id)}"
        conn = _connect(spark, url)
        try:
            ensure_ledger(conn, ledger)
            if batch_committed(conn, query_name, batch_id, ledger):
                # replay of a committed batch — drop any orphan staging
                # left by a crash between commit and cleanup, then skip
                if _table_exists(conn, staging):
                    _exec(conn, f"DROP TABLE {_table_ident(staging)}")
                return
            # (2) executor-parallel write into staging; overwrite makes
            # a partially-written staging table from a crashed attempt
            # harmless
            (
                batch_df.repartition(num_partitions)
                .write.option("batchsize", batchsize)
                .jdbc(url, staging, mode="overwrite")
            )
            if not _table_exists(conn, table):
                _exec(
                    conn,
                    f"CREATE TABLE {_table_ident(table)} AS SELECT * "
                    f"FROM {_table_ident(staging)} WITH NO DATA",
                )
            # row count from the staging table the executors just
            # wrote — batch_df.count() would re-run the whole upstream
            # micro-batch computation a second time just for ledger
            # bookkeeping
            st = conn.createStatement()
            try:
                rs = st.executeQuery(
                    f"SELECT COUNT(*) FROM {_table_ident(staging)}"
                )
                rs.next()
                n = rs.getLong(1)
                rs.close()
            finally:
                st.close()
            # (3) atomic promote + ledger record
            conn.setAutoCommit(False)
            cols = ", ".join(_qcol(c) for c in batch_df.columns)
            _exec(
                conn,
                f"INSERT INTO {_table_ident(table)} ({cols}) "
                f"SELECT {cols} FROM {_table_ident(staging)}",
            )
            ps = conn.prepareStatement(
                f"INSERT INTO {_table_ident(ledger)} "
                "(query_name, batch_id, n_rows) VALUES (?, ?, ?)"
            )
            try:
                ps.setString(1, query_name)
                ps.setLong(2, int(batch_id))
                ps.setLong(3, int(n))
                ps.executeUpdate()
            finally:
                ps.close()
            conn.commit()
            conn.setAutoCommit(True)
            _exec(conn, f"DROP TABLE {_table_ident(staging)}")
        finally:
            conn.close()

    return write
