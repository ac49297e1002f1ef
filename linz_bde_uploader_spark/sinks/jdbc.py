"""JDBC (PostgreSQL) sink shape — the reference's native target.

The lakehouse target (``sinks.target.ParquetTarget``) is this repo's sink
of record; this module carries the JDBC path for deployments that keep the
reference's PostgreSQL target. It mirrors the reference's protocol:

1. **Stage** (S4): bulk-write the cleaned DataFrame into a per-job staging
   table — the working-copy ``COPY`` (lib/LINZ/BdeDatabase.pm:512-565).
   ``df.write.jdbc`` batches inserts per partition; for COPY-speed parity
   use ``copy_partition_sql`` with a per-partition psycopg
   ``copy_expert`` (sketched below, executed only when a driver exists).
2. **Apply** (S5): one transaction of ``DELETE USING`` + ``INSERT SELECT``
   against the staged action set — the ``_ver_apply_changes`` semantics
   (sql/02-bde_control_functions.sql.in:1762-1765) without the MERGE
   statement, so it runs on any PostgreSQL.

No JDBC driver or PostgreSQL ships in this environment, so ``stage_jdbc``
raises unless a URL is supplied and the driver resolves; ``copy_stage``
takes any DB-API connection factory (psycopg in production, a mock in
tests), and the SQL generators are pure functions and fully unit-tested —
together they ARE the protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: actions whose keys are deleted from the target / inserted from staging
#: (the reference's D/U/X delete set and I/U/X insert set, :2228-2368)
DELETE_ACTIONS = ("D", "U", "X")
INSERT_ACTIONS = ("I", "U", "X")


def quote_ident(name: str) -> str:
    """PostgreSQL identifier quoting (the reference leans on
    quote_ident; names are lowercased at every boundary)."""
    return '"' + name.replace('"', '""') + '"'


def staging_table_name(upload_id: int, table: str) -> str:
    """Per-job scratch naming — the reference's ``bde_upload_<id>`` schema
    (sql/02-bde_control_functions.sql.in:841-849)."""
    return f"bde_upload_{upload_id}.{table.lower()}"


def apply_changes_sql(
    target: str,
    staging: str,
    actions: str,
    key: str,
    columns: list[str],
) -> list[str]:
    """The keyed-merge transaction as plain SQL: delete doomed keys, insert
    fresh rows — ``_ver_apply_changes`` semantics. Runs inside one
    transaction; action '0' rows appear in neither set (never touch the
    target), and 'X' rows are in both (delete-then-insert preserves
    unique constraints, :2335-2352)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    k = quote_ident(key)
    del_in = ", ".join(f"'{a}'" for a in DELETE_ACTIONS)
    ins_in = ", ".join(f"'{a}'" for a in INSERT_ACTIONS)
    return [
        "BEGIN",
        (
            f"DELETE FROM {target} t USING {actions} a "
            f"WHERE t.{k} = a.{k} AND a._action IN ({del_in})"
        ),
        (
            f"INSERT INTO {target} ({cols}) "
            f"SELECT {cols} FROM {staging} s "
            f"WHERE s.{k} IN (SELECT {k} FROM {actions} WHERE _action IN ({ins_in}))"
        ),
        "COMMIT",
    ]


def level0_replace_sql(target: str, staging: str, columns: list[str]) -> list[str]:
    """Full-replace transaction: DELETE + INSERT SELECT (reference
    :1949-1973 — deliberately DELETE, not TRUNCATE, so the operation is
    MVCC-transactional)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    return [
        "BEGIN",
        f"DELETE FROM {target}",
        f"INSERT INTO {target} ({cols}) SELECT {cols} FROM {staging}",
        "COMMIT",
    ]


def copy_partition_sql(table: str, columns: list[str]) -> str:
    """The COPY command a per-partition writer streams rows into —
    byte-identical to the reference's (lib/LINZ/BdeDatabase.pm:541:
    ``COPY ... FROM STDIN WITH DELIMITER '|' NULL AS ''``)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    return f"COPY {table} ({cols}) FROM STDIN WITH DELIMITER '|' NULL AS ''"


def lock_table_sql(table: str) -> str:
    """The exclusive lock the reference takes on the working copy right
    before COPY (lib/LINZ/BdeDatabase.pm:537-538)."""
    return f"LOCK TABLE {table} IN ACCESS EXCLUSIVE MODE"


def copy_format_value(v, sep: str = "|") -> str:
    """One value in PostgreSQL COPY text format under the reference's
    options (``DELIMITER '|' NULL AS ''``): None → empty string; backslash,
    newline, carriage return, tab and the delimiter are backslash-escaped
    exactly as COPY requires. (The reference never needs the escapes
    because its P4 cleaner maps ``|``/``\\`` to space first; this writer is
    still lossless for any input.)"""
    if v is None:
        return ""
    s = v if isinstance(v, str) else str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
        .replace(sep, "\\" + sep)
    )


def copy_format_row(vals, sep: str = "|") -> str:
    return sep.join(copy_format_value(v, sep) for v in vals) + "\n"


#: lines of already-sent COPY data kept for error reports — the exact
#: window the reference keeps (BdeDatabase.pm:548-551: "We'll keep 16
#: lines of data to show upon catching an error").
COPY_ERROR_TAIL_LINES = 16


class _CopyReader:
    """File-like view over an iterator of formatted COPY lines:
    ``copy_expert`` pulls with ``read(n)``, so a partition streams into the
    socket without ever materializing in memory — the row-iterator analog
    of the reference's per-row ``putline`` loop (BdeDatabase.pm:541-556).
    The last :data:`COPY_ERROR_TAIL_LINES` pulled lines are retained in
    ``tail`` for the error report, like the reference's @buf."""

    def __init__(self, lines):
        from collections import deque  # noqa: PLC0415

        self._it = iter(lines)
        self._buf = ""
        self.tail: "deque[str]" = deque(maxlen=COPY_ERROR_TAIL_LINES)

    def _next_line(self) -> str:
        line = next(self._it)  # may raise StopIteration
        self.tail.append(line)
        return line

    def read(self, n: int = -1) -> str:
        if n is None or n < 0:
            out = self._buf
            self._buf = ""
            while True:
                try:
                    out += self._next_line()
                except StopIteration:
                    return out
        while len(self._buf) < n:
            try:
                self._buf += self._next_line()
            except StopIteration:
                break
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    readline = read  # copy_expert probes readline on some driver versions


def copy_stage(
    df: DataFrame,
    connection_factory,
    table: str,
    columns: list[str] | None = None,
) -> None:
    """S4 staging at COPY speed: each Spark partition opens ONE connection
    from ``connection_factory`` (a picklable zero-arg callable, e.g.
    ``lambda: psycopg2.connect(dsn)``) and streams its rows through
    ``cursor.copy_expert(COPY ... FROM STDIN WITH DELIMITER '|' NULL AS
    '', <reader>)`` — the reference's exact wire protocol
    (lib/LINZ/BdeDatabase.pm:512-565). Commit per partition; any error
    rolls the partition's COPY back and fails the task, so Spark's retry
    re-runs it from the start (COPY into a per-job staging table is
    idempotent under the stage→apply split).

    Scale: no driver-side collect — ``foreachPartition`` runs on the
    executors; connections scale with partition count, so repartition
    upstream to the connection budget."""
    cols = columns or df.columns
    sql = copy_partition_sql(table, cols)
    lock_sql = lock_table_sql(table)

    def write_partition(rows) -> None:
        it = (copy_format_row([r[c] for c in cols]) for r in rows)
        reader = _CopyReader(it)
        conn = connection_factory()
        try:
            cur = conn.cursor()
            try:
                # the reference locks the working copy before COPY
                # (BdeDatabase.pm:537-538); errors carry the last 16
                # sent lines like its @buf report (:556-560)
                cur.execute(lock_sql)
                try:
                    cur.copy_expert(sql, reader)
                except Exception as e:
                    raise RuntimeError(
                        f"{e}\nLast {len(reader.tail)} lines of sent "
                        "COPY data: " + "".join(reader.tail)
                    ) from e
            finally:
                cur.close()
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def stage_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10_000,
) -> None:
    """S4 over JDBC: partitioned batched insert into the staging table.
    Each Spark partition opens one connection — sized by repartitioning
    upstream. For COPY-speed parity use ``copy_stage`` above (psycopg
    ``copy_expert`` per partition)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
        .mode(mode)
        .save()
    )
