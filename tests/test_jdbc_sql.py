"""The JDBC sink protocol: generated SQL is executed against DuckDB and
must produce the exact table state the Spark merge kernel produces."""

from __future__ import annotations

import os

import duckdb
import pytest

from linz_bde_uploader_spark.sinks.jdbc import (
    apply_changes_sql,
    copy_partition_sql,
    level0_replace_sql,
    quote_ident,
    staging_table_name,
)


def test_quoting_and_naming():
    assert quote_ident("pri_id") == '"pri_id"'
    assert quote_ident('we"ird') == '"we""ird"'
    assert staging_table_name(7, "CRS_Parcel") == "bde_upload_7.crs_parcel"


def test_copy_sql_matches_reference_contract():
    sql = copy_partition_sql("tmp", ["a", "b"])
    assert sql == 'COPY tmp ("a", "b") FROM STDIN WITH DELIMITER \'|\' NULL AS \'\''


def _run(con, stmts):
    for s in stmts:
        con.execute(s)


def test_apply_changes_sql_semantics_in_duckdb():
    """Execute the generated transaction in a real SQL engine; the final
    state must equal the Spark kernel's: D/U/X keys deleted, I/U/X rows
    inserted, '0' untouched."""
    con = duckdb.connect()
    con.execute("CREATE TABLE target (id BIGINT, v VARCHAR)")
    con.execute("INSERT INTO target VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    con.execute("CREATE TABLE staging (id BIGINT, v VARCHAR)")
    con.execute(
        "INSERT INTO staging VALUES (1,'a2'), (3,'c'), (4,'d'), (9,'new')"
    )
    con.execute("CREATE TABLE actions (id BIGINT, _action VARCHAR)")
    # 1=U (changed), 2=D (gone), 3=0 (null update), 9=I (new); 4 untouched
    con.execute(
        "INSERT INTO actions VALUES (1,'U'), (2,'D'), (3,'0'), (9,'I')"
    )
    _run(con, apply_changes_sql("target", "staging", "actions", "id", ["id", "v"]))
    got = set(con.execute("SELECT id, v FROM target").fetchall())
    assert got == {(1, "a2"), (3, "c"), (4, "d"), (9, "new")}


def test_apply_changes_sql_keyswap_delete_then_insert():
    """X rows must delete before insert so a unique constraint never
    breaks mid-apply (reference :2335-2352). The DELETE statement precedes
    the INSERT in the transaction, and the key-swap end state is correct.
    (Checked without a UNIQUE index here: DuckDB's documented index
    limitation rejects same-transaction delete-then-reinsert of a unique
    value; PostgreSQL — the protocol's actual target — accepts it.)"""
    stmts = apply_changes_sql("target", "staging", "actions", "id", ["id", "u"])
    assert stmts.index(next(s for s in stmts if s.startswith("DELETE"))) \
        < stmts.index(next(s for s in stmts if s.startswith("INSERT")))

    con = duckdb.connect()
    con.execute("CREATE TABLE target (id BIGINT, u VARCHAR)")
    con.execute("INSERT INTO target VALUES (1,'alpha'), (2,'beta')")
    con.execute("CREATE TABLE staging (id BIGINT, u VARCHAR)")
    # key swap: the unique value 'alpha' moves from id=1 to id=5
    con.execute("INSERT INTO staging VALUES (5,'alpha'), (2,'beta')")
    con.execute("CREATE TABLE actions (id BIGINT, _action VARCHAR)")
    con.execute("INSERT INTO actions VALUES (1,'D'), (5,'X')")
    _run(con, stmts)
    got = set(con.execute("SELECT id, u FROM target").fetchall())
    assert got == {(5, "alpha"), (2, "beta")}


def test_level0_replace_sql():
    con = duckdb.connect()
    con.execute("CREATE TABLE target (id BIGINT)")
    con.execute("INSERT INTO target VALUES (1), (2)")
    con.execute("CREATE TABLE staging (id BIGINT)")
    con.execute("INSERT INTO staging VALUES (7), (8), (9)")
    _run(con, level0_replace_sql("target", "staging", ["id"]))
    assert sorted(r[0] for r in con.execute("SELECT id FROM target").fetchall()) \
        == [7, 8, 9]


def test_stage_jdbc_needs_driver(spark):
    """No JDBC driver in this environment: the writer path raises cleanly
    rather than silently no-oping."""
    from linz_bde_uploader_spark.sinks.jdbc import stage_jdbc

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception):
        stage_jdbc(df, "jdbc:postgresql://nohost/nodb", "t")


def test_copy_format_escaping():
    from linz_bde_uploader_spark.sinks.jdbc import copy_format_row

    # NULL AS '', delimiter '|', COPY text escapes
    assert copy_format_row([1, None, "plain"]) == "1||plain\n"
    assert copy_format_row(["a|b"]) == "a\\|b\n"
    assert copy_format_row(["a\\b"]) == "a\\\\b\n"
    assert copy_format_row(["a\nb\tc\rd"]) == "a\\nb\\tc\\rd\n"


def test_copy_reader_streams_lazily():
    from linz_bde_uploader_spark.sinks.jdbc import _CopyReader

    pulled = []

    def gen():
        for i in range(5):
            pulled.append(i)
            yield f"line{i}\n"

    r = _CopyReader(gen())
    first = r.read(8)
    assert first == "line0\nli"
    assert pulled == [0, 1]          # only what read(8) needed
    rest = r.read(-1)
    assert (first + rest) == "".join(f"line{i}\n" for i in range(5))


def test_copy_stage_end_to_end_with_mock_connection(spark, tmp_path):
    """copy_stage against a mock DB-API connection: every partition opens
    one connection, issues the reference's exact COPY command
    (DELIMITER '|' NULL AS ''), streams the formatted rows, and commits.
    The mock materializes each partition's COPY payload to a file (the
    executors run in worker processes, so assertions go through disk)."""
    from linz_bde_uploader_spark.sinks.jdbc import copy_stage

    out_dir = str(tmp_path / "copies")
    os.makedirs(out_dir, exist_ok=True)

    def factory():
        import os as _os
        import uuid as _uuid

        class Cursor:
            def __init__(self):
                self.sql = None
                self.payload = None
                self.executed = []

            def execute(self, sql):
                self.executed.append(sql)

            def copy_expert(self, sql, reader):
                self.sql = sql
                self.payload = reader.read(-1)

            def close(self):
                pass

        class Conn:
            def __init__(self):
                self.cur = Cursor()
                self.committed = False

            def cursor(self):
                return self.cur

            def commit(self):
                p = _os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.copy")
                with open(p, "w") as fh:
                    fh.write(self.cur.sql + "\n--\n" + (self.cur.payload or ""))

            def rollback(self):
                pass

            def close(self):
                pass

        return Conn()

    df = spark.createDataFrame(
        [(1, "alpha", None), (2, "pipe|pipe", "x"), (3, None, "multi\nline")],
        "id long, a string, b string",
    ).repartition(2)
    copy_stage(df, factory, "bde_upload_7.roads")

    files = sorted(os.listdir(out_dir))
    assert len(files) == 2  # one COPY per partition
    body = ""
    for f in files:
        sql, _, payload = open(os.path.join(out_dir, f)).read().partition("\n--\n")
        assert sql == (
            'COPY bde_upload_7.roads ("id", "a", "b") '
            "FROM STDIN WITH DELIMITER '|' NULL AS ''"
        )
        body += payload
    lines = sorted(l for l in body.split("\n") if l)
    assert lines == sorted(["1|alpha|", "2|pipe\\|pipe|x", "3||multi\\nline"])


class _WireCursor:
    """DB-API cursor that pulls the COPY stream the way psycopg's
    copy_expert actually does — repeated fixed-size read(n) calls until
    EOF — and records the exact statements and framed bytes."""

    def __init__(self, log, chunk=7, fail_after=None):
        self.log = log
        self.chunk = chunk
        self.fail_after = fail_after

    def execute(self, sql):
        self.log.append(("execute", sql))

    def copy_expert(self, sql, reader):
        self.log.append(("copy", sql))
        stream, pulls = "", 0
        while True:
            got = reader.read(self.chunk)
            if not got:
                break
            stream += got
            pulls += 1
            if self.fail_after is not None and pulls >= self.fail_after:
                raise OSError("server closed the connection unexpectedly")
        self.log.append(("stream", stream))

    def close(self):
        self.log.append(("cursor_close", None))


class _WireConn:
    def __init__(self, log, **kw):
        self.log = log
        self.kw = kw

    def cursor(self):
        return _WireCursor(self.log, **self.kw)

    def commit(self):
        self.log.append(("commit", None))

    def rollback(self):
        self.log.append(("rollback", None))

    def close(self):
        self.log.append(("close", None))


def _run_partition_writer(rows, factory):
    """Drive copy_stage's per-partition writer directly (single process,
    no Spark) so the wire log is assertable in-memory."""
    from linz_bde_uploader_spark.sinks import jdbc as J

    class FakeDF:
        columns = ["id", "name", "des"]

        def foreachPartition(self, fn):
            fn(iter(rows))

    J.copy_stage(FakeDF(), factory, "bde_upload_9.pab", FakeDF.columns)


def test_copy_stage_wire_protocol_bytes_exact():
    """The full frame, byte for byte, for a partition holding NULLs, the
    delimiter, backslashes, tabs and newlines — pulled through chunked
    read(n) like a real driver socket loop — plus the reference's
    statement order: LOCK TABLE → COPY → commit
    (lib/LINZ/BdeDatabase.pm:537-556)."""
    from pyspark.sql import Row

    rows = [
        Row(id=1, name="plain", des=None),
        Row(id=2, name="pi|pe", des="back\\slash"),
        Row(id=3, name=None, des="tab\there\nand newline"),
    ]
    log = []
    _run_partition_writer(rows, lambda: _WireConn(log, chunk=7))
    assert [k for k, _ in log] == [
        "execute", "copy", "stream", "cursor_close", "commit", "close",
    ]
    assert log[0][1] == "LOCK TABLE bde_upload_9.pab IN ACCESS EXCLUSIVE MODE"
    assert log[1][1] == (
        'COPY bde_upload_9.pab ("id", "name", "des") '
        "FROM STDIN WITH DELIMITER '|' NULL AS ''"
    )
    assert log[2][1] == (
        "1|plain|\n"
        "2|pi\\|pe|back\\\\slash\n"
        "3||tab\\there\\nand newline\n"
    )


def test_copy_stage_empty_partition_sends_empty_frame():
    log = []
    _run_partition_writer([], lambda: _WireConn(log))
    assert ("stream", "") in log and ("commit", None) in log


def test_copy_stage_error_reports_last_16_lines_and_rolls_back():
    """A mid-COPY failure must roll back, and the raised error must carry
    the tail of sent lines — the reference's 16-line @buf report
    (BdeDatabase.pm:548-560)."""
    from pyspark.sql import Row

    import pytest

    rows = [Row(id=i, name=f"r{i}", des=None) for i in range(40)]
    log = []
    # chunk of 9 bytes ≈ one line per pull; fail once 20 lines went out
    with pytest.raises(RuntimeError) as ei:
        _run_partition_writer(
            rows, lambda: _WireConn(log, chunk=9, fail_after=20)
        )
    msg = str(ei.value)
    assert "Last 16 lines of sent COPY data:" in msg
    sent_lines = [l for l in msg.split("COPY data: ")[1].splitlines() if l]
    assert len(sent_lines) == 16
    assert sent_lines[-1].startswith("2")  # the most recently sent rows
    assert ("rollback", None) in log and ("commit", None) not in log
