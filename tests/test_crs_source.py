"""Golden tests for the .crs reader (reference format contract:
/root/reference/t/data/*.crs, header keys + '|'-terminated rows +
empty-string-is-NULL)."""

import gzip

from linz_bde_uploader_spark.sources.crs import read_crs, read_crs_header


def test_header_parse(crs_dir):
    hdr = read_crs_header(str(crs_dir / "bnd1.crs"))
    assert hdr.table == "bnd_line"
    assert hdr.field_names == ["line_id", "seq", "ref_id", "flipped", "audit_id"]
    assert hdr.start == "2024-03-05 10:00:00"
    assert [c.type_name for c in hdr.columns] == [
        "integer", "integer", "integer", "char", "integer",
    ]
    assert hdr.columns[4].nullable is False
    assert hdr.meta["HEDR"] == "2.0.0"


def test_read_snapshot(spark, crs_dir):
    df, hdr = read_crs(spark, str(crs_dir / "bnd1.crs"))
    rows = sorted(df.collect(), key=lambda r: r.line_id)
    assert len(rows) == 3
    assert rows[0].line_id == 9001 and rows[0].flipped == "Y" and rows[0].audit_id == 71001
    assert rows[2].ref_id == 503
    assert df.schema["line_id"].dataType.typeName() == "integer"


def test_empty_string_is_null(spark, crs_dir):
    df, _ = read_crs(spark, str(crs_dir / "glyphs.crs"))
    rows = {r.id: r.des for r in df.collect()}
    assert rows[4] is None


def test_utf8_fidelity(spark, crs_dir):
    df, _ = read_crs(spark, str(crs_dir / "glyphs.crs"))
    rows = {r.id: r.des for r in df.collect()}
    assert rows[1] == "café"
    assert rows[2] == "naïve – dash"
    assert rows[3] == "Ōtaki"


def test_gzip_transparency(spark, crs_dir, tmp_path):
    src = (crs_dir / "bnd1.crs").read_bytes()
    gz = tmp_path / "bnd1.crs.gz"
    gz.write_bytes(gzip.compress(src))
    df, hdr = read_crs(spark, str(gz))
    assert hdr.table == "bnd_line"
    assert df.count() == 3


def test_changeset_read(spark, crs_dir):
    df, hdr = read_crs(spark, str(crs_dir / "audit.crs"))
    assert hdr.table == "audit_data"
    assert df.count() == 5
    acts = {r.tablekeyvalue: r.action for r in df.collect()}
    assert acts[71003] == "D" and acts[71100] == "I" and acts[71001] == "U"
    ts = df.filter("id = 1").collect()[0].timestamp
    assert str(ts) == "2024-03-05 10:30:00"
